from .checkpoints import Checkpoints
from .network import initialize_network


def load_network(params, device=None):
    state = Checkpoints.load_network(params["path"])
    return initialize_network(None, device, state, params["runtime"])


def initialize_learning(params, data, device=None):
    from .learning import LEARNINGS

    return LEARNINGS[params["learning"]["type"]].initialize(params, data, device)
