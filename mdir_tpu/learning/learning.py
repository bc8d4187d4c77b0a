"""Top-level training session: network + training + validation + telemetry.

Capability parity with the reference's session object (the
``TrainValLearning`` registry entry, ``mdir/learning/learning.py``) with an
independent structure: scenario-shape checks live in
:func:`_check_scenario_shape`, the restore-vs-fresh split is a single
:func:`_open_session` function returning a plain dict of components, and
resume-consistency policy lives in ``resume.py``. Externally pinned
contract (e2e + resume tests): the scenario key sets, the checkpoint
payload layout (``training/validation/datasets/events/resources``), the
``Epoch(epoch, train, vals)`` iteration protocol, and the metadata dict.
"""
import copy
from collections import namedtuple

from ..tools.events import initialize_processor
from ..tools.stats import CodeVersion, ResourceUsage
from ..tools.utils import indent
from .checkpoints import Checkpoints
from .network import initialize_network
from .resume import check_session_consistency
from .training import initialize_training
from .validation import initialize_validation

Epoch = namedtuple("Epoch", ["epoch", "train", "vals"])


def _check_scenario_shape(params):
    """Strict section-shape asserts (reference idiom: typos fail loudly)."""
    assert params.keys() == {"network", "learning", "output", "data"}, \
        params.keys()
    learning = params["learning"]
    assert learning["type"] == TrainValLearning.__name__, learning["type"]
    assert learning.keys() == {"type", "checkpoints", "training",
                               "validation"}, learning.keys()


def _open_session(params, data, device):
    """Restore from the latest checkpoint if one exists, else start fresh.

    Returns the component dict consumed by ``TrainValLearning``; the
    restored branch threads each subsystem's saved state into its
    initializer and re-checks scenario consistency.
    """
    ckpt_spec = params["learning"]["checkpoints"]
    checkpoints = Checkpoints(**ckpt_spec)
    events_root = checkpoints.directory / "../epochs"
    saved = checkpoints.load_latest_epoch(
        params["learning"]["training"]["epochs"])

    if saved is None:
        components = {
            "network": initialize_network(params["network"], device),
            "events": initialize_processor(params["output"]["learning"],
                                           events_root),
            "resources": ResourceUsage.initialize(),
        }
        components["training"] = initialize_training(
            params["learning"]["training"], components["network"], data,
            params["data"], device)
    else:
        net_state, train_stats = saved
        check_session_consistency(train_stats, params)
        components = {
            "network": initialize_network(params["network"], device,
                                          net_state, None),
            "events": initialize_processor(params["output"]["learning"],
                                           events_root,
                                           train_stats["events"]),
            "resources": ResourceUsage.initialize_from_state(
                train_stats["resources"]),
        }
        components["training"] = initialize_training(
            params["learning"]["training"], components["network"], data,
            params["data"], device, state=train_stats["training"])

    components["checkpoints"] = checkpoints
    components["validation"] = initialize_validation(
        params["learning"]["validation"], data=data,
        params_data=params["data"],
        default_criterion=components["training"].criterion,
        net_defaults=components["network"].network_params.runtime.get(
            "data", {}))
    return components


class TrainValLearning:
    """Iterable session yielding ``Epoch(epoch, train, vals)`` per epoch."""

    Epoch = Epoch

    def __init__(self, params, network, training, validation, events,
                 resources, checkpoints):
        self.params = params
        self.network = network
        self.training = training
        self.validation = validation
        self.events = events
        self.resources = resources
        self.checkpoints = checkpoints
        self.code_version = CodeVersion()

    @classmethod
    def initialize(cls, params, data, device=None):
        declared = copy.deepcopy(params)
        _check_scenario_shape(params)
        return cls(declared, **_open_session(params, data, device))

    def close_epoch(self):
        """Flush the epoch's events, then checkpoint everything."""
        self.events.close_epoch()
        decisive = self.validation.decisive_criterion
        self.checkpoints.save_epoch(
            self.network.state_dict(), self._session_payload(),
            self.training.epoch,
            self.events.metadata.is_last_best(decisive),
            not self.training.remains_epochs)

    def _session_payload(self):
        """Everything beyond network weights a resume needs (layout is the
        checkpoint-compat contract — see module docstring)."""
        scenario = self.params
        payload = {"training": self.training.state_dict()}
        payload["validation"] = {"params": scenario["learning"]["validation"]}
        payload["datasets"] = scenario["data"]
        payload["events"] = self.events.state_dict()
        payload["resources"] = self.resources.state_dict()
        return payload

    @property
    def metadata(self):
        keeper = self.events.metadata
        decisive = self.validation.decisive_criterion
        return {
            "metrics": keeper.metadata(),
            "best_epoch": keeper.best_epoch(decisive),
            "resource_usage": self.resources.get_resources(),
            "code_version": self.code_version.versions,
        }

    def __iter__(self):
        return self

    def __next__(self):
        epoch, steps = next(self.training)
        return Epoch(epoch=epoch, train=steps,
                     vals=self.validation.validations(epoch))

    def __repr__(self):
        return ("%s (\n  network: %s\n  training: %s\n  validation: %s\n)"
                % (type(self).__name__, indent(str(self.network)),
                   indent(str(self.training)), indent(str(self.validation))))


LEARNINGS = {
    "TrainValLearning": TrainValLearning,
}
