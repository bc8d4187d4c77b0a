"""Network abstraction: params pytree + jitted apply + composable wrappers.

Structural parity with ``mdir/learning/network.py``: the ``Network`` ABC with
train/eval/freeze/parameters and stage-dependent wrapper sets, SingleNetwork
(model + NetworkParams(model, runtime), pretrained-path loading with
``load_from_checkpoint`` runtime inheritance, ``overlay_params`` frozen
copies), SequentialNetwork (U-Net -> embedder composition; wrappers from the
last net, data defaults from the first), and CirNetwork (mean/std injection,
frozen BatchNorm in training, pool-p 10x-lr/0-wd optimizer param groups).

TPU-native execution: a network holds a flax Model; ``__call__`` routes a
single image (or image list) through the eval wrappers around one jitted
apply (retraced per input shape, cached by XLA). Descriptor models keep the
reference's D x N output convention at this boundary. Training uses the
functional path in ``learning/training.py`` (loss as a function of params).
"""
import copy
import time
from collections import namedtuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import models as models_lib
from ..models import weight_init
from ..tools.utils import indent, load_url
from .wrappers import initialize_wrappers


class Network:
    TRAIN = "train"
    EVAL = "eval"

    def __init__(self, frozen, model=None):
        self.stage = None
        self.frozen = frozen
        self.model = model
        if frozen:
            self.eval()

    @staticmethod
    def initialize_wrappers(wrappers, device=None):
        if isinstance(wrappers, dict):
            assert wrappers.keys() == {"train", "eval"}, wrappers.keys()
            return {x: initialize_wrappers(wrappers[x], device) for x in wrappers}
        return {x: initialize_wrappers(wrappers, device) for x in ["train", "eval"]}

    def train(self):
        if not self.frozen:
            self.stage = Network.TRAIN
        return self

    def eval(self):
        self.stage = Network.EVAL
        return self

    def freeze(self, net="net"):
        assert net == "net"
        self.frozen = True
        self.eval()
        return self

    def parameters(self, _optimizer_opts, net="net"):
        """Return (param_tree, label_tree) of trainable params; empty if frozen.

        The label tree assigns each leaf an optimizer group name (used by
        optax.multi_transform); the default is a single 'default' group.
        """
        if self.frozen:
            return None
        params = self.model.params
        labels = jax.tree.map(lambda _: "default", params)
        return {"params": params, "labels": labels, "opts": {}}

    # Debug data

    def train_data(self):
        return [{"key": "net/params", "dtype": "weight/param",
                 "data": _flatten_params(self.model.params)}]

    def const_data(self):
        acc = []
        graph = self.generate_network_graph()
        if graph is not None:
            acc.append({"key": "network_graph", "dtype": "blob",
                        "data": {"net": {"dtype": "image:rgb", "data": graph}}})
        return acc

    def generate_network_graph(self):
        """Module summary rendered as an image blob (the reference renders a
        torchviz autograd graph; the flax equivalent is a tabulate table)."""
        try:
            import flax.linen as nn
            import jax
            import jax.numpy as jnp
            from PIL import Image, ImageDraw

            in_ch = self.model.meta.get("in_channels", 3) or 3
            table = nn.tabulate(
                self.model.module, jax.random.PRNGKey(0),
                console_kwargs={"width": 120, "force_terminal": False})(
                    jnp.zeros((1, 64, 64, in_ch)))
            lines = table.split("\n")[:200]
            width = min(max(len(l) for l in lines) * 7 + 20, 1600)
            height = len(lines) * 12 + 20
            img = Image.new("RGB", (width, height), "white")
            draw = ImageDraw.Draw(img)
            for i, line in enumerate(lines):
                draw.text((10, 10 + i * 12), line, fill="black")
            import numpy as _np

            return _np.asarray(img)
        except Exception:
            return None


def _flatten_params(tree, prefix=""):
    acc = {}
    for key, value in tree.items():
        path = "%s.%s" % (prefix, key) if prefix else key
        if isinstance(value, dict):
            acc.update(_flatten_params(value, path))
        else:
            acc[path] = np.asarray(value)
    return acc


def _tree_to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


class SingleNetwork(Network):

    NetworkParams = namedtuple("NetworkParams", ["model", "runtime"])

    def __init__(self, model, network_params, device=None, frozen=False):
        self.meta = {"in_channels": model.meta.get("in_channels"),
                     "out_channels": model.meta.get("out_channels")}
        self.network_params = network_params
        self.wrappers = self.initialize_wrappers(
            network_params.runtime.get("wrappers", ""), device)
        self._jit_cache = {}
        super().__init__(network_params.runtime.get("frozen", False) or frozen,
                         model)

        assert not network_params.runtime.keys() - {"data", "wrappers", "frozen"}, \
            network_params.runtime.keys() - {"data", "wrappers", "frozen"}
        assert not network_params.runtime.get("data", {}).keys() - {"mean_std", "transforms"}, \
            network_params.runtime.get("data", {}).keys()

    # --- inference ---------------------------------------------------------

    def _jitted_apply(self):
        key = id(self.model.module)
        if key not in self._jit_cache:
            module = self.model.module
            accepts_train = models_lib._accepts_train(module)

            if accepts_train:
                def fn(variables, x):
                    return module.apply(variables, x, train=False)
            else:
                def fn(variables, x):
                    return module.apply(variables, x)

            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    def inference(self, image):
        """Run the model on one image tensor; keeps reference conventions:
        descriptor models return (D, N) columns, image models return images."""
        x = jnp.asarray(image, dtype=jnp.float32)
        if x.ndim == 3:
            x = x[None]
        out = self._jitted_apply()(self.model.variables, x)
        if self.model.is_descriptor_model:
            return out.T  # (D, N)
        return out

    def __call__(self, image):
        return self.wrappers[self.stage](image, self.inference, self.model)

    # --- construction ------------------------------------------------------

    @classmethod
    def initialize(cls, params, device=None):
        path = params.pop("path", None)
        if not path:
            network_params = cls.NetworkParams(params.pop("model"),
                                               params.pop("runtime"))
            model = models_lib.initialize_model(copy.deepcopy(network_params.model))
            init = params.pop("initialize")
            if init and init["weights"] != "default":
                seed = init["seed"] if init["seed"] is not None else int(time.time())
                rng = jax.random.PRNGKey(seed)
                new_params = weight_init.WEIGHT_INITIALIZATIONS[init["weights"]](
                    rng, model.params)
                model.replace_params(new_params)
        else:
            print(">> Loaded net from %s" % path)
            from .checkpoints import Checkpoints

            checkpoint = Checkpoints.load_checkpoint_file(path)
            runtime = params.pop("runtime")
            if runtime == "load_from_checkpoint":
                runtime = checkpoint["network_params"]["runtime"]
            else:
                runtime = {x: y if y != "load_from_checkpoint"
                           else checkpoint["network_params"]["runtime"][x]
                           for x, y in runtime.items()}
            network_params = cls.NetworkParams(
                checkpoint["network_params"]["model"], runtime)
            model = models_lib.initialize_model(copy.deepcopy(network_params.model))
            _load_model_state(model, checkpoint["model_state"])
            params.pop("initialize", None)
            if "model" in params:
                assert params.pop("model") == checkpoint["network_params"]["model"]

        assert not params, params.keys()
        return cls(model, network_params, device=device, frozen=False)

    def overlay_params(self, new_params, device=None):
        if not new_params:
            return self
        new_params["runtime"]["frozen"] = True
        network_params = self.NetworkParams(self.network_params.model,
                                            new_params.pop("runtime"))
        assert not new_params
        return self.__class__(self.model, network_params, device, frozen=True)

    # --- load and save -----------------------------------------------------

    def state_dict(self):
        return {
            "net": {
                "type": self.__class__.__name__,
                "frozen": self.frozen,
                "network_params": self.network_params._asdict(),
                "model_state": _tree_to_numpy(self.model.variables),
            }
        }

    @classmethod
    def initialize_from_state(cls, state_dict, device=None, params=None,
                              runtime=None):
        assert state_dict.keys() == {"net"}, state_dict.keys()
        checkpoint = state_dict["net"]
        assert checkpoint.keys() == {"type", "frozen", "network_params",
                                     "model_state"}, checkpoint.keys()
        network_params = cls.NetworkParams(**checkpoint["network_params"])

        assert checkpoint["type"] == cls.__name__, checkpoint["type"]
        if params is not None and "path" not in params:
            del params["initialize"]
            assert network_params._asdict() == params, \
                "%s != %s" % (network_params._asdict(), params)

        model = models_lib.initialize_model(copy.deepcopy(network_params.model))
        _load_model_state(model, checkpoint["model_state"])

        if runtime:
            network_params.runtime.update(runtime)

        return cls(model, network_params, device=device,
                   frozen=checkpoint["frozen"])

    def __repr__(self):
        nice = "\n".join("    %s: %s," % (x, y)
                         for x, y in self.network_params._asdict().items())
        return "%s (\n  meta: %s\n  params: {\n%s\n  }\n)" % (
            self.__class__.__name__, self.meta, indent(nice))


def _load_model_state(model, model_state):
    """Restore model variables from our nested-dict state or a torch flat
    state dict (reference .pth checkpoints)."""
    if any("." in str(k) for k in model_state.keys()) or \
            not ({"params", "batch_stats"} & set(model_state.keys())):
        from ..models import torch_import

        torch_import.import_model_state(model, model_state)
    else:
        model.variables = jax.tree.map(jnp.asarray, model_state)


class SequentialNetwork(Network):

    NetworkParams = namedtuple("NetworkParams", ["runtime"])

    def __init__(self, networks, sequence, device=None, frozen=False):
        assert len(networks) == len(sequence)
        assert len(networks) == 2, "Tested only for a sequence of 2 networks"
        self.sequence = sequence
        self.networks = networks
        first_net = networks[sequence[0]]
        last_net = networks[sequence[1]]
        super().__init__(frozen, last_net.model)

        self.wrappers = last_net.wrappers
        last_net.wrappers = self.initialize_wrappers("", device)

        self.network_params = self.NetworkParams(
            {"wrappers": last_net.network_params.runtime.get("wrappers"),
             "data": first_net.network_params.runtime.get("data")})
        assert first_net.meta["out_channels"] == last_net.meta["in_channels"]
        self.meta = {"in_channels": first_net.meta["in_channels"],
                     "out_channels": last_net.meta["out_channels"]}

    def __call__(self, image):
        return self.wrappers[self.stage](image, self.forward, self.model)

    def __getitem__(self, key):
        return self.networks[key]

    def forward(self, image):
        for net in self.sequence:
            image = self.networks[net](image)
        return image

    def train(self):
        for net in self.sequence:
            self.networks[net].train()
        self.stage = Network.TRAIN
        return self

    def eval(self):
        for net in self.sequence:
            self.networks[net].eval()
        self.stage = Network.EVAL
        return self

    def freeze(self, net=None):
        if net is not None:
            self.networks[net].freeze()
            return self
        for sub in self.sequence:
            self.networks[sub].freeze()
        self.frozen = True
        return self

    def parameters(self, optimizer_opts, net=None):
        if net is not None:
            return self.networks[net].parameters(optimizer_opts)
        acc = {}
        for sub in self.sequence:
            sub_params = self.networks[sub].parameters(optimizer_opts)
            if sub_params is not None:
                acc[sub] = sub_params
        return acc

    @classmethod
    def initialize(cls, params, device=None):
        sequence = params.pop("sequence").split(",")
        for net in params:
            params[net] = NETWORKS[params[net].pop("type")].initialize(
                params[net], device)
        return cls(params, sequence, device=device, frozen=False)

    def overlay_params(self, new_params, device=None):
        if not new_params:
            return self
        diff = set(self.sequence) - set(new_params.keys())
        assert not diff, diff
        acc = {}
        for net in self.sequence:
            acc[net] = self.networks[net]
            if net in new_params:
                acc[net] = acc[net].overlay_params(new_params[net], device)
        return self.__class__(acc, self.sequence, device=device, frozen=True)

    def state_dict(self):
        network_hierarchy = {}
        state = {}
        for net in self.sequence:
            netstate = self.networks[net].state_dict()
            netstate[net] = netstate.pop("net")
            intersection = set(state.keys()).intersection(netstate.keys())
            assert not intersection, intersection
            network_hierarchy[net] = [x for x in netstate if x != net]
            state.update(netstate)
        state["net"] = {
            "type": self.__class__.__name__,
            "frozen": self.frozen,
            "sequence": self.sequence,
            "network_hierarchy": network_hierarchy,
        }
        return state

    @classmethod
    def initialize_from_state(cls, state_dict, device=None, params=None,
                              runtime=None):
        checkpoint = state_dict.pop("net")
        assert checkpoint["type"] == cls.__name__
        assert checkpoint.keys() == {"type", "frozen", "sequence",
                                     "network_hierarchy"}, checkpoint.keys()
        sequence = list(checkpoint["sequence"])
        assert set(sequence) == set(checkpoint["network_hierarchy"].keys())

        runtime_propagated = {net: None for net in sequence}
        if runtime and "wrappers" in runtime:
            runtime_propagated[sequence[-1]] = {"wrappers": runtime.pop("wrappers")}
        if runtime and "data" in runtime:
            runtime_propagated[sequence[0]] = {"data": runtime.pop("data")}
        assert not runtime, runtime

        if params is not None:
            params_sequence = params["sequence"].split(",")
            assert sequence == params_sequence, (sequence, params_sequence)

        acc = {}
        for net in checkpoint["network_hierarchy"]:
            netparams = params[net] if params is not None else None
            netstate = {x: state_dict[x]
                        for x in checkpoint["network_hierarchy"][net]}
            netstate["net"] = state_dict[net]
            acc[net] = NETWORKS[state_dict[net]["type"]].initialize_from_state(
                netstate, device, netparams, runtime_propagated[net])

        return cls(acc, sequence, device=device, frozen=checkpoint["frozen"])

    def train_data(self):
        acc = []
        for net in self.sequence:
            td = self.networks[net].train_data()
            acc += [{**x, "key": x["key"].replace("net/", net + "/")} for x in td]
        return acc


class CirNetwork(SingleNetwork):
    """Retrieval network: injects model mean/std as data defaults, keeps
    BatchNorm frozen in training (trunks are built frozen_bn), and assigns
    the GeM/pool p parameter a 10x-lr, 0-weight-decay optimizer group."""

    def __init__(self, model, network_params, device=None, frozen=False):
        if "data" not in network_params.runtime:
            network_params.runtime["data"] = {}
        if "mean_std" not in network_params.runtime["data"]:
            network_params.runtime["data"]["mean_std"] = [
                model.meta["mean"], model.meta["std"]]
        super().__init__(model, network_params, device, frozen)

    def parameters(self, optimizer_opts, net="net"):
        assert net == "net"
        if self.frozen:
            return None
        params = self.model.params

        def label(path, _leaf):
            # pool p: 10x lr, no weight decay (network.py:410-428)
            if path and path[0] == "pool":
                return "pool"
            return "default"

        labels = _tree_map_with_path(params, label)
        opts = {"pool": {"lr_multiplier": 10.0, "weight_decay": 0.0}}
        return {"params": params, "labels": labels, "opts": opts}


def _tree_map_with_path(tree, fn, path=()):
    if isinstance(tree, dict):
        return {k: _tree_map_with_path(v, fn, path + (k,)) for k, v in tree.items()}
    return fn(path, tree)


NETWORKS = {
    "SingleNetwork": SingleNetwork,
    "SequentialNetwork": SequentialNetwork,
    "CirNetwork": CirNetwork,
}


def initialize_network(params, device=None, state=None, runtime=None):
    if params:
        network_cls = NETWORKS[params.pop("type")]
    else:
        network_cls = NETWORKS[state["net"]["type"]]
    if state:
        return network_cls.initialize_from_state(state, device, params, runtime)
    return network_cls.initialize(params, device)
