"""Network abstraction: params pytree + jitted apply + composable wrappers.

Capability parity with the reference network layer
(``mdir/learning/network.py``): stage-dependent wrapper sets, pretrained
loading with ``load_from_checkpoint`` runtime inheritance, frozen overlay
copies for validation, 2-net sequential composition (wrappers from the last
net, data defaults from the first), and the retrieval-specific CirNetwork
(mean/std injection, frozen BatchNorm, pool-p 10x-lr/0-wd optimizer group).

TPU-native execution: a network holds a flax Model; ``__call__`` routes a
single image (or image list) through the eval wrappers around one jitted
apply (retraced per input shape, cached by XLA). Descriptor models keep the
reference's D x N output convention at this boundary. Training uses the
functional path in ``learning/train_step.py`` (loss as a function of
params).

Checkpoint-compat schemas (pinned by resume/e2e tests, do not change): the
single-net payload ``{"net": {type, frozen, network_params, model_state}}``
and the multi-net flat payload where each subnet's entries are keyed by its
name with a ``"net"`` header carrying ``sequence`` + ``network_hierarchy``.
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

TRAIN, EVAL = "train", "eval"
# compute_dtype and pallas extend the reference's runtime surface (data/
# wrappers/frozen) so the yaml scenario system reaches the fast compute
# paths: compute_dtype: float32 | bfloat16 | auto (bf16 + first-chunk
# guard on accelerators); pallas: true swaps the fused Pallas GeM+L2N
# pooling into extraction programs (MDIR_TPU_PALLAS overrides when set)
_RUNTIME_KEYS = {"data", "wrappers", "frozen", "compute_dtype", "pallas",
                 "param_sharding"}
_DATA_KEYS = {"mean_std", "transforms"}


def _build_stage_wrappers(spec, device=None):
    """Per-stage wrapper Composes from a scenario spec: either one spec for
    both stages, or an explicit {train, eval} pair."""
    if isinstance(spec, dict):
        assert spec.keys() == {TRAIN, EVAL}, spec.keys()
        return {stage: initialize_wrappers(spec[stage], device)
                for stage in spec}
    both = {stage: initialize_wrappers(spec, device) for stage in (TRAIN, EVAL)}
    return both


def _inherit_runtime(requested, stored):
    """Resolve ``load_from_checkpoint`` inheritance — the whole runtime
    section, or individual keys, may defer to the checkpointed values."""
    if requested == "load_from_checkpoint":
        return stored
    resolved = {}
    for key, value in requested.items():
        resolved[key] = stored[key] if value == "load_from_checkpoint" \
            else value
    return resolved


def _restore_variables(model, model_state):
    """Restore model variables from our nested-dict state or a torch flat
    state dict (reference .pth checkpoints)."""
    keys = set(model_state.keys())
    looks_torch = any("." in str(k) for k in keys) \
        or not (keys & {"params", "batch_stats"})
    if looks_torch:
        from ..models import torch_import

        torch_import.import_model_state(model, model_state)
    else:
        model.variables = jax.tree.map(jnp.asarray, model_state)


def _named_param_arrays(tree, prefix=""):
    """Flatten a param pytree to {dotted.path: ndarray} for weight logs."""
    acc = {}
    for key, value in tree.items():
        path = prefix + "." + key if prefix else key
        if isinstance(value, dict):
            acc.update(_named_param_arrays(value, path))
        else:
            acc[path] = np.asarray(value)
    return acc


def _label_by_path(tree, fn, path=()):
    if isinstance(tree, dict):
        return {k: _label_by_path(v, fn, path + (k,)) for k, v in tree.items()}
    return fn(path, tree)


class Network:
    """Base: stage switching, freezing, trainable-parameter reporting."""

    TRAIN = TRAIN
    EVAL = EVAL
    initialize_wrappers = staticmethod(_build_stage_wrappers)

    def __init__(self, frozen, model=None):
        self.stage = None
        self.frozen = frozen
        self.model = model
        if frozen:
            self.eval()

    def train(self):
        if not self.frozen:
            self.stage = TRAIN
        return self

    def eval(self):
        self.stage = EVAL
        return self

    def freeze(self, net="net"):
        assert net == "net"
        self.frozen = True
        self.eval()
        return self

    def parameters(self, _optimizer_opts, net="net"):
        """(param_tree, label_tree, group opts) of trainables; None if frozen.

        Labels assign each leaf an optimizer group (consumed by
        optax.multi_transform); the base network is one 'default' group.
        """
        if self.frozen:
            return None
        params = self.model.params
        return {"params": params,
                "labels": jax.tree.map(lambda _: "default", params),
                "opts": {}}

    # --- debug / observability --------------------------------------------

    def train_data(self):
        return [{"key": "net/params", "dtype": "weight/param",
                 "data": _named_param_arrays(self.model.params)}]

    def const_data(self):
        graph = self.generate_network_graph()
        if graph is None:
            return []
        return [{"key": "network_graph", "dtype": "blob",
                 "data": {"net": {"dtype": "image:rgb", "data": graph}}}]

    def generate_network_graph(self):
        """Module summary rendered as an image blob (the reference renders a
        torchviz autograd graph; the flax equivalent is a tabulate table)."""
        try:
            import flax.linen as nn
            from PIL import Image, ImageDraw

            in_ch = self.model.meta.get("in_channels", 3) or 3
            table = nn.tabulate(
                self.model.module, jax.random.PRNGKey(0),
                console_kwargs={"width": 120, "force_terminal": False})(
                    jnp.zeros((1, 64, 64, in_ch)))
            lines = table.split("\n")[:200]
            width = min(max(len(l) for l in lines) * 7 + 20, 1600)
            img = Image.new("RGB", (width, len(lines) * 12 + 20), "white")
            draw = ImageDraw.Draw(img)
            for i, line in enumerate(lines):
                draw.text((10, 10 + i * 12), line, fill="black")
            return np.asarray(img)
        except Exception:
            return None


class SingleNetwork(Network):
    """One model + its runtime (wrappers, data defaults, frozen flag)."""

    NetworkParams = namedtuple("NetworkParams", ["model", "runtime"])

    def __init__(self, model, network_params, device=None, frozen=False):
        runtime = network_params.runtime
        unknown = runtime.keys() - _RUNTIME_KEYS
        assert not unknown, unknown
        data_unknown = runtime.get("data", {}).keys() - _DATA_KEYS
        assert not data_unknown, runtime.get("data", {}).keys()

        self.meta = {side: model.meta.get(side)
                     for side in ("in_channels", "out_channels")}
        self.network_params = network_params
        self.wrappers = _build_stage_wrappers(runtime.get("wrappers", ""),
                                              device)
        self._jit_cache = {}
        super().__init__(runtime.get("frozen", False) or frozen, model)

    # --- inference ---------------------------------------------------------

    def _jitted_apply(self):
        key = id(self.model.module)
        if key not in self._jit_cache:
            module = self.model.module
            if models_lib._accepts_train(module):
                fn = lambda variables, x: module.apply(variables, x,
                                                       train=False)
            else:
                fn = lambda variables, x: module.apply(variables, x)
            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    def inference(self, image):
        """Run the model on one image tensor; keeps reference conventions:
        descriptor models return (D, N) columns, image models return images."""
        x = jnp.asarray(image, dtype=jnp.float32)
        if x.ndim == 3:
            x = x[None]
        out = self._jitted_apply()(self.model.variables, x)
        return out.T if self.model.is_descriptor_model else out

    def __call__(self, image):
        return self.wrappers[self.stage](image, self.inference, self.model)

    # --- construction ------------------------------------------------------

    @classmethod
    def initialize(cls, params, device=None):
        path = params.pop("path", None)
        built = cls._from_pretrained(path, params) if path \
            else cls._from_scratch(params)
        assert not params, params.keys()
        return cls(built[0], built[1], device=device, frozen=False)

    @classmethod
    def _from_scratch(cls, params):
        spec = cls.NetworkParams(params.pop("model"), params.pop("runtime"))
        model = models_lib.initialize_model(copy.deepcopy(spec.model))
        init = params.pop("initialize")
        if init and init["weights"] != "default":
            seed = init["seed"] if init["seed"] is not None \
                else int(time.time())
            fresh = weight_init.WEIGHT_INITIALIZATIONS[init["weights"]](
                jax.random.PRNGKey(seed), model.params)
            model.replace_params(fresh)
        return model, spec

    @classmethod
    def _from_pretrained(cls, path, params):
        print(">> Loaded net from %s" % path)
        from .checkpoints import Checkpoints

        checkpoint = Checkpoints.load_checkpoint_file(path)
        stored = checkpoint["network_params"]
        runtime = _inherit_runtime(params.pop("runtime"), stored["runtime"])
        spec = cls.NetworkParams(stored["model"], runtime)
        model = models_lib.initialize_model(copy.deepcopy(spec.model))
        _restore_variables(model, checkpoint["model_state"])
        params.pop("initialize", None)
        if "model" in params:
            assert params.pop("model") == stored["model"]
        return model, spec

    def overlay_params(self, new_params, device=None):
        """A frozen copy under different runtime (validation overlays)."""
        if not new_params:
            return self
        new_params["runtime"]["frozen"] = True
        overlaid = self.NetworkParams(self.network_params.model,
                                      new_params.pop("runtime"))
        assert not new_params
        return type(self)(self.model, overlaid, device, frozen=True)

    # --- load and save -----------------------------------------------------

    def state_dict(self):
        payload = {"type": type(self).__name__,
                   "frozen": self.frozen,
                   "network_params": self.network_params._asdict(),
                   "model_state": jax.tree.map(np.asarray,
                                               self.model.variables)}
        return {"net": payload}

    @classmethod
    def initialize_from_state(cls, state_dict, device=None, params=None,
                              runtime=None):
        assert state_dict.keys() == {"net"}, state_dict.keys()
        payload = state_dict["net"]
        assert payload.keys() == {"type", "frozen", "network_params",
                                  "model_state"}, payload.keys()
        assert payload["type"] == cls.__name__, payload["type"]

        spec = cls.NetworkParams(**payload["network_params"])
        model = models_lib.initialize_model(copy.deepcopy(spec.model))
        _restore_variables(model, payload["model_state"])

        # resume consistency: a from-scratch network spec (no/falsy path —
        # the reference gates on key absence, which its own ``path: null``
        # convention always skips) must match the checkpoint. Compare like
        # with like: drop the construction-only keys and apply the same
        # defaulting __init__ would (CirNetwork injects model mean/std into
        # runtime.data BEFORE checkpointing, so the checkpointed spec
        # legitimately carries keys the yaml omitted).
        if params is not None and not params.get("path"):
            declared = {k: v for k, v in params.items()
                        if k not in ("path", "initialize", "type")}
            cls._canonicalize_resume_params(declared, model)
            assert spec._asdict() == declared, \
                "%s != %s" % (spec._asdict(), declared)

        if runtime:
            spec.runtime.update(runtime)
        return cls(model, spec, device=device, frozen=payload["frozen"])

    @classmethod
    def _canonicalize_resume_params(cls, params, model):
        """Apply the same defaulting ``__init__`` performs to a fresh yaml
        spec, so the resume consistency check compares like with like."""

    def __repr__(self):
        nice = "\n".join("    %s: %s," % (x, y)
                         for x, y in self.network_params._asdict().items())
        return "%s (\n  meta: %s\n  params: {\n%s\n  }\n)" % (
            type(self).__name__, self.meta, indent(nice))


# --- sequential composition -------------------------------------------------

def _flatten_substates(networks, sequence):
    """Collapse per-subnet state dicts into one flat payload.

    Each subnet's ``"net"`` entry is re-keyed to its name; any nested
    entries it carries keep their (already-prefixed) keys and are recorded
    in the hierarchy map so ``_nest_substates`` can reassemble them. Key
    collisions across subnets are a hard error.
    """
    flat, hierarchy = {}, {}
    for name in sequence:
        substate = networks[name].state_dict()
        substate[name] = substate.pop("net")
        clash = set(flat) & set(substate)
        assert not clash, clash
        hierarchy[name] = [key for key in substate if key != name]
        flat.update(substate)
    return flat, hierarchy


def _nest_substates(flat, hierarchy, name):
    """Inverse of ``_flatten_substates`` for one subnet."""
    nested = {key: flat[key] for key in hierarchy[name]}
    nested["net"] = flat[name]
    return nested


def _route_runtime_overrides(runtime, sequence):
    """Wrapper overrides go to the last subnet, data defaults to the first
    (mirrors how the composition exposes them); the fast-path extensions
    (compute_dtype/pallas) go to the last subnet — the embedder, whose
    runtime the composed extractor consults for its dtype policy."""
    routed = {name: None for name in sequence}
    if runtime and "wrappers" in runtime:
        routed[sequence[-1]] = {"wrappers": runtime.pop("wrappers")}
    if runtime and "data" in runtime:
        routed[sequence[0]] = {"data": runtime.pop("data")}
    for key in ("compute_dtype", "pallas", "param_sharding"):
        if runtime and key in runtime:
            tail = routed[sequence[-1]] or {}
            tail[key] = runtime.pop(key)
            routed[sequence[-1]] = tail
    assert not runtime, runtime
    return routed


class SequentialNetwork(Network):
    """A 2-net pipeline (e.g. U-Net translator -> embedder).

    The composition presents itself as one network: the LAST subnet's
    wrappers move up to the composition (and the subnet keeps none), the
    FIRST subnet's data defaults become the composition's, and channel
    compatibility across the junction is asserted.
    """

    NetworkParams = namedtuple("NetworkParams", ["runtime"])

    def __init__(self, networks, sequence, device=None, frozen=False):
        assert len(networks) == len(sequence)
        assert len(networks) == 2, "Tested only for a sequence of 2 networks"
        self.sequence = sequence
        self.networks = networks
        head = networks[sequence[0]]
        tail = networks[sequence[-1]]
        super().__init__(frozen, tail.model)

        self.wrappers, tail.wrappers = \
            tail.wrappers, _build_stage_wrappers("", device)
        self.network_params = self.NetworkParams(
            {"wrappers": tail.network_params.runtime.get("wrappers"),
             "data": head.network_params.runtime.get("data"),
             "param_sharding":
                 tail.network_params.runtime.get("param_sharding")})
        assert head.meta["out_channels"] == tail.meta["in_channels"]
        self.meta = {"in_channels": head.meta["in_channels"],
                     "out_channels": tail.meta["out_channels"]}

    def __call__(self, image):
        return self.wrappers[self.stage](image, self.forward, self.model)

    def __getitem__(self, key):
        return self.networks[key]

    def forward(self, image):
        for name in self.sequence:
            image = self.networks[name](image)
        return image

    def _each(self, method):
        for name in self.sequence:
            getattr(self.networks[name], method)()

    def train(self):
        # same contract as the base class: a frozen composition never
        # flips back to TRAIN-stage wrappers
        if not self.frozen:
            self._each("train")
            self.stage = TRAIN
        return self

    def eval(self):
        self._each("eval")
        self.stage = EVAL
        return self

    def freeze(self, net=None):
        if net is not None:
            self.networks[net].freeze()
            return self
        self._each("freeze")
        self.frozen = True
        self.stage = EVAL  # base-class freeze() semantics (eval wrappers)
        return self

    def parameters(self, optimizer_opts, net=None):
        if net is not None:
            return self.networks[net].parameters(optimizer_opts)
        reported = ((name, self.networks[name].parameters(optimizer_opts))
                    for name in self.sequence)
        return {name: groups for name, groups in reported
                if groups is not None}

    @classmethod
    def initialize(cls, params, device=None):
        sequence = params.pop("sequence").split(",")
        # a composition-level runtime routes to the subnets exactly like the
        # checkpoint-load path does (wrappers/fast-path keys to the tail,
        # data defaults to the head)
        routed = _route_runtime_overrides(params.pop("runtime", None),
                                          sequence)
        for name, overrides in routed.items():
            if overrides:
                params[name].setdefault("runtime", {}).update(overrides)
        built = {name: NETWORKS[spec.pop("type")].initialize(spec, device)
                 for name, spec in params.items()}
        return cls(built, sequence, device=device, frozen=False)

    def overlay_params(self, new_params, device=None):
        if not new_params:
            return self
        missing = set(self.sequence) - set(new_params.keys())
        assert not missing, missing
        overlaid = {}
        for name in self.sequence:
            sub = self.networks[name]
            if new_params.get(name):
                overlaid[name] = sub.overlay_params(new_params[name], device)
            else:
                # a falsy entry keeps the subnet as-is — but __init__ STOLE
                # the tail's wrappers into this composition (and left the
                # subnet an empty set), so the new composition must re-steal
                # from a shallow copy carrying the LIVE wrappers; handing it
                # the shared subnet would silently strip multiscale/whiten
                # from the overlay's eval path
                sub = copy.copy(sub)
                if name == self.sequence[-1]:
                    sub.wrappers = dict(self.wrappers)
                overlaid[name] = sub
        return type(self)(overlaid, self.sequence, device=device, frozen=True)

    def state_dict(self):
        flat, hierarchy = _flatten_substates(self.networks, self.sequence)
        flat["net"] = {"type": type(self).__name__,
                       "frozen": self.frozen,
                       "sequence": self.sequence,
                       "network_hierarchy": hierarchy}
        return flat

    @classmethod
    def initialize_from_state(cls, state_dict, device=None, params=None,
                              runtime=None):
        header = state_dict.pop("net")
        assert header["type"] == cls.__name__
        assert header.keys() == {"type", "frozen", "sequence",
                                 "network_hierarchy"}, header.keys()
        sequence = list(header["sequence"])
        hierarchy = header["network_hierarchy"]
        assert set(sequence) == set(hierarchy.keys())

        routed_runtime = _route_runtime_overrides(runtime, sequence)
        if params is not None:
            declared = params["sequence"].split(",")
            assert sequence == declared, (sequence, declared)
            # mirror initialize(): a composition-level runtime routes into
            # the subnet specs (wrappers/fast-path keys to the tail, data
            # to the head) — the checkpointed subnet runtimes carry those
            # overrides, so the resume consistency check must too
            yaml_routed = _route_runtime_overrides(
                copy.deepcopy(params.get("runtime")), sequence)
            for name, overrides in yaml_routed.items():
                if overrides:
                    params[name].setdefault("runtime", {}).update(overrides)

        restored = {}
        for name in hierarchy:
            netparams = None
            if params is not None:
                # "type" was consumed by initialize() when the net was
                # built; the subnet's resume consistency check compares
                # construction params only
                netparams = params[name]
                declared_type = netparams.pop("type", None)
                assert declared_type in (None, state_dict[name]["type"]), \
                    (declared_type, state_dict[name]["type"])
            restored[name] = NETWORKS[
                state_dict[name]["type"]].initialize_from_state(
                    _nest_substates(state_dict, hierarchy, name), device,
                    netparams, routed_runtime[name])
        return cls(restored, sequence, device=device,
                   frozen=header["frozen"])

    def train_data(self):
        rows = []
        for name in self.sequence:
            for row in self.networks[name].train_data():
                rows.append({**row,
                             "key": row["key"].replace("net/", name + "/")})
        return rows


class CirNetwork(SingleNetwork):
    """Retrieval network: injects model mean/std as data defaults, keeps
    BatchNorm frozen in training (trunks are built frozen_bn), and assigns
    the GeM/pool p parameter a 10x-lr, 0-weight-decay optimizer group
    (reference ``network.py:392-428``)."""

    def __init__(self, model, network_params, device=None, frozen=False):
        data_defaults = network_params.runtime.setdefault("data", {})
        data_defaults.setdefault("mean_std",
                                 [model.meta["mean"], model.meta["std"]])
        super().__init__(model, network_params, device, frozen)

    @classmethod
    def _canonicalize_resume_params(cls, params, model):
        # mirror __init__'s mean/std injection (without mutating the
        # caller's yaml dicts) so a pathless CirNetwork yaml that relied on
        # the injection still passes the resume consistency check
        runtime = dict(params.get("runtime") or {})
        data = dict(runtime.get("data") or {})
        data.setdefault("mean_std", [model.meta["mean"], model.meta["std"]])
        runtime["data"] = data
        params["runtime"] = runtime

    def parameters(self, optimizer_opts, net="net"):
        assert net == "net"
        if self.frozen:
            return None
        params = self.model.params
        labels = _label_by_path(
            params,
            lambda path, _: "pool" if path and path[0] == "pool"
            else "default")
        return {"params": params, "labels": labels,
                "opts": {"pool": {"lr_multiplier": 10.0,
                                  "weight_decay": 0.0}}}


NETWORKS = {
    "SingleNetwork": SingleNetwork,
    "SequentialNetwork": SequentialNetwork,
    "CirNetwork": CirNetwork,
}


def initialize_network(params, device=None, state=None, runtime=None):
    label = params.pop("type") if params else state["net"]["type"]
    cls = NETWORKS[label]
    if state:
        return cls.initialize_from_state(state, device, params, runtime)
    return cls.initialize(params, device)
