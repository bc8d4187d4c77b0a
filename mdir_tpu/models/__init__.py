"""Model registry: label -> flax model factory (reference MODEL_LABELS parity,
``mdir/components/model/network/__init__.py:17-37``).

A ``Model`` bundles the flax module, its variables (params/batch_stats) and a
``meta`` dict (in/out channels etc.). ``initialize_model`` consumes a params
dict with an ``architecture`` key, like the reference factory.
"""
import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from . import autoencoder, retrievalnet, torch_import, trunks, unet, weight_init
from .retrievalnet import ImageRetrievalNet, init_retrieval_net


class IdentityModule(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        return x


@dataclasses.dataclass
class Model:
    """A flax module + variables + metadata, the unit the Network layer wraps."""
    module: nn.Module
    meta: Dict[str, Any]
    variables: Optional[Dict[str, Any]] = None
    model_params: Optional[Dict[str, Any]] = None  # the yaml section that built it

    def __post_init__(self):
        self._apply_cache = {}

    def init(self, rng, sample_hw=(64, 64)):
        """Initialize variables with a dummy input (param shapes are
        resolution-independent). Jitted: un-jitted flax init dispatches every
        op separately, which is pathological over remote-device transports."""
        in_ch = self.meta.get("in_channels", 3)
        dummy = jnp.zeros((1,) + tuple(sample_hw) + (in_ch,), jnp.float32)
        self.variables = jax.jit(self.module.init)({"params": rng}, dummy)
        return self

    def _jitted(self, train, mutable):
        key = (train, mutable)
        if key not in self._apply_cache:
            module = self.module
            accepts_train = _accepts_train(module)

            def fn(variables, x, rngs=None, **kwargs):
                if accepts_train:
                    return module.apply(variables, x, train=train, rngs=rngs,
                                        mutable=["batch_stats"] if mutable else False,
                                        **kwargs)
                return module.apply(variables, x, rngs=rngs,
                                    mutable=["batch_stats"] if mutable else False,
                                    **kwargs)

            self._apply_cache[key] = jax.jit(fn)
        return self._apply_cache[key]

    def apply(self, x, train=False, rngs=None, **kwargs):
        assert self.variables is not None, "Model not initialized"
        mutable = bool(train and "batch_stats" in self.variables)
        out = self._jitted(train, mutable)(self.variables, x, rngs=rngs, **kwargs)
        if mutable:
            y, updates = out
            self.variables = {**self.variables, **updates}
            return y
        return out

    @property
    def params(self):
        return self.variables.get("params", {}) if self.variables else {}

    @property
    def pool_p(self):
        """GeM p value (cirtorch ``model.pool.p.item()`` equivalent)."""
        return float(self.variables["params"]["pool"]["p"][0])

    @property
    def is_descriptor_model(self):
        """True for retrieval nets (output (N, D) descriptors, not images)."""
        return "pooling" in self.meta

    def replace_params(self, params):
        self.variables = {**(self.variables or {}), "params": params}
        return self


def _accepts_train(module):
    from .branched import BranchedRetrievalNet

    return not isinstance(module, (ImageRetrievalNet, BranchedRetrievalNet))


def _make_identity(**params):
    assert not params, params.keys()
    model = Model(IdentityModule(), meta={})
    return model.init(jax.random.PRNGKey(0))


def _make_unet(cls):
    def factory(in_channels, out_channels, **params):
        hidden = params.pop("hidden", None)
        if hidden is not None:
            params["hidden"] = tuple(hidden)
        module = cls(in_channels=in_channels, out_channels=out_channels, **params)
        meta = {"in_channels": in_channels, "out_channels": out_channels}
        # the init dummy must survive the net's downsampling chain: the p2p
        # family runs nested_levels+1 stride-2 convs (the default
        # nested_levels=7 therefore needs a 256px dummy — param shapes are
        # resolution-independent, so any valid size initializes identically)
        nested = getattr(module, "nested_levels", None)
        sample = 64 if nested is None else max(64, 2 ** (int(nested) + 1))
        return Model(module, meta).init(jax.random.PRNGKey(0),
                                        sample_hw=(sample, sample))
    return factory


def _make_cirnet(**params):
    """cirnet factory (reference cirnet.py:10-23 + imageretrievalnet init)."""
    for key in ["local_whitening", "pooling", "regional", "whitening", "pretrained"]:
        if key not in params:
            raise ValueError("Key '%s' not in params" % key)
    architecture = params.pop("cir_architecture")
    pretrained = params.pop("pretrained")
    whitening = params.pop("whitening")
    module, meta = init_retrieval_net(
        architecture=architecture,
        local_whitening=params.pop("local_whitening"),
        pooling=params.pop("pooling"),
        regional=params.pop("regional"),
        whitening=whitening,
    )
    assert not params, params.keys()
    model = Model(module, meta).init(jax.random.PRNGKey(0))
    if pretrained:
        torch_import.load_pretrained_features(model, architecture)
    if isinstance(whitening, str):
        torch_import.load_whitening_pkl(model, whitening)
    return model


MODEL_LABELS = {
    "identity": _make_identity,
    "orig_unet": _make_unet(unet.OrigUNet),
    "p2p_unet": _make_unet(unet.P2pUNet),
    "outconv_unet": _make_unet(unet.OutconvP2pUNet),
    "outconv_dynint_unet": _make_unet(unet.OutconvP2pUNetDynamicInterpolate),
    "shallow_p2p_unet": _make_unet(unet.ShallowP2pUNet),
    "inconv_p2p_unet": _make_unet(unet.InconvP2pUNet),
    "aligned_p2p_unet": _make_unet(unet.AlignedP2pUNet),
    "pixelconv_regr": _make_unet(autoencoder.PixelConvRegr),
    "pixelconv_res": _make_unet(autoencoder.PixelConvRes),
    "autoencoder_regr": _make_unet(autoencoder.AutoencoderRegr),
    "cirnet": _make_cirnet,
}


def _make_cirnet_branched(**params):
    from . import branched

    return branched.init_cirnet_branched(**params)


MODEL_LABELS["cirnet_branched"] = _make_cirnet_branched


def initialize_model(params):
    params = dict(params)
    model = MODEL_LABELS[params.pop("architecture")](**params)
    return model
