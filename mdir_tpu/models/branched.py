"""Branched retrieval net: split the trunk at the Nth conv into per-channel-
group branches (e.g. rgb / gray / edge inputs), merge by sum or concat.

Parity with ``mdir/components/model/network/cirnet.py:25-116``
(init_cirnet_branched / ImageRetrievalNetBranched): each branch runs the
pre-split conv stack on its slice of the input channels, scaled by its
weight; merged features feed the shared post stack and the usual
pool/whiten chain. Branch first-conv weights initialize from the pretrained
trunk by ``clone`` (3-channel copy) or ``sum`` (collapse over input
channels); ``concat`` merging repeats the first post-conv weights over the
input axis. Supported for the Sequential trunks (alexnet / vgg*), as in
practice in the reference.
"""
import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops import pooling as pool_ops
from .layers import Dense
from .retrievalnet import GeMPool, ImageRetrievalNet
from .trunks import (ALEXNET_SPEC, OUTPUT_DIM, VGG_CFGS, SequentialFeatures,
                     _vgg_spec, feature_mask)


def split_spec_at_conv(spec, layer):
    """Split a Sequential spec before its ``layer``-th conv (0-based)."""
    conv_positions = [i for i, item in enumerate(spec) if item[0] == "conv"]
    split = conv_positions[layer]
    return tuple(spec[:split]), tuple(spec[split:])


def trunk_spec(architecture):
    if architecture == "alexnet":
        return ALEXNET_SPEC
    if architecture in VGG_CFGS:
        return _vgg_spec(VGG_CFGS[architecture])
    raise ValueError(
        "cirnet_branched supports sequential trunks (alexnet/vgg*), got %s"
        % architecture)


class BranchedRetrievalNet(nn.Module):
    """Branches -> merge -> post trunk -> pool -> L2N -> (whiten) -> L2N."""
    architecture: str = "vgg16"
    branches: tuple = ()  # ((name, in_channels, weight), ...)
    merge_layer: int = 3
    merge_aggregation: str = "sum"
    pooling: str = "gem"
    whitening: bool = False
    p_init: float = 3.0

    @nn.compact
    def __call__(self, x, valid_hw=None):
        dim = OUTPUT_DIM[self.architecture]
        spec = trunk_spec(self.architecture)
        pre, post = split_spec_at_conv(spec, self.merge_layer)

        start = 0
        merged = None
        for name, in_ch, weight in self.branches:
            branch_in = x[..., start:start + in_ch]
            start += in_ch
            y, branch_valid = SequentialFeatures(
                pre, name="branches_%s" % name)(branch_in, valid_hw)
            y = weight * y
            if merged is None:
                merged, out_valid = y, branch_valid
            elif self.merge_aggregation == "sum":
                merged = merged + y
            elif self.merge_aggregation == "concat":
                merged = jnp.concatenate([merged, y], axis=-1)
            else:
                raise ValueError(self.merge_aggregation)

        o, out_valid = SequentialFeatures(post, name="features")(merged, out_valid)

        mask = None
        if out_valid is not None:
            mask = feature_mask(o.shape[-3:-1], out_valid, dtype=o.dtype)

        if self.pooling == "gem":
            o = GeMPool(self.p_init, name="pool")(o, mask=mask)
        elif self.pooling == "mac":
            o = pool_ops.mac(o, mask=mask)
        elif self.pooling == "spoc":
            o = pool_ops.spoc(o, mask=mask)
        else:
            raise ValueError(self.pooling)
        o = pool_ops.l2n(o)

        if self.whitening:
            o = Dense(dim, name="whiten")(o)
            o = pool_ops.l2n(o)
        return o


def init_cirnet_branched(**params):
    """Factory for MODEL_LABELS['cirnet_branched'] (reference cirnet.py:48)."""
    from . import Model, torch_import
    import jax

    channels = params.pop("channels")
    merge = dict(channels["merge"])
    assert set(merge.keys()) == {"layer", "aggregation"}, merge.keys()

    architecture = params.pop("cir_architecture")
    pretrained = params.pop("pretrained")
    pooling = params.pop("pooling")
    whitening = params.pop("whitening")
    local_whitening = params.pop("local_whitening", False)
    regional = params.pop("regional", False)
    assert not local_whitening and not regional, \
        "branched nets support global pooling only (as in the reference)"
    assert not params, params.keys()

    branch_items = []
    merging = []
    for key, branch in sorted(channels["branches"].items()):
        assert set(branch.keys()) == {"in", "init", "weight"}, branch.keys()
        assert branch["init"] in {"sum", "clone"}, branch["init"]
        name = key.split("_", 1)[1]
        branch_items.append((name, branch["in"], float(branch["weight"]),
                             branch["init"]))
        merging.append((branch["in"], branch["weight"]))

    if merge["layer"] == 0:
        # merge at the input: a single trunk with a widened first conv
        assert merge["aggregation"] == "concat"
        return _build_input_merged(architecture, pooling, whitening,
                                   pretrained, branch_items)

    module = BranchedRetrievalNet(
        architecture=architecture,
        branches=tuple((n, c, w) for n, c, w, _ in branch_items),
        merge_layer=merge["layer"],
        merge_aggregation=merge["aggregation"],
        pooling=pooling,
        whitening=bool(whitening),
    )
    in_channels = sum(c for _, c, _, _ in branch_items)
    meta = {
        "architecture": architecture, "local_whitening": False,
        "pooling": pooling, "regional": False, "whitening": whitening,
        "mean": [0.485, 0.456, 0.406], "std": [0.229, 0.224, 0.225],
        "outputdim": OUTPUT_DIM[architecture],
        "in_channels": in_channels,
        "out_channels": OUTPUT_DIM[architecture],
    }
    model = Model(module, meta)
    model.meta["in_channels"] = in_channels
    model.init(jax.random.PRNGKey(0))

    if pretrained:
        _init_branches_from_pretrained(model, architecture, branch_items,
                                       merge)
    return model


def _load_base_params(architecture):
    """Pretrained plain-trunk params (caffe features where published)."""
    from . import initialize_model

    base = initialize_model({
        "architecture": "cirnet", "cir_architecture": architecture,
        "local_whitening": False, "pooling": "gem", "regional": False,
        "whitening": False, "pretrained": True})
    return base.variables["params"]["features"]


def _adapt_first_conv(kernel, init, in_channels):
    """kernel (kh, kw, 3, out) -> branch first conv by clone or channel-sum."""
    if init == "clone":
        assert in_channels == 3
        return kernel
    assert init == "sum" and in_channels == 1
    return kernel.sum(axis=2, keepdims=True)


def _init_branches_from_pretrained(model, architecture, branch_items, merge):
    base = _load_base_params(architecture)
    params = model.variables["params"]
    spec = trunk_spec(architecture)
    pre, post = split_spec_at_conv(spec, merge["layer"])
    pre_convs = [str(item[1]) for item in pre if item[0] == "conv"]
    post_convs = [str(item[1]) for item in post if item[0] == "conv"]

    for name, in_ch, _weight, init in branch_items:
        branch = params["branches_%s" % name]
        for i, conv_idx in enumerate(pre_convs):
            src = base[conv_idx]["conv"]
            dst = branch[conv_idx]["conv"]
            kernel = np.asarray(src["kernel"])
            if i == 0:
                kernel = _adapt_first_conv(kernel, init, in_ch)
            dst["kernel"] = jnp.asarray(kernel)
            if "bias" in src:
                dst["bias"] = jnp.asarray(src["bias"])

    n_branches = len(branch_items)
    for i, conv_idx in enumerate(post_convs):
        src = base[conv_idx]["conv"]
        kernel = np.asarray(src["kernel"])
        if i == 0 and merge["aggregation"] == "concat":
            kernel = np.tile(kernel, (1, 1, n_branches, 1))
        params["features"][conv_idx]["conv"]["kernel"] = jnp.asarray(kernel)
        if "bias" in src:
            params["features"][conv_idx]["conv"]["bias"] = jnp.asarray(
                src["bias"])
    return model


def _build_input_merged(architecture, pooling, whitening, pretrained,
                        branch_items):
    """merge.layer == 0: plain retrieval net with a widened input conv whose
    weights are the per-branch adapted copies concatenated on the in axis."""
    from . import Model, initialize_model
    import jax

    from .retrievalnet import init_retrieval_net

    in_channels = sum(c for _, c, _, _ in branch_items)
    module, meta = init_retrieval_net(
        architecture=architecture, pooling=pooling, whitening=whitening)
    meta["in_channels"] = in_channels
    model = Model(module, meta)
    model.init(jax.random.PRNGKey(0))  # dummy input uses meta in_channels

    if pretrained:
        base = _load_base_params(architecture)
        spec = trunk_spec(architecture)
        first_conv = str(next(item[1] for item in spec if item[0] == "conv"))
        base_kernel = np.asarray(base[first_conv]["conv"]["kernel"])
        pieces = [w * _adapt_first_conv(base_kernel, init, c)
                  for _, c, w, init in branch_items]
        params = model.variables["params"]
        params["features"][first_conv]["conv"]["kernel"] = jnp.asarray(
            np.concatenate(pieces, axis=2))
        # remaining convs copy straight across
        for key in base:
            if key == first_conv:
                if "bias" in base[key]["conv"]:
                    params["features"][key]["conv"]["bias"] = jnp.asarray(
                        base[key]["conv"]["bias"])
                continue
            for leaf in base[key]["conv"]:
                params["features"][key]["conv"][leaf] = jnp.asarray(
                    base[key]["conv"][leaf])
    return model
