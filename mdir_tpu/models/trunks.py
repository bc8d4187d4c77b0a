"""CNN feature trunks (AlexNet / VGG / ResNet / DenseNet / SqueezeNet) in
flax, NHWC, torch-importable — the full 16-architecture OUTPUT_DIM table.

Architecture parity with the trunks the reference slices out of torchvision
(``cirtorch/networks/imageretrievalnet.py:169-181``): the classifier head and
the final maxpool (alexnet/vgg) or avgpool+fc (resnet) are dropped, densenet
keeps all ``features`` children plus an appended ReLU, squeezenet keeps all
``features`` children — so every trunk ends in non-negative activations. Submodules are named after the torch state_dict keys
so checkpoint import is a pure name/layout mapping (see torch_import.py).

BatchNorm runs frozen (running stats) by default — the only mode the
retrieval nets ever use, including training (reference ``network.py:399-408``).

**Static-shape batching.** The reference runs batch_size=1 at native
resolution; on TPU we pad images into shape buckets and batch them. To keep
the result *exactly* equal to native-shape execution, a per-image valid
extent ``valid_hw`` (N, 2) int array flows through the trunk: after every
nonlinearity and pooling stage, cells outside the current valid extent are
zeroed, and the extent is updated with the same floor arithmetic torch uses
(``out = floor((in + 2p - k)/s) + 1``). Zero cells then play exactly the role
of torch's implicit conv zero-padding at the true image boundary, and
intermediate odd-row truncation by floor-mode pooling cannot leak into valid
cells. Pooling over the final feature map uses the resulting feature-level
mask. (ReLU precedes every maxpool in these trunks, so zeros are a safe
identity for max windows.)
"""
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import BatchNorm, Conv, avg_pool, max_pool, relu

# (arch -> trunk output channels), reference imageretrievalnet.py:62-79
OUTPUT_DIM = {
    "alexnet": 256,
    "vgg11": 512,
    "vgg13": 512,
    "vgg16": 512,
    "vgg19": 512,
    "resnet18": 512,
    "resnet34": 512,
    "resnet50": 2048,
    "resnet101": 2048,
    "resnet152": 2048,
    "densenet121": 1024,
    "densenet161": 2208,
    "densenet169": 1664,
    "densenet201": 1920,
    "squeezenet1_0": 512,
    "squeezenet1_1": 512,
}

# Total spatial stride of each trunk (bucket shapes should be multiples).
TOTAL_STRIDE = {
    "alexnet": 16, "vgg11": 16, "vgg13": 16, "vgg16": 16, "vgg19": 16,
    "resnet18": 32, "resnet34": 32, "resnet50": 32, "resnet101": 32,
    "resnet152": 32,
    "densenet121": 32, "densenet161": 32, "densenet169": 32,
    "densenet201": 32,
    "squeezenet1_0": 16, "squeezenet1_1": 16,
}


def conv_out_extent(valid, kernel, stride, padding):
    """torch output-size arithmetic on a (possibly traced) extent array."""
    return (valid + 2 * padding - kernel) // stride + 1


def apply_valid_mask(x, valid_hw):
    """Zero all cells at or beyond the per-image valid extent. x: (N,H,W,C)."""
    if valid_hw is None:
        return x
    h, w = x.shape[-3], x.shape[-2]
    rows = jnp.arange(h)[None, :, None]  # (1, H, 1)
    cols = jnp.arange(w)[None, None, :]  # (1, 1, W)
    mask = (rows < valid_hw[:, 0:1, None]) & (cols < valid_hw[:, 1:2, None])
    return x * mask[..., None].astype(x.dtype)


def feature_mask(shape_hw, valid_hw, dtype=jnp.float32):
    """(N, H, W) float mask of valid feature cells for masked pooling."""
    h, w = shape_hw
    rows = jnp.arange(h)[None, :, None]
    cols = jnp.arange(w)[None, None, :]
    mask = (rows < valid_hw[:, 0:1, None]) & (cols < valid_hw[:, 1:2, None])
    return mask.astype(dtype)


# Sequential specs mirror torchvision features indices ([:-1] slicing applied:
# the trailing maxpool is dropped so the trunk ends with ReLU).
ALEXNET_SPEC = (
    ("conv", 0, 64, 11, 4, 2), ("relu",), ("maxpool", 3, 2),
    ("conv", 3, 192, 5, 1, 2), ("relu",), ("maxpool", 3, 2),
    ("conv", 6, 384, 3, 1, 1), ("relu",),
    ("conv", 8, 256, 3, 1, 1), ("relu",),
    ("conv", 10, 256, 3, 1, 1), ("relu",),
)


def _vgg_spec(cfg):
    spec = []
    idx = 0
    for v in cfg:
        if v == "M":
            spec.append(("maxpool", 2, 2))
            idx += 1
        else:
            spec.append(("conv", idx, v, 3, 1, 1))
            spec.append(("relu",))
            idx += 2
    if spec[-1][0] == "maxpool":  # drop the final maxpool ([:-1])
        spec = spec[:-1]
    return tuple(spec)


VGG_CFGS = {
    "vgg11": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "vgg13": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "vgg16": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"],
    "vgg19": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"],
}


def ceil_out_extent(valid, kernel, stride):
    """torch ceil_mode pooling output size (padding 0)."""
    return (valid - kernel + stride - 1) // stride + 1


def max_pool_ceil(x, kernel_size, stride):
    """torch MaxPool2d(ceil_mode=True, padding=0) over NHWC.

    Tail windows that extend past the buffer see zero padding — exact for
    the post-ReLU (non-negative, garbage-masked) inputs the squeezenet
    trunk feeds it: torch's partial window maxes only valid cells, and
    max(valid + {0}) == max(valid) when valid >= 0.
    """
    k = (kernel_size, kernel_size) if isinstance(kernel_size, int) \
        else kernel_size
    s = (stride, stride) if isinstance(stride, int) else stride
    h, w = x.shape[1], x.shape[2]
    oh = ceil_out_extent(h, k[0], s[0])
    ow = ceil_out_extent(w, k[1], s[1])
    pad_h = (oh - 1) * s[0] + k[0] - h
    pad_w = (ow - 1) * s[1] + k[1] - w
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    return nn.max_pool(x, window_shape=tuple(k), strides=tuple(s),
                       padding="VALID")


class Fire(nn.Module):
    """squeezenet Fire: squeeze 1x1 -> (expand1x1 || expand3x3), all ReLU.

    The squeeze output is masked before the 3x3 expand so bias garbage in
    padded cells cannot leak across the valid boundary.
    """
    squeeze: int
    expand1: int
    expand3: int

    @nn.compact
    def __call__(self, x, valid_hw=None):
        s = apply_valid_mask(relu(Conv(self.squeeze, 1, name="squeeze")(x)),
                             valid_hw)
        e1 = relu(Conv(self.expand1, 1, name="expand1x1")(s))
        e3 = relu(Conv(self.expand3, 3, 1, 1, name="expand3x3")(s))
        return apply_valid_mask(jnp.concatenate([e1, e3], axis=-1), valid_hw)


class DenseLayer(nn.Module):
    """torchvision _DenseLayer: BN-ReLU-1x1 -> BN-ReLU-3x3, concat output.

    Masks after each ReLU: BatchNorm turns padded zeros into a per-channel
    constant that the 3x3 conv would smear across the valid boundary.
    """
    growth: int
    frozen_bn: bool = True

    @nn.compact
    def __call__(self, x, valid_hw=None):
        y = relu(BatchNorm(self.frozen_bn, name="norm1")(x))
        y = apply_valid_mask(y, valid_hw)
        y = Conv(4 * self.growth, 1, use_bias=False, name="conv1")(y)
        y = relu(BatchNorm(self.frozen_bn, name="norm2")(y))
        y = apply_valid_mask(y, valid_hw)
        y = Conv(self.growth, 3, 1, 1, use_bias=False, name="conv2")(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseBlock(nn.Module):
    layers: int
    growth: int
    frozen_bn: bool = True

    @nn.compact
    def __call__(self, x, valid_hw=None):
        for i in range(self.layers):
            x = DenseLayer(self.growth, self.frozen_bn,
                           name="denselayer%d" % (i + 1))(x, valid_hw)
        return x


class DenseTransition(nn.Module):
    """torchvision _Transition: BN-ReLU-1x1 conv, then 2x2 s2 avg pool."""
    out_features: int
    frozen_bn: bool = True

    @nn.compact
    def __call__(self, x, valid_hw=None):
        y = relu(BatchNorm(self.frozen_bn, name="norm")(x))
        y = apply_valid_mask(y, valid_hw)
        y = Conv(self.out_features, 1, use_bias=False, name="conv")(y)
        y = avg_pool(y, 2, 2)
        if valid_hw is not None:
            valid_hw = conv_out_extent(valid_hw, 2, 2, 0)
            y = apply_valid_mask(y, valid_hw)
        return y, valid_hw


class SequentialFeatures(nn.Module):
    """Feature stack named by torchvision ``features.<idx>`` indices.

    Spec items: ``("conv", idx, out, k, s, p[, use_bias])``, ``("relu",)``,
    ``("maxpool", k, s[, p])``, ``("maxpool_ceil", k, s)``, ``("bn", idx)``,
    ``("fire", idx, squeeze, e1, e3)``, ``("denseblock", idx, growth, n)``,
    ``("transition", idx, out)`` — covering alexnet/vgg plus the densenet
    and squeezenet trunk assemblies (cirtorch slicing, see module docstring).
    """
    spec: Tuple[Any, ...]
    frozen_bn: bool = True

    @nn.compact
    def __call__(self, x, valid_hw=None):
        # masked buckets require frozen (running-stats) BN: batch-mode BN
        # would compute statistics over the padded zero cells and break the
        # bucketed == native invariant silently
        assert self.frozen_bn or valid_hw is None, \
            "batch-stats BN cannot run over masked buckets (frozen_bn=False"\
            " with valid_hw)"
        for item in self.spec:
            kind = item[0]
            if kind == "conv":
                _, idx, out, k, s, p = item[:6]
                use_bias = item[6] if len(item) > 6 else True
                x = Conv(out, k, s, p, use_bias=use_bias, name=str(idx))(x)
                if valid_hw is not None:
                    valid_hw = conv_out_extent(valid_hw, k, s, p)
            elif kind == "relu":
                x = relu(x)
                x = apply_valid_mask(x, valid_hw)
            elif kind == "maxpool":
                p = item[3] if len(item) > 3 else 0
                x = max_pool(x, item[1], item[2], padding=p)
                if valid_hw is not None:
                    valid_hw = conv_out_extent(valid_hw, item[1], item[2], p)
                    x = apply_valid_mask(x, valid_hw)
            elif kind == "maxpool_ceil":
                x = max_pool_ceil(x, item[1], item[2])
                if valid_hw is not None:
                    valid_hw = ceil_out_extent(valid_hw, item[1], item[2])
                    x = apply_valid_mask(x, valid_hw)
            elif kind == "bn":
                x = BatchNorm(self.frozen_bn, name=str(item[1]))(x)
            elif kind == "fire":
                _, idx, sq, e1, e3 = item
                x = Fire(sq, e1, e3, name=str(idx))(x, valid_hw)
            elif kind == "denseblock":
                _, idx, growth, layers = item
                x = DenseBlock(layers, growth, self.frozen_bn,
                               name=str(idx))(x, valid_hw)
            elif kind == "transition":
                x, valid_hw = DenseTransition(item[2], self.frozen_bn,
                                              name=str(item[1]))(x, valid_hw)
            else:
                raise ValueError(kind)
        return x, valid_hw


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    frozen_bn: bool = True

    @nn.compact
    def __call__(self, x, valid_hw=None):
        identity = x
        out = Conv(self.planes, 3, self.stride, 1, use_bias=False, name="conv1")(x)
        if valid_hw is not None:
            valid_hw = conv_out_extent(valid_hw, 3, self.stride, 1)
        out = relu(BatchNorm(self.frozen_bn, name="bn1")(out))
        out = apply_valid_mask(out, valid_hw)
        out = Conv(self.planes, 3, 1, 1, use_bias=False, name="conv2")(out)
        out = BatchNorm(self.frozen_bn, name="bn2")(out)
        if self.downsample:
            identity = Conv(self.planes, 1, self.stride, 0, use_bias=False,
                            name="downsample_0")(x)
            identity = BatchNorm(self.frozen_bn, name="downsample_1")(identity)
        out = relu(out + identity)
        return apply_valid_mask(out, valid_hw), valid_hw


class Bottleneck(nn.Module):
    """torchvision v1.5 bottleneck (stride on the 3x3 conv)."""
    planes: int
    stride: int = 1
    downsample: bool = False
    frozen_bn: bool = True

    @nn.compact
    def __call__(self, x, valid_hw=None):
        identity = x
        out = Conv(self.planes, 1, 1, 0, use_bias=False, name="conv1")(x)
        out = relu(BatchNorm(self.frozen_bn, name="bn1")(out))
        out = apply_valid_mask(out, valid_hw)
        out = Conv(self.planes, 3, self.stride, 1, use_bias=False, name="conv2")(out)
        if valid_hw is not None:
            valid_hw = conv_out_extent(valid_hw, 3, self.stride, 1)
        out = relu(BatchNorm(self.frozen_bn, name="bn2")(out))
        out = apply_valid_mask(out, valid_hw)
        out = Conv(self.planes * 4, 1, 1, 0, use_bias=False, name="conv3")(out)
        out = BatchNorm(self.frozen_bn, name="bn3")(out)
        if self.downsample:
            identity = Conv(self.planes * 4, 1, self.stride, 0, use_bias=False,
                            name="downsample_0")(x)
            identity = BatchNorm(self.frozen_bn, name="downsample_1")(identity)
        out = relu(out + identity)
        return apply_valid_mask(out, valid_hw), valid_hw


# densenet: (initial features, growth rate, block sizes)
DENSENET_CFGS = {
    "densenet121": (64, 32, (6, 12, 24, 16)),
    "densenet161": (96, 48, (6, 12, 36, 24)),
    "densenet169": (64, 32, (6, 12, 32, 32)),
    "densenet201": (64, 32, (6, 12, 48, 32)),
}


def _densenet_spec(arch):
    """cirtorch slicing (imageretrievalnet.py:175-177): ALL of torchvision's
    ``features`` children (Sequential re-indexes them 0..11) plus a trailing
    ReLU so activations are non-negative."""
    init, growth, blocks = DENSENET_CFGS[arch]
    spec = [("conv", 0, init, 7, 2, 3, False), ("bn", 1), ("relu",),
            ("maxpool", 3, 2, 1)]
    channels = init
    idx = 4
    for bi, layers in enumerate(blocks):
        spec.append(("denseblock", idx, growth, layers))
        channels += layers * growth
        idx += 1
        if bi < len(blocks) - 1:
            channels //= 2
            spec.append(("transition", idx, channels))
            idx += 1
    spec += [("bn", idx), ("relu",)]
    return tuple(spec)


# squeezenet: cirtorch takes all of torchvision's ``features`` children
# (imageretrievalnet.py:178-179); fire tuples are (squeeze, e1x1, e3x3)
SQUEEZENET_SPECS = {
    "squeezenet1_0": (
        ("conv", 0, 96, 7, 2, 0), ("relu",), ("maxpool_ceil", 3, 2),
        ("fire", 3, 16, 64, 64), ("fire", 4, 16, 64, 64),
        ("fire", 5, 32, 128, 128), ("maxpool_ceil", 3, 2),
        ("fire", 7, 32, 128, 128), ("fire", 8, 48, 192, 192),
        ("fire", 9, 48, 192, 192), ("fire", 10, 64, 256, 256),
        ("maxpool_ceil", 3, 2), ("fire", 12, 64, 256, 256),
    ),
    "squeezenet1_1": (
        ("conv", 0, 64, 3, 2, 0), ("relu",), ("maxpool_ceil", 3, 2),
        ("fire", 3, 16, 64, 64), ("fire", 4, 16, 64, 64),
        ("maxpool_ceil", 3, 2),
        ("fire", 6, 32, 128, 128), ("fire", 7, 32, 128, 128),
        ("maxpool_ceil", 3, 2),
        ("fire", 9, 48, 192, 192), ("fire", 10, 48, 192, 192),
        ("fire", 11, 64, 256, 256), ("fire", 12, 64, 256, 256),
    ),
}


RESNET_LAYERS = {
    "resnet18": (BasicBlock, (2, 2, 2, 2)),
    "resnet34": (BasicBlock, (3, 4, 6, 3)),
    "resnet50": (Bottleneck, (3, 4, 6, 3)),
    "resnet101": (Bottleneck, (3, 4, 23, 3)),
    "resnet152": (Bottleneck, (3, 8, 36, 3)),
}


class ResNetFeatures(nn.Module):
    """torchvision resnet minus avgpool/fc (children()[:-2])."""
    block: Any
    layers: Sequence[int]
    frozen_bn: bool = True

    @nn.compact
    def __call__(self, x, valid_hw=None):
        # masked buckets require frozen (running-stats) BN: batch-mode BN
        # would compute statistics over the padded zero cells and break the
        # bucketed == native invariant silently
        assert self.frozen_bn or valid_hw is None, \
            "batch-stats BN cannot run over masked buckets (frozen_bn=False"\
            " with valid_hw)"
        x = Conv(64, 7, 2, 3, use_bias=False, name="conv1")(x)
        if valid_hw is not None:
            valid_hw = conv_out_extent(valid_hw, 7, 2, 3)
        x = relu(BatchNorm(self.frozen_bn, name="bn1")(x))
        x = apply_valid_mask(x, valid_hw)
        x = max_pool(x, 3, 2, padding=1)
        if valid_hw is not None:
            valid_hw = conv_out_extent(valid_hw, 3, 2, 1)
            x = apply_valid_mask(x, valid_hw)

        expansion = 1 if self.block is BasicBlock else 4
        in_planes = 64
        for li, (planes, blocks) in enumerate(zip((64, 128, 256, 512), self.layers)):
            stride = 1 if li == 0 else 2
            for bi in range(blocks):
                s = stride if bi == 0 else 1
                downsample = bi == 0 and (s != 1 or in_planes != planes * expansion)
                x, valid_hw = self.block(
                    planes, s, downsample, self.frozen_bn,
                    name="layer%d_%d" % (li + 1, bi))(x, valid_hw)
                in_planes = planes * expansion
        return x, valid_hw


def make_trunk(architecture, frozen_bn=True, name=None):
    """Build the feature trunk module for an architecture label."""
    spec = _arch_spec(architecture)
    if spec is not None:
        return SequentialFeatures(spec, frozen_bn, name=name)
    if architecture in RESNET_LAYERS:
        block, layers = RESNET_LAYERS[architecture]
        return ResNetFeatures(block, layers, frozen_bn, name=name)
    raise ValueError("Unsupported or unknown architecture: %s" % architecture)


def _arch_spec(architecture):
    """SequentialFeatures spec for spec-driven trunks (None for resnets)."""
    if architecture == "alexnet":
        return ALEXNET_SPEC
    if architecture in VGG_CFGS:
        return _vgg_spec(VGG_CFGS[architecture])
    if architecture in DENSENET_CFGS:
        return _densenet_spec(architecture)
    if architecture in SQUEEZENET_SPECS:
        return SQUEEZENET_SPECS[architecture]
    return None


def trunk_valid_extent(architecture, hw):
    """Host replay of the in-graph valid-extent arithmetic for one image.

    Returns the feature-map extent the trunk's ``valid_hw`` propagation
    produces for an input of true size ``hw`` — used by the batched
    extractor to compute per-image RMAC/Rpool region grids on host
    (parallel/extract.py) without running the trunk.
    """
    h, w = int(hw[0]), int(hw[1])

    # the SAME formulas the in-graph propagation uses — shared on purpose
    # so the host replay can never desynchronize from the traced arithmetic
    step = conv_out_extent
    ceil_step = ceil_out_extent

    def run_spec(spec):
        nonlocal h, w
        for item in spec:
            if item[0] == "conv":
                _, _, _, k, s, p = item[:6]
                h, w = step(h, k, s, p), step(w, k, s, p)
            elif item[0] == "maxpool":
                p = item[3] if len(item) > 3 else 0
                h, w = step(h, item[1], item[2], p), \
                    step(w, item[1], item[2], p)
            elif item[0] == "maxpool_ceil":
                h, w = ceil_step(h, item[1], item[2]), \
                    ceil_step(w, item[1], item[2])
            elif item[0] == "transition":
                h, w = step(h, 2, 2, 0), step(w, 2, 2, 0)

    spec = _arch_spec(architecture)
    if spec is not None:
        run_spec(spec)
    elif architecture in RESNET_LAYERS:
        h, w = step(h, 7, 2, 3), step(w, 7, 2, 3)
        h, w = step(h, 3, 2, 1), step(w, 3, 2, 1)
        for _ in range(3):  # layers 2-4 start with a stride-2 3x3 p1 conv
            h, w = step(h, 3, 2, 1), step(w, 3, 2, 1)
    else:
        raise ValueError("Unsupported or unknown architecture: %s"
                         % architecture)
    return h, w
