"""U-Net night->day translator family in flax (NHWC).

Architecture parity with ``mdir/components/model/network/unet.py``: the
pix2pix-style encoder/decoders (P2pUNet, ShallowP2pUNet, OutconvP2pUNet,
OutconvP2pUNetDynamicInterpolate, InconvP2pUNet, AlignedP2pUNet) and the
classic OrigUNet. Modules are named by their torch ``Sequential`` indices so
reference checkpoints import by direct name mapping.

All networks consume and produce NHWC; dropout/batchnorm honour the ``train``
call argument (torch train/eval semantics).
"""
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import BatchNorm, Conv, ConvTranspose, leaky_relu, max_pool, relu

# --- generic torch-Sequential-shaped executor ------------------------------

def _apply_item(item, x, train, make_name):
    kind = item[0]
    if kind == "conv":
        _, out, k, s, p, bias = item
        return Conv(out, k, s, p, use_bias=bias, name=make_name())(x)
    if kind == "convT":
        _, out, k, s, p, bias = item
        return ConvTranspose(out, k, s, p, use_bias=bias, name=make_name())(x)
    if kind == "bn":
        return BatchNorm(use_running_average=not train, name=make_name())(x)
    if kind == "relu":
        return relu(x)
    if kind == "lrelu":
        return leaky_relu(x, item[1])
    if kind == "tanh":
        return jnp.tanh(x)
    if kind == "dropout":
        return nn.Dropout(rate=item[1], deterministic=not train,
                          name=make_name())(x)
    if kind == "skip":
        return SkipCat(item[1], name=make_name())(x, train)
    if kind == "dyn":
        return DynSkipBlock(item[1], item[2], upsample=item[3],
                            name=make_name())(x, train)
    raise ValueError(kind)


_PARAMETRIC = {"conv", "convT", "bn", "dropout", "skip", "dyn"}


class Seq(nn.Module):
    """Runs a spec list; parametric items are named by torch Sequential index."""
    spec: Tuple[Any, ...]

    @nn.compact
    def __call__(self, x, train=False):
        for idx, item in enumerate(self.spec):
            x = _apply_item(item, x, train, make_name=lambda i=idx: str(i))
        return x


class SkipCat(nn.Module):
    """pix2pix skip block: concat([x, nested(x)]) on channels."""
    spec: Tuple[Any, ...]

    @nn.compact
    def __call__(self, x, train=False):
        y = Seq(self.spec, name="nested")(x, train)
        return jnp.concatenate([x, y], axis=-1)


# --- P2pUNet family ---------------------------------------------------------

def _p2p_skip_spec(nested, outer_ch, inter_ch, conv_kwargs, batchnorm=True,
                   dropout=0.0):
    k, s, p, bias = conv_kwargs
    spec = [("conv", inter_ch, k, s, p, bias)]
    if nested is not None:
        if batchnorm:
            spec.append(("bn",))
        spec += [("lrelu", 0.2), ("skip", nested)]
    else:
        spec.append(("relu",))
    spec.append(("convT", outer_ch, k, s, p, bias))
    if batchnorm:
        spec.append(("bn",))
    if dropout:
        spec.append(("dropout", dropout))
    spec.append(("relu",))
    return tuple(spec)


def _p2p_blocks(nested_levels, dropout=0.0):
    blocks = [(64, 128), (128, 256), (256, 512), (512, 512)][:nested_levels]
    blocks += [(512, 512, True)] * (nested_levels - len(blocks))
    return [(b[0], b[1], dropout * (b[2] if len(b) == 3 else False))
            for b in blocks]


class P2pUNet(nn.Module):
    """pix2pix U-Net: 4x4 s2 encoder/decoder, LeakyReLU/BN/Dropout, Tanh out."""
    in_channels: int = 3
    out_channels: int = 3
    dropout: float = 0.0
    batchnorm: bool = True
    nested_levels: int = 7

    def spec(self):
        conv_kwargs = (4, 2, 1, False)
        inner = None
        for cin, cout, drop in reversed(self._blocks()):
            inner = _p2p_skip_spec(inner, cin, cout, conv_kwargs,
                                   self.batchnorm, drop)
        return (
            ("conv", 64, 4, 2, 1, False),
            ("lrelu", 0.2),
            ("skip", inner),
            ("convT", self.out_channels, 4, 2, 1, True),
            ("tanh",),
        )

    def _blocks(self):
        return _p2p_blocks(self.nested_levels, self.dropout)

    @nn.compact
    def __call__(self, x, train=False):
        return Seq(self.spec(), name="outerblock")(x, train)


class ShallowP2pUNet(nn.Module):
    """Shallow variant: double convs (4x4 s2 + 1x1), ReLU only, conv head."""
    in_channels: int = 3
    out_channels: int = 3
    nested_levels: int = 4

    def spec(self):
        def skip_spec(nested, outer_ch, inter_ch):
            spec = [
                ("conv", inter_ch, 4, 2, 1, True), ("relu",),
                ("conv", inter_ch, 1, 1, 0, True), ("relu",),
            ]
            if nested is not None:
                spec.append(("skip", nested))
            spec += [
                ("convT", outer_ch, 4, 2, 1, True), ("relu",),
                ("conv", outer_ch, 1, 1, 0, True), ("relu",),
            ]
            return tuple(spec)

        blocks = [(64, 128), (128, 256), (256, 512)][:self.nested_levels]
        blocks += [(512, 512)] * (self.nested_levels - len(blocks))
        inner = None
        for cin, cout in reversed(blocks):
            inner = skip_spec(inner, cin, cout)
        return (
            ("conv", 64, 4, 2, 1, True), ("relu",),
            ("conv", 64, 1, 1, 0, True), ("relu",),
            ("skip", inner),
            ("convT", 64, 4, 2, 1, True), ("relu",),
            ("conv", 64, 1, 1, 0, True), ("relu",),
            ("conv", self.out_channels, 1, 1, 0, True),
        )

    @nn.compact
    def __call__(self, x, train=False):
        return Seq(self.spec(), name="outerblock")(x, train)


class OutconvP2pUNet(nn.Module):
    """P2pUNet with a conv head instead of Tanh."""
    in_channels: int = 3
    out_channels: int = 3
    nested_levels: int = 7
    outconv_channels: int = 32
    outconv_kernel: int = 3
    dropout: float = 0.0
    batchnorm: bool = False

    def spec(self):
        assert self.outconv_kernel % 2 == 1
        conv_kwargs = (4, 2, 1, True)
        blocks = [(64, 128), (128, 256), (256, 512)][:self.nested_levels]
        blocks += [(512, 512)] * (self.nested_levels - len(blocks))
        inner = None
        for cin, cout in reversed(blocks):
            inner = _p2p_skip_spec(inner, cin, cout, conv_kwargs,
                                   self.batchnorm, self.dropout)
        return (
            ("conv", 64, 4, 2, 1, True),
            ("lrelu", 0.2),
            ("skip", inner),
            ("convT", self.outconv_channels, 4, 2, 1, True),
            ("relu",),
            ("conv", self.out_channels, self.outconv_kernel, 1,
             self.outconv_kernel // 2, True),
        )

    @nn.compact
    def __call__(self, x, train=False):
        return Seq(self.spec(), name="outerblock")(x, train)


class InconvP2pUNet(nn.Module):
    """P2pUNet with a 1x1 conv stem."""
    in_channels: int = 3
    out_channels: int = 3
    nested_levels: int = 7

    def spec(self):
        conv_kwargs = (4, 2, 1, True)
        blocks = [(64, 128), (128, 256), (256, 512)][:self.nested_levels]
        blocks += [(512, 512)] * (self.nested_levels - len(blocks))
        inner = None
        for cin, cout in reversed(blocks):
            inner = _p2p_skip_spec(inner, cin, cout, conv_kwargs,
                                   batchnorm=False, dropout=0.0)
        return (
            ("conv", 64, 1, 1, 0, True), ("lrelu", 0.2),
            ("conv", 64, 4, 2, 1, True), ("lrelu", 0.2),
            ("skip", inner),
            ("convT", self.out_channels, 4, 2, 1, True),
            ("tanh",),
        )

    @nn.compact
    def __call__(self, x, train=False):
        return Seq(self.spec(), name="outerblock")(x, train)


class AlignedP2pUNet(nn.Module):
    """Stride-1 3x3 stem/head around the pix2pix core."""
    in_channels: int = 3
    out_channels: int = 3
    nested_levels: int = 7

    def spec(self):
        conv_kwargs = (4, 2, 1, True)
        blocks = [(64, 128), (128, 256), (256, 512)][:self.nested_levels]
        blocks += [(512, 512)] * (self.nested_levels - len(blocks))
        inner = None
        for cin, cout in reversed(blocks):
            inner = _p2p_skip_spec(inner, cin, cout, conv_kwargs,
                                   batchnorm=False, dropout=0.0)
        return (
            ("conv", 64, 3, 1, 1, True), ("relu",),
            ("conv", 64, 3, 1, 1, True), ("relu",),
            ("skip", inner),
            ("conv", 64, 3, 1, 1, True), ("relu",),
            ("conv", 64, 3, 1, 1, True), ("relu",),
            ("conv", self.out_channels, 3, 1, 1, True),
        )

    @nn.compact
    def __call__(self, x, train=False):
        return Seq(self.spec(), name="outerblock")(x, train)


class DynSkipBlock(nn.Module):
    """Resize-convolution skip block: down -> interpolate-to-input -> up -> cat."""
    down_spec: Tuple[Any, ...]
    up_spec: Tuple[Any, ...]
    upsample: str = "bilinear"

    @nn.compact
    def __call__(self, x, train=False):
        size = x.shape[-3:-1]
        y = Seq(self.down_spec, name="down")(x, train)
        import jax
        y = jax.image.resize(
            y, y.shape[:-3] + tuple(size) + y.shape[-1:],
            method="linear" if self.upsample == "bilinear" else self.upsample)
        y = Seq(self.up_spec, name="up")(y, train)
        return jnp.concatenate([x, y], axis=-1)


class OutconvP2pUNetDynamicInterpolate(nn.Module):
    """Resize-convolution upsampling to the exact input size.

    Structure AND naming mirror the reference torch module (unet.py:208-280):
    ``down`` = Sequential(conv, LeakyReLU, SkipConnBlock) with each
    SkipConnBlock carrying its own ``down``/``up`` Sequentials (nested block
    appended to ``down``), ``up`` = Sequential(conv, ReLU, conv) — so torch
    state_dict keys like ``down.2.down.2.up.0.weight`` import by direct
    name mapping, exactly like the other P2pUNet variants.
    """
    in_channels: int = 3
    out_channels: int = 3
    nested_levels: int = 7
    upsample: str = "bilinear"
    outconv_channels: int = 32
    outconv_kernel: int = 3
    dropout: float = 0.0
    batchnorm: bool = False

    def _inner_spec(self):
        assert self.outconv_kernel % 2 == 1
        blocks = [(64, 128), (128, 256), (256, 512)][:self.nested_levels]
        blocks += [(512, 512)] * (self.nested_levels - len(blocks))

        def make_block(nested, outer_ch, inter_ch):
            down = [("conv", inter_ch, 4, 2, 1, True)]
            if self.batchnorm:
                down.append(("bn",))
            down.append(("lrelu", 0.2))
            if nested is not None:
                down.append(nested)  # the ("dyn", ...) item, torch-indexed
            up = [("conv", outer_ch, 3, 1, 1, True)]
            if self.batchnorm:
                up.append(("bn",))
            if self.dropout:
                up.append(("dropout", self.dropout))
            up.append(("relu",))
            return ("dyn", tuple(down), tuple(up), self.upsample)

        inner = None
        for cin, cout in reversed(blocks):
            inner = make_block(inner, cin, cout)
        return inner

    @nn.compact
    def __call__(self, x, train=False):
        import jax

        size = x.shape[-3:-1]
        x = Seq((("conv", 64, 4, 2, 1, True), ("lrelu", 0.2),
                 self._inner_spec()), name="down")(x, train)
        x = jax.image.resize(
            x, x.shape[:-3] + tuple(size) + x.shape[-1:],
            method="linear" if self.upsample == "bilinear" else self.upsample)
        return Seq((("conv", self.outconv_channels, 3, 1, 1, True),
                    ("relu",),
                    ("conv", self.out_channels, self.outconv_kernel, 1,
                     self.outconv_kernel // 2, True)), name="up")(x, train)


class OrigConvBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = relu(Conv(self.features, 3, 1, 1, name="conv1")(x))
        return relu(Conv(self.features, 3, 1, 1, name="conv2")(x))


class OrigSkipBlock(nn.Module):
    """SkipConnBlock: downconv / pool / nested / convT / upconv(cat).

    Child names mirror the reference attribute names (downconv, nested, convT,
    upconv) so torch checkpoints map directly.
    """
    level: int
    nested_levels: int
    min_channels: int

    @nn.compact
    def __call__(self, x, train=False):
        channels = self.min_channels * 2 ** self.level
        x1 = OrigConvBlock(channels, name="downconv")(x)
        y = max_pool(x1, 2, 2)
        if self.level + 1 == self.nested_levels:
            y = OrigConvBlock(channels * 2, name="nested")(y)
        else:
            y = OrigSkipBlock(self.level + 1, self.nested_levels,
                              self.min_channels, name="nested")(y, train)
        y = ConvTranspose(channels, 2, 2, 0, name="convT")(y)
        return OrigConvBlock(channels, name="upconv")(
            jnp.concatenate([x1, y], axis=-1))


class OrigUNet(nn.Module):
    """Classic U-Net: conv-conv/maxpool encoder, convT decoder, skip concat."""
    in_channels: int = 3
    out_channels: int = 3
    nested_levels: int = 4
    min_channels: int = 64

    @nn.compact
    def __call__(self, x, train=False):
        y = OrigSkipBlock(0, self.nested_levels, self.min_channels,
                          name="outerblock")(x, train)
        return Conv(self.out_channels, 1, 1, 0, name="outconv")(y)
