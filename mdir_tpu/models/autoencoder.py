"""Pixel-wise color mapper models (1x1-conv autoencoders).

Parity with ``mdir/components/model/network/autoencoder.py``: PixelConvRegr
(1x1 conv MLP + Tanh), PixelConvRes (residual to channels 0:2), and
AutoencoderRegr (first conv has a reception field).
"""
from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import Conv, relu


def _activation(name):
    if name == "relu":
        return relu
    if name == "tanh":
        return jnp.tanh
    raise KeyError(name)


class PixelConvRegr(nn.Module):
    in_channels: int = 3
    out_channels: int = 3
    hidden: Tuple[int, ...] = (16,)
    hidden_activation: str = "relu"

    @nn.compact
    def __call__(self, x, train=False):
        act = _activation(self.hidden_activation)
        idx = 0
        for features in self.hidden:
            x = act(Conv(features, 1, 1, 0, name="model_%d" % idx)(x))
            idx += 2
        x = Conv(self.out_channels, 1, 1, 0, name="model_%d" % idx)(x)
        return jnp.tanh(x)


class PixelConvRes(nn.Module):
    """Residual pixel mapper: model(x) + x[..., 0:2]."""
    in_channels: int = 3
    out_channels: int = 2
    hidden: Tuple[int, ...] = (16,)
    hidden_activation: str = "relu"

    @nn.compact
    def __call__(self, x, train=False):
        act = _activation(self.hidden_activation)
        idx = 0
        y = x
        for features in self.hidden:
            y = act(Conv(features, 1, 1, 0, name="model_%d" % idx)(y))
            idx += 2
        y = Conv(self.out_channels, 1, 1, 0, name="model_%d" % idx)(y)
        return jnp.tanh(y) + x[..., 0:2]


class AutoencoderRegr(nn.Module):
    in_channels: int = 3
    out_channels: int = 3
    hidden: Tuple[int, ...] = (16,)
    hidden_activation: str = "relu"
    reception_field: int = 3

    @nn.compact
    def __call__(self, x, train=False):
        assert self.reception_field % 2 == 1
        act = _activation(self.hidden_activation)
        x = act(Conv(self.hidden[0], self.reception_field, 1,
                     self.reception_field // 2, name="model_0")(x))
        idx = 2
        for features in self.hidden[1:]:
            x = act(Conv(features, 1, 1, 0, name="model_%d" % idx)(x))
            idx += 2
        x = Conv(self.out_channels, 1, 1, 0, name="model_%d" % idx)(x)
        return jnp.tanh(x)
