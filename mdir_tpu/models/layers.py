"""NHWC flax layers with torch-compatible numerics.

These exist so that weights imported from the reference's torch checkpoints
(``models/torch_import.py``) reproduce the reference forward bit-for-bit
(up to float accumulation): explicit torch-style padding, floor-mode pooling,
frozen-vs-batch BatchNorm, and a ConvTranspose matching
``torch.nn.ConvTranspose2d`` geometry.
"""
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


class Conv(nn.Module):
    """2D convolution, torch Conv2d semantics (explicit symmetric padding)."""
    features: int
    kernel_size: Union[int, Tuple[int, int]]
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        k = _pair(self.kernel_size)
        s = _pair(self.stride)
        p = _pair(self.padding)
        return nn.Conv(
            features=self.features, kernel_size=k, strides=s,
            padding=(p, p) if isinstance(p, int) else ((p[0], p[0]), (p[1], p[1])),
            use_bias=self.use_bias, dtype=self.dtype, name="conv")(x)


def max_pool(x, kernel_size, stride=None, padding=0):
    """torch MaxPool2d (floor mode). x: NHWC."""
    k = _pair(kernel_size)
    s = _pair(stride if stride is not None else kernel_size)
    p = _pair(padding)
    pads = ((0, 0), (p[0], p[0]), (p[1], p[1]), (0, 0))
    if p != (0, 0):
        x = jnp.pad(x, pads, constant_values=-jnp.inf)
    return nn.max_pool(x, window_shape=k, strides=s, padding="VALID")


def avg_pool(x, kernel_size, stride=None, padding=0):
    k = _pair(kernel_size)
    s = _pair(stride if stride is not None else kernel_size)
    assert _pair(padding) == (0, 0), "padding not needed by the model zoo"
    return nn.avg_pool(x, window_shape=k, strides=s, padding="VALID")


class BatchNorm(nn.Module):
    """BatchNorm with torch semantics.

    ``use_running_average=True`` freezes the running statistics (the
    CirNetwork training mode, reference ``network.py:399-408``); affine
    scale/bias stay trainable. With False, batch stats are used and running
    stats updated into the mutable 'batch_stats' collection.
    """
    use_running_average: bool = True
    momentum: float = 0.9  # torch momentum 0.1 == flax momentum 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=self.momentum, epsilon=self.epsilon, name="bn")(x)


class ConvTranspose(nn.Module):
    """2D transposed convolution matching torch.nn.ConvTranspose2d.

    torch geometry: out = (in-1)*stride - 2*padding + kernel.
    Implemented via lax.conv_transpose with transpose_kernel=True so a
    torch weight (in, out, kh, kw) transposed to (kh, kw, out, in) produces
    identical results.
    """
    features: int
    kernel_size: Union[int, Tuple[int, int]]
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k = _pair(self.kernel_size)
        s = _pair(self.stride)
        p = _pair(self.padding)
        in_features = x.shape[-1]
        # layout (kh, kw, in, out): a torch ConvTranspose2d weight
        # (in, out, kh, kw) maps via transpose(2, 3, 0, 1)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k[0], k[1], in_features, self.features))
        # torch padding p -> lax.conv_transpose explicit padding (k-1-p)
        pad = [(k[0] - 1 - p[0], k[0] - 1 - p[0]),
               (k[1] - 1 - p[1], k[1] - 1 - p[1])]
        y = jax.lax.conv_transpose(
            x, kernel, strides=s, padding=pad,
            dimension_numbers=("NHWC", "HWOI", "NHWC"),
            transpose_kernel=True)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y


class Dense(nn.Module):
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.features, use_bias=self.use_bias, name="dense")(x)


def relu(x):
    return jax.nn.relu(x)


def leaky_relu(x, negative_slope=0.2):
    return jax.nn.leaky_relu(x, negative_slope=negative_slope)
