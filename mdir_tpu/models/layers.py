"""NHWC flax layers with torch-compatible numerics.

These exist so that weights imported from the reference's torch checkpoints
(``models/torch_import.py``) reproduce the reference forward bit-for-bit
(up to float accumulation): explicit torch-style padding, floor-mode pooling,
frozen-vs-batch BatchNorm, and a ConvTranspose matching
``torch.nn.ConvTranspose2d`` geometry.
"""
import os
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

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


def _phase_taps(k, p):
    """Sub-pixel tap indices for stride-2 transposed conv.

    Output row y = 2m + r receives taps w[kh] from input rows
    x = (y + p - kh) / 2 over kh of parity (r + p) mod 2; returned per
    phase r as kernel-tap indices in ascending-x order.
    """
    if (k, p) == (4, 1):
        return {0: [3, 1], 1: [2, 0]}
    if (k, p) == (2, 0):
        return {0: [0], 1: [1]}
    return None


def _phase_conv_transpose(x, kernel, k, p):
    """Stride-2 ConvTranspose2d as 4 sub-pixel phase convolutions.

    Mathematically identical to the zero-insertion view: each phase is a
    dense (k/2)² conv at input resolution whose outputs interleave into
    the upsampled grid. Exact up to FMA reassociation (bit-exact for
    k=2); pinned vs lax.conv_transpose by tests/test_models.py. On TPU
    this is NOT a win (see ``_phase_convt_enabled``) — XLA's lowering
    already skips zero taps and the output interleave is the bottleneck.
    """
    taps = _phase_taps(k, p)
    B, H, W, _ = x.shape
    half = k // 2
    if half > 1:
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    else:
        xp = x
    phases = []
    for r in (0, 1):
        row = []
        for c in (0, 1):
            wp = kernel[np.ix_(taps[r], taps[c])]
            if half > 1:
                sl = jax.lax.slice(xp, (0, r, c, 0),
                                   (B, r + H + half - 1, c + W + half - 1,
                                    xp.shape[3]))
            else:
                sl = xp
            y = jax.lax.conv_general_dilated(
                sl, wp, window_strides=(1, 1), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            row.append(y)
        phases.append(row)
    y = jnp.stack([jnp.stack(row) for row in phases])  # (2, 2, B, H, W, F)
    y = y.transpose(2, 3, 0, 4, 1, 5)
    return y.reshape(B, 2 * H, 2 * W, y.shape[-1])


def _phase_convt_enabled():
    # Probed on-chip and REJECTED as a default (round 5): XLA's TPU
    # conv_transpose lowering already executes only useful taps (cost
    # analysis reports identical flops for both paths), and the sub-pixel
    # output interleave (6D transpose) lowers to a pathological Mosaic
    # shuffle — 29,070 ms vs 55 ms per (8,512,768,3) P2pUNet forward.
    # Kept as an opt-in alternative, pinned equal by tests.
    return os.environ.get("MDIR_TPU_CONVT_PHASE", "0") == "1"


class ConvTranspose(nn.Module):
    """2D transposed convolution matching torch.nn.ConvTranspose2d.

    torch geometry: out = (in-1)*stride - 2*padding + kernel.
    Implemented via lax.conv_transpose with transpose_kernel=True so a
    torch weight (in, out, kh, kw) transposed to (kh, kw, out, in) produces
    identical results. The model zoo's stride-2 geometries (k=4,p=1 in the
    pix2pix family; k=2,p=0 in OrigUNet) can opt into the sub-pixel phase
    decomposition (``MDIR_TPU_CONVT_PHASE=1``): same math, but measured
    far slower on TPU (see ``_phase_convt_enabled``) — default off.
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
        if (s == (2, 2) and k[0] == k[1] and p[0] == p[1]
                and _phase_taps(k[0], p[0]) is not None
                and _phase_convt_enabled()):
            y = _phase_conv_transpose(x, kernel, k[0], p[0])
        else:
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
