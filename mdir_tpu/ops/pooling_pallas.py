"""Pallas TPU kernel: fused masked GeM pooling + L2 normalization.

The descriptor head's hot op: (N, H, W, C) features -> (N, C) L2-normalized
GeM descriptors with per-image valid extents. One pass over HBM: spatial
tiles stream through VMEM accumulating sum(clamp(x, eps)^p * mask) and the
valid-cell count, then the final tile applies mean -> ^(1/p) -> x/(||x||+eps)
in-register — XLA would materialize the pooled intermediate between these
stages; here the feature map is read exactly once.

Numerics match ``ops.pooling.gem`` + ``l2n`` (tested); used automatically by
``fused_gem_l2n`` on TPU backends, with the jnp composition as fallback.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import pooling as pool_ops


def _gem_kernel(valid_ref, p_ref, x_ref, out_ref, acc_ref, cnt_ref, *,
                eps, h_tiles):
    """Grid: (N, h_tiles). Accumulates over spatial tiles of one image.
    valid_ref/p_ref are scalar-prefetch SMEM arrays."""
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        cnt_ref[0, 0] = 0.0

    x = x_ref[0]  # (TH, W, C)
    th, w = x.shape[0], x.shape[1]
    p = p_ref[0]
    vh = valid_ref[i, 0]
    vw = valid_ref[i, 1]

    rows = jax.lax.broadcasted_iota(jnp.int32, (th, w), 0) + t * th
    cols = jax.lax.broadcasted_iota(jnp.int32, (th, w), 1)
    mask = ((rows < vh) & (cols < vw)).astype(x.dtype)

    powed = jnp.clip(x, min=eps) ** p * mask[..., None]
    acc_ref[...] += jnp.sum(powed, axis=(0, 1))[None]
    cnt_ref[0, 0] = cnt_ref[0, 0] + jnp.sum(mask)

    @pl.when(t == h_tiles - 1)
    def _finalize():
        count = jnp.maximum(cnt_ref[0, 0], 1.0)
        pooled = (acc_ref[0] / count) ** (1.0 / p)
        norm = jnp.sqrt(jnp.sum(pooled * pooled))
        out_ref[i] = pooled / (norm + eps)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def gem_l2n_pallas(x, valid_hw, p, eps=1e-6, interpret=False):
    """x: (N, H, W, C), valid_hw: (N, 2) int32, p scalar -> (N, C)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, c = x.shape
    th = 8 if h % 8 == 0 else 1
    h_tiles = h // th

    p_arr = jnp.full((1,), p, x.dtype)
    kernel = functools.partial(_gem_kernel, eps=eps, h_tiles=h_tiles)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # valid_hw (N, 2) and p (1,)
        grid=(n, h_tiles),
        in_specs=[
            pl.BlockSpec((1, th, w, c), lambda i, t, *_: (i, t, 0, 0)),
        ],
        # full-array output block (each program writes its own row; TPU
        # grids execute sequentially, so revisiting the block is safe)
        out_specs=pl.BlockSpec((n, c), lambda i, t, *_: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((1, c), x.dtype),
            pltpu.SMEM((1, 1), x.dtype),
        ],
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, c), x.dtype),
        interpret=interpret,
    )(valid_hw.astype(jnp.int32), p_arr, x)


def fused_gem_l2n(x, valid_hw, p, eps=1e-6):
    """Masked GeM + L2N: Pallas on TPU, jnp composition elsewhere."""
    if jax.default_backend() == "tpu":
        try:
            return gem_l2n_pallas(x, valid_hw, p, eps=eps)
        except Exception:
            pass
    from ..models.trunks import feature_mask

    mask = feature_mask(x.shape[-3:-1], valid_hw, dtype=x.dtype)
    return pool_ops.l2n(pool_ops.gem(x, p=p, eps=eps, mask=mask))
