"""Pallas TPU kernel: CLAHE bilinear LUT interpolation.

The per-pixel half of CLAHE (`ops/clahe.py` semantics, cv2-bit-exact): every
pixel reads its value from the 4 neighboring tile LUTs and blends them with
bilinear weights. Gathers are hostile to the VPU, so the kernel reformulates
the lookup as an MXU matmul: a row-block's pixels one-hot over 256 values
multiply the stacked (256, T) LUT table, giving each pixel its value under
*every* tile's LUT at once; the 4-neighbor blend then becomes two weighted
reductions over the tile axes with weights computed from iota (exact float32
arithmetic, round-half-even like cv2). Tile LUT construction (64 tiny clipped
histograms) stays in XLA where it is already one fused one-hot reduction.
"""
import functools

import jax
import jax.numpy as jnp

from .clahe import _reflect101_pad_jax, _tile_luts_jax


def _interp_kernel(img_ref, luts_ref, out_ref, *, th, tw, gh, gw, rows_per_block):
    """Row-wise: all pixels in a row share (ty1, ty2, ya), so the 4-neighbor
    blend collapses to one (W, T) weight map; everything stays 2D (Mosaic
    rejects flattening reshapes)."""
    from jax.experimental import pallas as pl

    blk = pl.program_id(0)
    img = img_ref[...]  # (R, W) int32 pixel values
    r, w = img.shape
    luts_t = luts_ref[...].T  # (256, T)
    n_tiles = gh * gw

    # per-column quantities (shared by all rows)
    x_abs = jax.lax.broadcasted_iota(jnp.int32, (w, n_tiles), 0)
    gj_t = jax.lax.broadcasted_iota(jnp.int32, (w, n_tiles), 1) % gw
    gi_t = jax.lax.broadcasted_iota(jnp.int32, (w, n_tiles), 1) // gw
    txf = x_abs.astype(jnp.float32) * jnp.float32(1.0 / tw) - jnp.float32(0.5)
    tx1 = jnp.floor(txf).astype(jnp.int32)
    xa = txf - tx1.astype(jnp.float32)
    tx2 = jnp.clip(tx1 + 1, 0, gw - 1)
    tx1 = jnp.clip(tx1, 0, gw - 1)
    wcol = (gj_t == tx1).astype(jnp.float32) * (1.0 - xa) \
        + (gj_t == tx2).astype(jnp.float32) * xa  # (W, T)

    bins = jax.lax.broadcasted_iota(jnp.int32, (w, 256), 1)

    for i in range(r):
        y = blk * rows_per_block + i
        tyf = jnp.float32(y) * jnp.float32(1.0 / th) - jnp.float32(0.5)
        ty1 = jnp.floor(tyf).astype(jnp.int32)
        ya = tyf - ty1.astype(jnp.float32)
        ty2 = jnp.clip(ty1 + 1, 0, gh - 1)
        ty1 = jnp.clip(ty1, 0, gh - 1)
        wrow = (gi_t == ty1).astype(jnp.float32) * (1.0 - ya) \
            + (gi_t == ty2).astype(jnp.float32) * ya  # (W, T)

        onehot = (img[i, :][:, None] == bins).astype(jnp.float32)  # (W, 256)
        per_tile = jnp.dot(onehot, luts_t,
                           preferred_element_type=jnp.float32)  # (W, T)
        res = jnp.sum(per_tile * (wrow * wcol), axis=1)  # (W,)
        # output f32 (uint8 blocks need 32-row tiles); caller casts
        out_ref[i, :] = jnp.clip(jnp.round(res), 0, 255)


@functools.partial(jax.jit, static_argnames=("clip_limit", "grid", "interpret"))
def clahe_u8_pallas(src, clip_limit=4.0, grid=(8, 8), interpret=False):
    """cv2-exact CLAHE on a uint8 (H, W) image; interp runs as a Pallas kernel."""
    from jax.experimental import pallas as pl

    gh, gw = grid
    h, w = src.shape
    padded = _reflect101_pad_jax(src, grid)
    th, tw = padded.shape[0] // gh, padded.shape[1] // gw
    luts = _tile_luts_jax(padded, grid, clip_limit).reshape(gh * gw, 256)

    rows_per_block = 8 if h % 8 == 0 else h  # odd heights: one full block
    n_blocks = h // rows_per_block

    kernel = functools.partial(_interp_kernel, th=th, tw=tw, gh=gh, gw=gw,
                               rows_per_block=rows_per_block)
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((rows_per_block, w), lambda b: (b, 0)),
            pl.BlockSpec((gh * gw, 256), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rows_per_block, w), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        interpret=interpret,
    )(src.astype(jnp.int32), luts.astype(jnp.float32))
    return out.astype(jnp.uint8)


def clahe_channel_pallas(chan, clip_limit=4.0, grid=(8, 8), interpret=False):
    """Float [0,1] channel in/out (reference ``ChannelClahe.apply``)."""
    u8 = (chan * 255.0).astype(jnp.uint8)
    return clahe_u8_pallas(u8, clip_limit=clip_limit, grid=grid,
                           interpret=interpret).astype(jnp.float32) / 255.0
