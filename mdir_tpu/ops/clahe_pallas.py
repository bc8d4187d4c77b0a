"""Pallas TPU kernels for CLAHE (cv2-exact semantics, see ops/clahe.py).

Two kernels cover both stages:

* ``_interp_kernel`` — the per-pixel half: every pixel reads its value under
  the 4 neighboring tile LUTs and blends bilinearly. Gathers are hostile to
  the VPU, so the lookup is an MXU matmul: a row's pixels one-hot over 256
  values multiply the stacked (256, T) LUT table, and the 4-neighbor blend
  becomes iota-derived weight maps (float32, round-half-even like cv2).
* ``_lut_kernel`` — per-tile clipped histograms: counts via one-hot row
  contractions, cv2's uniform + strided-residual redistribution, and a
  cumsum expressed as a lower-triangular (256, 256) matmul (Mosaic has no
  cumsum primitive; one MXU tile regardless).

``clahe_u8_pallas`` uses the Pallas interp with XLA LUTs (fastest on-device
combination); ``clahe_u8_pallas_full`` runs both stages as Pallas kernels.
Both match the cv2-bit-exact reference within FMA rounding on real TPUs and
exactly in interpret mode. The native C host kernel (csrc/) remains the
fastest CLAHE overall; these exist for in-graph preprocessing.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

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


def _lut_kernel(img_ref, out_ref, *, th, tw, clim, scale_f32):
    """Grid: (gh*gw,). One tile's clipped histogram -> 256-entry LUT.

    The histogram is an MXU matmul: each tile row one-hots over 256 values
    and a ones-vector contraction accumulates counts (no scatters). Clip,
    uniform + strided-residual redistribution, cumsum and round-half-even
    follow the cv2 algorithm exactly (see ops/clahe.py).
    """
    from jax.experimental import pallas as pl

    bins = jax.lax.broadcasted_iota(jnp.int32, (tw, 256), 1)

    def row_body(i, hist):
        row = img_ref[0, pl.ds(i, 1), :]  # (1, tw); ref-indexed (Mosaic
        # supports dynamic slices on refs, not on loaded values)
        onehot = (row[0, :][:, None] == bins).astype(jnp.float32)  # (tw, 256)
        return hist + jnp.sum(onehot, axis=0)

    hist = jax.lax.fori_loop(0, th, row_body,
                             jnp.zeros((256,), jnp.float32))

    # clip + redistribute (cv2: uniform batch + strided residual)
    clipped = jnp.sum(jnp.maximum(hist - clim, 0.0))
    hist = jnp.minimum(hist, float(clim))
    batch = jnp.floor(clipped / 256.0)
    residual = clipped - batch * 256.0
    hist = hist + batch
    idx = jax.lax.broadcasted_iota(jnp.int32, (256, 1), 0)[:, 0]
    res_i = residual.astype(jnp.int32)
    step = jnp.maximum(256 // jnp.maximum(res_i, 1), 1)
    on_stride = (idx % step) == 0
    nth = idx // step
    hist = hist + jnp.where((res_i > 0) & on_stride & (nth < res_i), 1.0, 0.0)

    # cumsum as a lower-triangular matmul (Mosaic lacks a cumsum primitive;
    # a (256, 256) triangular contraction is one MXU tile anyway)
    rows = jax.lax.broadcasted_iota(jnp.int32, (256, 256), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (256, 256), 1)
    tri = (cols <= rows).astype(jnp.float32)
    cdf = jnp.dot(tri, hist, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    lut = jnp.clip(jnp.round((cdf * scale_f32).astype(jnp.float32)), 0, 255)
    out_ref[pl.program_id(0), :] = lut


@functools.partial(jax.jit, static_argnames=("clip_limit", "grid", "interpret"))
def tile_luts_pallas(padded_u8, clip_limit=4.0, grid=(8, 8), interpret=False):
    """All tile LUTs of a grid-divisible uint8 image: (gh*gw, 256) float32."""
    from jax.experimental import pallas as pl

    gh, gw = grid
    ph, pw = padded_u8.shape
    th, tw = ph // gh, pw // gw
    tile_area = th * tw
    clim = max(int(clip_limit * tile_area / 256), 1)
    scale = np.float32(255.0) / np.float32(tile_area)

    kernel = functools.partial(_lut_kernel, th=th, tw=tw, clim=clim,
                               scale_f32=scale)
    return pl.pallas_call(
        kernel,
        grid=(gh * gw,),
        in_specs=[
            pl.BlockSpec((1, th, tw),
                         lambda t: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((gh * gw, 256), lambda t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((gh * gw, 256), jnp.float32),
        interpret=interpret,
    )(padded_u8.astype(jnp.int32).reshape(gh, th, gw, tw)
      .transpose(0, 2, 1, 3).reshape(gh * gw, th, tw))


@functools.partial(jax.jit, static_argnames=("clip_limit", "grid", "interpret"))
def clahe_u8_pallas_full(src, clip_limit=4.0, grid=(8, 8), interpret=False):
    """CLAHE with BOTH stages as Pallas kernels (LUT build + interpolation)."""
    from jax.experimental import pallas as pl

    gh, gw = grid
    h, w = src.shape
    padded = _reflect101_pad_jax(src, grid)
    th, tw = padded.shape[0] // gh, padded.shape[1] // gw
    luts = tile_luts_pallas(padded, clip_limit=clip_limit, grid=grid,
                            interpret=interpret)

    rows_per_block = 8 if h % 8 == 0 else h
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
    )(src.astype(jnp.int32), luts)
    return out.astype(jnp.uint8)


def _interp_dyn_kernel(scal_ref, img_ref, luts_ref, out_ref, *, gh, gw,
                       rows_per_block):
    """Bucketed-variant interpolation: per-image tile sizes arrive as
    scalar-prefetch reciprocals (inv_th, inv_tw), per-image LUTs as a block.
    Grid: (B, row_blocks). Same MXU formulation as ``_interp_kernel``."""
    from jax.experimental import pallas as pl

    b = pl.program_id(0)
    t = pl.program_id(1)
    img = img_ref[0]  # (R, W) int32 pixel values
    r, w = img.shape
    luts_t = luts_ref[0].T  # (256, T)
    n_tiles = gh * gw
    inv_th = scal_ref[b, 0]
    inv_tw = scal_ref[b, 1]

    # per-column quantities (shared by all rows of this image)
    x_abs = jax.lax.broadcasted_iota(jnp.int32, (w, n_tiles), 0)
    gj_t = jax.lax.broadcasted_iota(jnp.int32, (w, n_tiles), 1) % gw
    gi_t = jax.lax.broadcasted_iota(jnp.int32, (w, n_tiles), 1) // gw
    txf = x_abs.astype(jnp.float32) * inv_tw - jnp.float32(0.5)
    tx1 = jnp.floor(txf).astype(jnp.int32)
    xa = txf - tx1.astype(jnp.float32)
    tx2 = jnp.clip(tx1 + 1, 0, gw - 1)
    tx1 = jnp.clip(tx1, 0, gw - 1)
    wcol = (gj_t == tx1).astype(jnp.float32) * (1.0 - xa) \
        + (gj_t == tx2).astype(jnp.float32) * xa  # (W, T)

    bins = jax.lax.broadcasted_iota(jnp.int32, (w, 256), 1)

    for i in range(rows_per_block):
        y = t * rows_per_block + i
        tyf = y.astype(jnp.float32) * inv_th - jnp.float32(0.5)
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
        out_ref[0, i, :] = jnp.clip(jnp.round(res), 0, 255)


@functools.partial(jax.jit, static_argnames=("grid", "interpret"))
def clahe_interp_bucketed_pallas(batch_vals, luts, inv_th, inv_tw,
                                 grid=(8, 8), interpret=False):
    """Tile-LUT interpolation for a padded bucket as one Pallas kernel.

    batch_vals (B, BH, BW) int32 u8-values, luts (B, T, 256) f32, inv_th/
    inv_tw (B,) f32 host-computed reciprocals -> (B, BH, BW) f32 u8-values.
    Within FMA rounding of the XLA contraction path (which is cv2-bit-exact);
    exact in interpret mode.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    gh, gw = grid
    b, bh, bw = batch_vals.shape
    rows_per_block = 8 if bh % 8 == 0 else 1
    n_blocks = bh // rows_per_block

    scalars = jnp.stack([inv_th, inv_tw], axis=1)  # (B, 2)
    kernel = functools.partial(_interp_dyn_kernel, gh=gh, gw=gw,
                               rows_per_block=rows_per_block)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec((1, rows_per_block, bw), lambda i, t, *_: (i, t, 0)),
            pl.BlockSpec((1, gh * gw, 256), lambda i, t, *_: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows_per_block, bw),
                               lambda i, t, *_: (i, t, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, bh, bw), jnp.float32),
        interpret=interpret,
    )(scalars, batch_vals, luts)
