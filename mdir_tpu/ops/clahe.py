"""CLAHE (contrast-limited adaptive histogram equalization), cv2-exact.

The paper's core illumination normalization (reference
``mdir/components/data/transform/functional.py:109-129`` wraps
``cv2.createCLAHE``). Semantics replicated bit-exactly (verified by tests
against cv2 across shapes/clip limits):

1. pad image to a multiple of the tile grid with BORDER_REFLECT_101 when any
   dim is non-divisible (cv2 pads *both* dims by ``tiles - size % tiles``);
2. per-tile 256-bin histogram; clip at ``max(int(clip*area/256), 1)``;
   redistribute the excess uniformly plus a strided residual pass;
3. LUT = round(cdf * 255/area) (round-half-even, float32);
4. per-pixel bilinear interpolation between the 4 neighboring tile LUTs with
   grid coordinates ``x/tile_w - 0.5`` (float32 arithmetic, round-half-even).

``clahe_u8_np`` is the exact host implementation; ``clahe_channel_jax`` is the
same algorithm expressed as one fused JAX program (static shapes, vmap/jit
compatible) for the on-device preprocessing path. The channel-level entry
points replicate ``ChannelClahe.apply``: ``(chan*255).astype(uint8)`` (i.e.
truncation) -> CLAHE -> ``/255``.
"""
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

HIST_SIZE = 256


def _pad_reflect101(img, grid):
    gh, gw = grid
    h, w = img.shape[:2]
    if h % gh == 0 and w % gw == 0:
        return img
    ph, pw = gh - h % gh, gw - w % gw
    return np.pad(img, ((0, ph), (0, pw)), mode="reflect")


def _clip_limit_int(clip_limit, tile_area):
    return max(int(clip_limit * tile_area / HIST_SIZE), 1)


def _redistribute_np(hist, clim):
    clipped = int(np.sum(np.maximum(hist - clim, 0)))
    hist = np.minimum(hist, clim)
    batch, residual = divmod(clipped, HIST_SIZE)
    hist += batch
    if residual:
        step = max(HIST_SIZE // residual, 1)
        hist[np.arange(0, residual * step, step)[:residual]] += 1
    return hist


try:  # native C extension (csrc/clahe_native.c), built via csrc/setup.py
    import _mdir_native
except ImportError:
    _mdir_native = None


def clahe_u8_native(src, clip_limit=4.0, grid=(8, 8)):
    """Native-C CLAHE (bit-exact with clahe_u8_np); None if not built."""
    if _mdir_native is None:
        return None
    src = np.ascontiguousarray(src)
    out = _mdir_native.clahe_u8(src.tobytes(), src.shape[0], src.shape[1],
                                float(clip_limit), int(grid[0]), int(grid[1]))
    return np.frombuffer(out, np.uint8).reshape(src.shape)


def clahe_u8_np(src, clip_limit=4.0, grid=(8, 8)):
    """cv2-exact CLAHE on a uint8 image (native C when built, numpy else)."""
    assert src.dtype == np.uint8 and src.ndim == 2
    if _mdir_native is not None:
        return clahe_u8_native(src, clip_limit, grid)
    return _clahe_u8_numpy(src, clip_limit, grid)


def _clahe_u8_numpy(src, clip_limit=4.0, grid=(8, 8)):
    """Pure-numpy host reference."""
    assert src.dtype == np.uint8 and src.ndim == 2
    gh, gw = grid
    h, w = src.shape
    padded = _pad_reflect101(src, grid)
    th, tw = padded.shape[0] // gh, padded.shape[1] // gw
    tile_area = th * tw
    clim = _clip_limit_int(clip_limit, tile_area)
    scale = np.float32(255.0) / np.float32(tile_area)

    tiles = padded.reshape(gh, th, gw, tw).transpose(0, 2, 1, 3)
    luts = np.zeros((gh, gw, HIST_SIZE), np.uint8)
    for ty in range(gh):
        for tx in range(gw):
            hist = np.bincount(tiles[ty, tx].ravel(), minlength=HIST_SIZE)
            hist = _redistribute_np(hist.astype(np.int64), clim)
            cdf = np.cumsum(hist)
            luts[ty, tx] = np.clip(
                np.rint((cdf * scale).astype(np.float32)), 0, 255).astype(np.uint8)

    tyf = (np.arange(h, dtype=np.float32) * np.float32(1.0 / th)
           - np.float32(0.5)).astype(np.float32)
    txf = (np.arange(w, dtype=np.float32) * np.float32(1.0 / tw)
           - np.float32(0.5)).astype(np.float32)
    ty1 = np.floor(tyf).astype(int)
    tx1 = np.floor(txf).astype(int)
    ya = (tyf - ty1).astype(np.float32)[:, None]
    xa = (txf - tx1).astype(np.float32)[None, :]
    ty2 = np.clip(ty1 + 1, 0, gh - 1)
    tx2 = np.clip(tx1 + 1, 0, gw - 1)
    ty1 = np.clip(ty1, 0, gh - 1)
    tx1 = np.clip(tx1, 0, gw - 1)

    v11 = luts[ty1[:, None], tx1[None, :], src].astype(np.float32)
    v12 = luts[ty1[:, None], tx2[None, :], src].astype(np.float32)
    v21 = luts[ty2[:, None], tx1[None, :], src].astype(np.float32)
    v22 = luts[ty2[:, None], tx2[None, :], src].astype(np.float32)
    xa1 = np.float32(1.0) - xa
    ya1 = np.float32(1.0) - ya
    res = ((v11 * xa1 + v12 * xa) * ya1 + (v21 * xa1 + v22 * xa) * ya)
    return np.clip(np.rint(res.astype(np.float32)), 0, 255).astype(np.uint8)


def clahe_channel_np(chan, clip_limit=4.0, grid=(8, 8)):
    """Reference ``ChannelClahe.apply``: float [0,1] channel in and out."""
    u8 = (chan * 255).astype(np.uint8)
    return clahe_u8_np(u8, clip_limit, grid).astype(np.float32) / 255.0


# ---------------------------------------------------------------------------
# JAX implementation (same algorithm, fused & static-shaped)
# ---------------------------------------------------------------------------

def _residual_mask(residual):
    """Vectorized cv2 residual pass: +1 at indices {0, s, 2s, ...} (s=max(256//r,1)),
    limited to the first ``residual`` strided slots below 256."""
    idx = jnp.arange(HIST_SIZE)
    step = jnp.maximum(HIST_SIZE // jnp.maximum(residual, 1), 1)
    on_stride = (idx % step) == 0
    nth = idx // step  # which strided slot this index is
    return jnp.where((residual > 0) & on_stride & (nth < residual), 1, 0)


def _tile_luts_jax(padded_u8, grid, clip_limit):
    """LUTs for all tiles: (gh, gw, 256) uint8."""
    gh, gw = grid
    ph, pw = padded_u8.shape
    th, tw = ph // gh, pw // gw
    tile_area = th * tw
    clim = _clip_limit_int(clip_limit, tile_area)

    tiles = padded_u8.reshape(gh, th, gw, tw).transpose(0, 2, 1, 3)
    tiles = tiles.reshape(gh * gw, tile_area)

    # Histogram per tile: one-hot accumulate. (T, A) -> (T, 256)
    onehot = jax.nn.one_hot(tiles, HIST_SIZE, dtype=jnp.int32)
    hist = onehot.sum(axis=1)

    clipped = jnp.sum(jnp.maximum(hist - clim, 0), axis=1)  # (T,)
    hist = jnp.minimum(hist, clim)
    batch = clipped // HIST_SIZE
    residual = clipped - batch * HIST_SIZE
    hist = hist + batch[:, None]
    hist = hist + jax.vmap(_residual_mask)(residual)

    cdf = jnp.cumsum(hist, axis=1)
    scale = jnp.float32(255.0) / jnp.float32(tile_area)
    luts = jnp.clip(jnp.round((cdf * scale).astype(jnp.float32)), 0, 255)
    return luts.astype(jnp.uint8).reshape(gh, gw, HIST_SIZE)


def _reflect101_pad_jax(img, grid):
    gh, gw = grid
    h, w = img.shape
    if h % gh == 0 and w % gw == 0:
        return img
    ph, pw = gh - h % gh, gw - w % gw
    return jnp.pad(img, ((0, ph), (0, pw)), mode="reflect")


@functools.partial(jax.jit, static_argnames=("clip_limit", "grid"))
def clahe_u8_jax(src, clip_limit=4.0, grid=(8, 8)):
    """cv2-exact CLAHE on a uint8 image, as a single JAX program."""
    gh, gw = grid
    h, w = src.shape
    padded = _reflect101_pad_jax(src, grid)
    th, tw = padded.shape[0] // gh, padded.shape[1] // gw
    luts = _tile_luts_jax(padded, grid, clip_limit)

    tyf = (jnp.arange(h, dtype=jnp.float32) * jnp.float32(1.0 / th)
           - jnp.float32(0.5))
    txf = (jnp.arange(w, dtype=jnp.float32) * jnp.float32(1.0 / tw)
           - jnp.float32(0.5))
    ty1 = jnp.floor(tyf).astype(jnp.int32)
    tx1 = jnp.floor(txf).astype(jnp.int32)
    ya = (tyf - ty1)[:, None]
    xa = (txf - tx1)[None, :]
    ty2 = jnp.clip(ty1 + 1, 0, gh - 1)
    tx2 = jnp.clip(tx1 + 1, 0, gw - 1)
    ty1 = jnp.clip(ty1, 0, gh - 1)
    tx1 = jnp.clip(tx1, 0, gw - 1)

    src_i = src.astype(jnp.int32)
    flat_luts = luts.reshape(gh * gw, HIST_SIZE)

    def gather(tyv, txv):
        tile_idx = (tyv[:, None] * gw + txv[None, :]).reshape(-1)
        vals = flat_luts[tile_idx, src_i.reshape(-1)]
        return vals.reshape(h, w).astype(jnp.float32)

    v11 = gather(ty1, tx1)
    v12 = gather(ty1, tx2)
    v21 = gather(ty2, tx1)
    v22 = gather(ty2, tx2)
    xa1 = 1.0 - xa
    ya1 = 1.0 - ya
    res = (v11 * xa1 + v12 * xa) * ya1 + (v21 * xa1 + v22 * xa) * ya
    return jnp.clip(jnp.round(res), 0, 255).astype(jnp.uint8)


def clahe_channel_jax(chan, clip_limit=4.0, grid=(8, 8)):
    """Float [0,1] channel in/out (reference ``ChannelClahe.apply``)."""
    u8 = (chan * 255.0).astype(jnp.uint8)  # truncation, as in the reference
    return clahe_u8_jax(u8, clip_limit=clip_limit, grid=grid).astype(jnp.float32) / 255.0


# ---------------------------------------------------------------------------
# Bucketed (padded-batch) CLAHE with per-image valid extents
# ---------------------------------------------------------------------------
#
# The production extraction path batches differently-sized images into one
# padded bucket (parallel/extract.py). cv2's tile geometry depends on the
# *true* image size, so the static-shape kernels above do not apply. Here the
# cheap index math (reflect-101 padding indices, pixel->tile maps, per-image
# tile scalars) is computed on host per image, and the pixel work runs on
# device for the whole bucket: per-tile histograms as MXU one-hot
# contractions (scan-chunked so the one-hot never materializes at full
# resolution), cv2's clip/redistribute/cumsum LUT build with traced per-image
# scalars, and the 4-neighbor LUT interpolation. Junk values in the padded
# region never enter histograms (sentinel tiles) and the interpolated junk is
# masked downstream in normalized space.

def clahe_bucket_aux(shapes, bucket_hw, clip_limit=4.0, grid=(8, 8)):
    """Host-side per-image aux arrays for ``clahe_u8_bucketed_jax``.

    shapes: [(h, w)] per image; bucket_hw: padded (BH, BW) with
    ``grid | bucket``. Returns a dict of stacked numpy arrays.
    """
    gh, gw = grid
    bh, bw = bucket_hw
    assert bh % gh == 0 and bw % gw == 0, (bucket_hw, grid)
    n = len(shapes)
    # cv2 may pad a grid-divisible dim by a full tile, so the padded extent
    # can exceed the bucket by up to one tile along each axis
    aux = {
        "row_src": np.zeros((n, bh + gh), np.int32),
        "col_src": np.zeros((n, bw + gw), np.int32),
        "row_tile": np.full((n, bh + gh), gh, np.int32),
        "col_tile": np.full((n, bw + gw), gw, np.int32),
        "inv_th": np.zeros(n, np.float32),
        "inv_tw": np.zeros(n, np.float32),
        "clim": np.zeros(n, np.float32),
        "scale": np.zeros(n, np.float32),
    }

    def axis_maps(size, tiles, any_pad):
        # cv2 pads BOTH dims by ``tiles - size % tiles`` when either is
        # non-divisible, so a divisible dim gains a full extra tile
        padded = size if not any_pad else size + (tiles - size % tiles)
        tile = padded // tiles
        idx = np.arange(padded)
        src = np.where(idx < size, idx, 2 * size - 2 - idx)
        src = np.clip(src, 0, size - 1)  # degenerate tiny images
        return padded, tile, src, np.minimum(idx // tile, tiles - 1)

    for i, (h, w) in enumerate(shapes):
        any_pad = bool(h % gh or w % gw)
        ph, th, rsrc, rtile = axis_maps(h, gh, any_pad)
        pw, tw, csrc, ctile = axis_maps(w, gw, any_pad)
        aux["row_src"][i, :ph] = rsrc
        aux["row_tile"][i, :ph] = rtile
        aux["col_src"][i, :pw] = csrc
        aux["col_tile"][i, :pw] = ctile
        aux["inv_th"][i] = np.float32(1.0 / th)
        aux["inv_tw"][i] = np.float32(1.0 / tw)
        area = th * tw
        aux["clim"][i] = np.float32(_clip_limit_int(clip_limit, area))
        aux["scale"][i] = np.float32(255.0) / np.float32(area)
    return aux


def pack_clahe_aux(aux):
    """Pack the 8 per-chunk aux arrays into 2 (the host->device link
    charges per transfer): (B, RH+CW, 2) int32 indices + (B, 4) f32 scalars.
    """
    ints = np.stack([
        np.concatenate([aux["row_src"], aux["col_src"]], axis=1),
        np.concatenate([aux["row_tile"], aux["col_tile"]], axis=1),
    ], axis=-1).astype(np.int32)
    scalars = np.stack([aux["inv_th"], aux["inv_tw"], aux["clim"],
                        aux["scale"]], axis=-1).astype(np.float32)
    return ints, scalars


def unpack_clahe_aux(ints, scalars, bucket_hw, grid):
    """In-graph inverse of ``pack_clahe_aux`` (static bucket/grid shapes)."""
    gh, gw = grid
    rh = bucket_hw[0] + gh
    # a bucket/grid mismatch vs the pack_clahe_aux call would silently
    # mis-slice row maps into column maps — fail loudly instead
    assert ints.shape[1] == rh + bucket_hw[1] + gw, \
        (ints.shape, bucket_hw, grid)
    return {
        "row_src": ints[:, :rh, 0], "row_tile": ints[:, :rh, 1],
        "col_src": ints[:, rh:, 0], "col_tile": ints[:, rh:, 1],
        "inv_th": scalars[:, 0], "inv_tw": scalars[:, 1],
        "clim": scalars[:, 2], "scale": scalars[:, 3],
    }


def _hist_dynamic(padded, row_tile, col_tile, gh, gw, chunk=16):
    """Per-tile histograms with dynamic tile boundaries: (gh, gw, 256).

    One-hot contractions ride the MXU; scanning row chunks bounds the
    transient one-hot to (chunk, BW, 256). Sentinel tiles (index gh/gw)
    absorb the padded region and are dropped.
    """
    bh, bw = padded.shape
    # bf16 holds integers <= 256 exactly; a real (non-sentinel) column
    # tile spans at most ceil(bw/gw) + 1 pixels, so for the default 8x8
    # grid at <=2k widths the count operand is bf16-exact. Wider tiles
    # (small grids) keep the f32 + HIGHEST contraction instead. Static
    # branch: bw/gw are trace-time constants.
    # (CPU XLA lacks a bf16 x bf16 = f32 DotThunk at SOME shapes — observed
    # crashing for bucket sides 32-48, passing >= 64 — so on CPU EVERY
    # contraction in this file stays f32 + HIGHEST; tests force CPU and f32
    # is exact there, the bf16 fast path is accelerator-only)
    on_cpu = jax.default_backend() == "cpu"
    exact_bf16 = ((bw + gw) // gw + 1 <= 256) and not on_cpu
    onehot_dtype = jnp.float32 if on_cpu else jnp.bfloat16
    colhot = jax.nn.one_hot(col_tile, gw + 1, dtype=onehot_dtype)
    rowhot = jax.nn.one_hot(row_tile, gh + 1,
                            dtype=jnp.bfloat16 if exact_bf16 else jnp.float32)
    chunk = min(chunk, bh)
    while bh % chunk:
        chunk -= 1
    vals_c = padded.reshape(bh // chunk, chunk, bw)
    rowhot_c = rowhot.reshape(bh // chunk, chunk, gh + 1)

    def body(acc, xs):
        vals, rhot = xs
        onehot = jax.nn.one_hot(vals, HIST_SIZE, dtype=onehot_dtype)
        # exact by operand representability alone (no reliance on XLA
        # precision modes, which demote f32 operands to bf16 at some
        # shapes): both contractions are 0/1-weighted integer sums with
        # f32 accumulation. per_col_tile[r, t, b] counts pixels of one
        # image row inside one column tile — at most the tile width
        # (<= bucket_w/gw + pad < 256), so it is bf16-exact; the sentinel
        # column (index gw) can exceed 256 for narrow images in a wide
        # bucket, but that slice is dropped below before use.
        per_col_tile = jnp.einsum(
            "rwb,wt->rtb", onehot, colhot,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST if on_cpu else None)
        if exact_bf16:
            h = jnp.einsum("rtb,rg->gtb", per_col_tile.astype(jnp.bfloat16),
                           rhot, preferred_element_type=jnp.float32)
        else:
            h = jnp.einsum("rtb,rg->gtb", per_col_tile, rhot,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
        return acc + h, None

    hist, _ = jax.lax.scan(
        body, jnp.zeros((gh + 1, gw + 1, HIST_SIZE), jnp.float32),
        (vals_c, rowhot_c))
    return hist[:gh, :gw]


def _luts_dynamic(hist, clim, scale):
    """cv2 clip/redistribute/cumsum with traced per-image scalars; (T, 256)."""
    clipped = jnp.sum(jnp.maximum(hist - clim, 0.0), axis=1)
    hist = jnp.minimum(hist, clim)
    batch = jnp.floor(clipped / HIST_SIZE)
    residual = (clipped - batch * HIST_SIZE).astype(jnp.int32)
    hist = hist + batch[:, None]
    hist = hist + jax.vmap(_residual_mask)(residual)
    cdf = jnp.cumsum(hist, axis=1)
    return jnp.clip(jnp.round(cdf * scale), 0, 255)  # f32 u8-values


def _axis_tile_weights(n, inv_t, tiles):
    """Two (n, tiles) blend-weight maps along one axis — the lower and upper
    tile neighbors kept separate so border-clipped pixels (i1 == i2) still
    round like cv2's two-product sum (cv2 coordinates ``i/tile - 0.5``)."""
    f = jnp.arange(n, dtype=jnp.float32) * inv_t - jnp.float32(0.5)
    i1 = jnp.floor(f).astype(jnp.int32)
    alpha = (f - i1)[:, None]
    i2 = jnp.clip(i1 + 1, 0, tiles - 1)
    i1 = jnp.clip(i1, 0, tiles - 1)
    idx = jnp.arange(tiles)[None, :]
    return ((idx == i1[:, None]) * (1.0 - alpha),
            (idx == i2[:, None]) * alpha)


def _interp_dynamic(vals, luts, inv_th, inv_tw, gh, gw, chunk=16):
    """4-neighbor tile-LUT blend with traced tile sizes; f32 u8-values.

    Gathers are hostile on TPU (the naive 4-lookup blend costs ~60 ms/img
    at 768x1024), so each pixel's value is looked up in EVERY tile LUT with
    one well-shaped MXU contraction — (px, 256) one-hot @ (256, gh*gw) — and
    the 4-neighbor blend then runs on the selected (px, gh, gw) values as
    cheap VPU broadcasts. Selection commutes exactly with the per-bin blend
    (one nonzero product plus exact zeros per sum), so the result rounds
    bit-identically to cv2's per-pixel x-then-y formula.
    """
    bh, bw = vals.shape
    wy1, wy2 = _axis_tile_weights(bh, inv_th, gh)  # (BH, gh) each
    wx1, wx2 = _axis_tile_weights(bw, inv_tw, gw)  # (BW, gw) each
    # LUT entries are rounded integers in [0, 255] — bf16-exact (integers
    # <= 256 hold exactly in bf16's 8-bit mantissa), so the lookup matmul
    # can run as a pure bf16 MXU contraction with f32 accumulation instead
    # of a mixed bf16 x f32 one that XLA upcasts to a multi-pass f32 matmul.
    # CPU keeps f32 + HIGHEST (bf16 x bf16 = f32 DotThunk is missing at
    # sub-64 bucket sides there; see _hist_dynamic)
    on_cpu = jax.default_backend() == "cpu"
    luts = luts.astype(jnp.float32 if on_cpu else jnp.bfloat16)

    chunk = min(chunk, bh)
    while bh % chunk:
        chunk -= 1
    vals_c = vals.reshape(bh // chunk, chunk, bw)
    wy1_c = wy1.reshape(bh // chunk, chunk, gh)
    wy2_c = wy2.reshape(bh // chunk, chunk, gh)
    bins = jnp.arange(HIST_SIZE, dtype=jnp.int32)
    wx1_b = wx1[None, :, None, :]  # (1, BW, 1, gw)
    wx2_b = wx2[None, :, None, :]

    def body(_, xs):
        v, w1, w2 = xs
        onehot = (v[..., None] == bins).astype(luts.dtype)
        # every tile's LUT at this pixel's value: (chunk, BW, gh, gw)
        allt = jnp.einsum(
            "rxb,tb->rxt", onehot, luts,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST if on_cpu else None)
        allt = allt.reshape(*v.shape, gh, gw)
        # cv2 blends x first then y, each as (lo*w_lo + hi*w_hi)
        tmp = (allt * wx1_b).sum(-1) + (allt * wx2_b).sum(-1)  # (r, x, gh)
        return None, ((tmp * w1[:, None, :]).sum(-1)
                      + (tmp * w2[:, None, :]).sum(-1))

    _, res = jax.lax.scan(body, None, (vals_c, wy1_c, wy2_c))
    return jnp.clip(jnp.round(res.reshape(bh, bw)), 0, 255)


def clahe_u8_bucketed_jax(batch_vals, aux, grid=(8, 8)):
    """CLAHE over a padded bucket: (B, BH, BW) int32 u8-values -> f32 u8-values.

    ``aux`` comes from ``clahe_bucket_aux``; values outside each image's
    valid extent are garbage on output (mask downstream). The interpolation
    runs as the all-tile-lookup XLA contraction (``_interp_dynamic``, ~14
    ms/batch-of-8 at 768x1024 on v5e) — it beats the Pallas interp kernel
    (~47 ms, ±1 u8) that ``MDIR_TPU_PALLAS=1`` selected before the
    contraction rewrite, so that gate now only covers pooling."""
    gh, gw = grid

    # the vmap over the batch multiplies every scan-step transient by B:
    # the (chunk, BW, 256) one-hots must be sized so B x chunk x BW x 256
    # stays VMEM-resident instead of round-tripping HBM (same finding as
    # the trilinear-lab pair transient; 256 lanes x 8192 px x bf16 = 4 MB)
    target = int(os.environ.get("MDIR_TPU_CLAHE_CHUNK_PX", "8192"))
    n, _bh, bw = batch_vals.shape
    chunk = max(1, target // max(1, n * bw))  # both kernels re-fit to H

    def tile_luts(vals, row_src, col_src, row_tile, col_tile, clim, scale):
        padded = jnp.take(jnp.take(vals, row_src, axis=0), col_src, axis=1)
        hist = _hist_dynamic(padded, row_tile, col_tile, gh, gw, chunk=chunk)
        return _luts_dynamic(hist.reshape(gh * gw, HIST_SIZE), clim, scale)

    luts = jax.vmap(tile_luts)(batch_vals, aux["row_src"], aux["col_src"],
                               aux["row_tile"], aux["col_tile"], aux["clim"],
                               aux["scale"])

    return jax.vmap(lambda v, l, ith, itw: _interp_dynamic(
        v, l, ith, itw, gh, gw, chunk=chunk))(batch_vals, luts,
                                              aux["inv_th"], aux["inv_tw"])
