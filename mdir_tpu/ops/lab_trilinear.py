"""cv2-bit-exact LAB lightness (the CLAHE input plane) from uint8 RGB, on
device.

The reference's CLAHE transforms (``mdir/components/data/transform/
photometric_transforms.py:28-36``, ``functional.py:109-129``) feed cv2's
CLAHE with the u8-quantized L channel of cv2's RGB->LAB conversion. OpenCV's
float conversion (this environment: cv2 5.x) runs a fixed-point integer
pipeline, measured here empirically and verified EXHAUSTIVELY over all
256^3 RGB triples (zero mismatches):

    cx   = rint(f32(v / 255) * 16384)            per channel, LAB_BASE = 2^14
    tx   = cx >> 9,  w = (cx & 511) >> 5         corner + 4-bit frac weight
    blend = sum over the 8 corners of NODE[tx+dx, ty+dy, tz+dz]
            * wx * wy * wz                        (33^3 node LUT, w in [0,16])
    n    = (blend + 2048) >> 12                   L = n / 16384 * 100
    l_u8 = (n * 255) >> 14                        the host chain's u8 plane

Every quantity stays an exact small integer, so the device computation is
bit-identical to the host chain: the soft one-hot corner weights (<= 16) are
exact in bfloat16, the node table ships as hi/lo halves (< 2^7 each,
bf16-exact) packed into one (px, 1089) MXU contraction's output columns
whose integer results recombine exactly in f32, and the final descales are
exact power-of-two/int32 ops — no reliance on XLA precision modes, which
demote f32 operands to bf16 at some shapes. This removes the shipped 4th
uint8 plane from CLAHE-chain ingress (25% fewer bytes over the
host->device link, and one cv2.cvtColor less per image on the 1-core
host).

The a/b output channels live on the same fixed-point lattices
(chan = n/64 - 128, n in [0, 2^14]) and ride the SAME trilinear
contraction as extra hi/lo column pairs (198 columns total for all three
channels) — also verified exhaustively over all 256^3 triples — so the
whole forward RGB->lab conversion in device chains is bit-exact with the
host's cv2 call; only the inverse (lab->rgb after CLAHE) remains the
~1e-3 float path (cv2's LAB2RGB is genuine float math in this build:
probed non-lattice).

The production path is the W-chunked XLA scan (``lab_*_jax``): each
scan step contracts ~2048 pixels so the (px, 1089) pair operand stays
VMEM-sized — measured ~21 ms per batch-of-8 at 768x1024 on v5e vs the
v3 Mosaic kernel's ~24.5 ms, so XLA is the default and the Pallas kernel
(``_lab_v3_kernel``, same integer pipeline with the pair weights living
in VMEM) is opt-IN via ``MDIR_TPU_LAB_PALLAS=1``.
``lab_chan``/``lab_normspace``/``lab_l_u8`` dispatch accordingly; both
paths are bit-exact vs numpy on chip.

The 33^3 x 3 node lattice ships as ``_lab_nodes.npy`` (int16, 216 KB),
probed from cv2 at the grid inputs k/32 (exact fixed-point values); a cheap
sampled ``spot_check()`` against the live cv2 guards against OpenCV
algorithm drift — when it fails, callers fall back to shipping the
host-computed L plane and the float colorspace.
"""
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

_NODE_PATH = os.path.join(os.path.dirname(__file__), "_lab_nodes.npy")
LAB_BASE = 16384  # 2^14, cv2's fixed-point scale


def generate_node_lut(path=_NODE_PATH):
    """Probe cv2's RGB->LAB at the 33^3 trilinear grid nodes (needs cv2).

    All three output channels live on fixed-point lattices (L = n/2^14*100,
    a/b = n/64 - 128 with n in [0, 2^14]), so one (33, 33, 33, 3) int16
    table captures the whole conversion.
    """
    import cv2

    ks = np.arange(33, dtype=np.float64) / 32.0
    i, j, k = np.meshgrid(ks, ks, ks, indexing="ij")
    rgb = np.stack([i.ravel(), j.ravel(), k.ravel()], -1).astype(np.float32)
    lab = cv2.cvtColor(rgb[None], cv2.COLOR_RGB2LAB)[0].astype(np.float64)
    n = np.stack([lab[:, 0] / 100.0 * LAB_BASE,
                  (lab[:, 1] + 128.0) * 64.0,
                  (lab[:, 2] + 128.0) * 64.0], axis=-1)
    nodes = np.rint(n)
    if np.abs(n - nodes).max() > 1e-3:
        raise RuntimeError(
            "cv2's RGB2LAB output is not on the n/16384 fixed-point lattice; "
            "its algorithm changed — device L must ship from host")
    nodes = nodes.reshape(33, 33, 33, 3).astype(np.int16)
    np.save(path, nodes)
    return nodes


@functools.lru_cache(maxsize=1)
def _node_lut3():
    if os.path.exists(_NODE_PATH):
        return np.load(_NODE_PATH).astype(np.int32)
    return generate_node_lut().astype(np.int32)


def _node_lut():
    return _node_lut3()[..., 0]


@functools.lru_cache(maxsize=1)
def _u8_corner_tables():
    """Per-u8-value (tx, w) emulating cv2's f32 fixed-point quantization.

    v/255 rounds to f32 (correctly-rounded division), *16384 is exact
    (power of two), cvRound is round-half-to-even.
    """
    v32 = (np.arange(256, dtype=np.float32) / np.float32(255.0))
    cx = np.rint(v32.astype(np.float64) * LAB_BASE).astype(np.int64)
    return (cx >> 9).astype(np.int32), ((cx & 511) >> 5).astype(np.int32)


def _lab_n_np(rgb_u8):
    """Exact numpy trilinear: (..., 3) uint8 RGB -> (..., 3) int lattice n
    values (L_n in [0, 2^14]; a_n/b_n = (chan + 128) * 64)."""
    tx, w = _u8_corner_tables()
    node = _node_lut3().astype(np.int64)
    v = np.asarray(rgb_u8, np.int64)
    t = tx[v[..., 0]], tx[v[..., 1]], tx[v[..., 2]]
    f = w[v[..., 0]], w[v[..., 1]], w[v[..., 2]]
    acc = np.zeros(v.shape[:-1] + (3,), np.int64)
    for dx in (0, 1):
        wx = f[0] if dx else 16 - f[0]
        ix = np.minimum(t[0] + dx, 32)
        for dy in (0, 1):
            wy = f[1] if dy else 16 - f[1]
            iy = np.minimum(t[1] + dy, 32)
            for dz in (0, 1):
                wz = f[2] if dz else 16 - f[2]
                iz = np.minimum(t[2] + dz, 32)
                acc += node[ix, iy, iz] * (wx * wy * wz)[..., None]
    return (acc + 2048) >> 12


def lab_l_u8_np(rgb_u8):
    """Exact numpy replica: (..., 3) uint8 RGB -> (...) int32 l_u8 values."""
    return ((_lab_n_np(rgb_u8)[..., 0] * 255) >> 14).astype(np.int32)


def lab_chan_np(rgb_u8):
    """(..., 3) uint8 RGB -> (l_u8 int32, ab (..., 2) f32).

    ``l_u8`` is the u8-quantized CLAHE input plane; ``ab`` are the
    normalized a/b channels, bit-identical to the host chain's
    ``(cv2_a + 128) / 255``: cv2's f32 a satisfies a + 128 == n/64 exactly,
    and the final /255 is a correctly-rounded f32 division on both sides.
    """
    n = _lab_n_np(rgb_u8)
    l_u8 = ((n[..., 0] * 255) >> 14).astype(np.int32)
    ab = (n[..., 1:].astype(np.float32) * np.float32(1.0 / 64.0)) \
        / np.float32(255.0)
    return l_u8, ab


def _soft_corner_onehot(u8_chan, dtype):
    """(..., ) uint8 channel -> (..., 33) corner weights (integers <= 16).

    All-arithmetic (no gathers): cx is reproduced with the same correctly-
    rounded f32 ops cv2 uses, then corner/weight splits are exact VPU math.

    Tie-margin argument (why the TPU's reciprocal-multiply divide is safe):
    ``v / 255`` on TPU may differ from the IEEE-correctly-rounded quotient
    q by <= 1 ulp(q), so ``cx = round(q * 16384)`` sees a perturbation of
    at most ``16384 * ulp(q)`` in cx units, and ``round`` only flips when
    the exact product sits within that distance of a half-integer tie.
    Enumerating all 256 values (q is a f32, so ``q * 16384`` is exact in
    f64): every value's distance to the nearest .5 tie is >= 2x its own
    1-ulp perturbation bound (tightest: v=253, distance 2^-9 vs
    perturbation 2^-10; most values have orders of magnitude more slack).
    The rounded cx, and hence the whole integer pipeline, is therefore
    immune to the divide's slack as long as the lowering stays within
    1 ulp. ``device_corner_check()`` additionally re-verifies all 256
    values on the live backend at chain build, guarding lowerings that
    drift beyond that contract.
    """
    v = u8_chan.astype(jnp.float32)
    cx = jnp.round(v / jnp.float32(255.0) * jnp.float32(LAB_BASE))
    tx = jnp.floor(cx * (1.0 / 512.0))
    fx = cx - tx * 512.0
    w = jnp.floor(fx * (1.0 / 32.0))
    iota = jnp.arange(33, dtype=jnp.float32)
    t = tx[..., None]
    return ((iota == t) * (16.0 - w[..., None])
            + (iota == t + 1.0) * w[..., None]).astype(dtype)


def _chunk_divisor(size, want, floor=1):
    """Largest divisor of ``size`` that is <= ``want`` (but >= ``floor``)."""
    for d in range(min(want, size), floor, -1):
        if size % d == 0:
            return d
    return floor if size % floor == 0 else size


def _lab_n_jax(batch_u8, channels, target_px=2048):
    """(N, H, W, 3) uint8 -> (N, H, W, len(channels)) int32 lattice n values.

    One MXU contraction per pixel chunk: the (g, b) pair soft-one-hot
    (integers <= 256, exact in bf16) against the hi/lo-packed node LUT —
    all requested output channels and both table halves ride the same
    matmul — then a 33-wide weighted sum by the r-channel weights. Scanned
    over ~``target_px``-pixel chunks (splitting W as well as H) so the
    (px, 1089) pair transient stays VMEM-sized: at 2048 px it is ~4.5 MB
    and the whole batch-of-8 768x1024 conversion measures ~21 ms on v5e vs
    ~32 ms for full-row chunks whose 17.8 MB transient round-trips HBM
    (and ~24.5 ms for the v3 Mosaic kernel, ``lab_n_pallas``).
    """
    nodes = _node_lut3()[..., list(channels)]  # (33, 33, 33, C)
    n_chan = nodes.shape[-1]
    # (1089, 33 * C): pair rows x (r_corner, channel)
    flat = nodes.reshape(33, 33 * 33, n_chan).transpose(1, 0, 2).reshape(
        33 * 33, 33 * n_chan)
    # node values need 14 mantissa bits; bf16 holds 8. Ship the table as
    # hi||lo halves (each < 2^7, bf16-exact) packed into the SAME matmul's
    # output columns: exactness then follows from operand representability
    # alone — no reliance on XLA precision modes (which demote f32 operands
    # to bf16 at some shapes; observed 10% wrong outputs on v5e).
    node = jnp.asarray(
        np.concatenate([flat >> 7, flat & 127], axis=1), jnp.bfloat16)
    n, h, w_, _ = batch_u8.shape
    rows = _chunk_divisor(h, max(1, target_px // max(1, n * w_)))
    wcols = w_
    if rows == 1 and n * w_ > target_px:
        # keep lane extents 128-aligned where W allows; tiny widths keep W
        wcols = _chunk_divisor(w_, max(1, target_px // n), floor=127)
        if wcols == w_:
            # no 128-aligned divisor <= want (e.g. W = 992 at batch 16):
            # an unaligned lane extent still beats the full-row transient
            # (~9x VMEM target, the HBM-round-trip regime this chunking
            # exists to avoid) — but refuse slivers that would turn the
            # scan into per-step dispatch soup
            alt = _chunk_divisor(w_, max(1, target_px // n))
            if alt >= 32:
                wcols = alt
    vals = jnp.moveaxis(
        batch_u8.reshape(n, h // rows, rows, w_ // wcols, wcols, 3),
        (1, 3), (0, 1)).reshape(
        (h // rows) * (w_ // wcols), n, rows, wcols, 3)

    def body(_, v):  # (N, chunk, W, 3)
        o_r = _soft_corner_onehot(v[..., 0], jnp.float32)
        o_g = _soft_corner_onehot(v[..., 1], jnp.bfloat16)
        o_b = _soft_corner_onehot(v[..., 2], jnp.bfloat16)
        pair = (o_g[..., :, None] * o_b[..., None, :]).reshape(
            *v.shape[:-1], 33 * 33)
        t = jnp.einsum("...p,pk->...k", pair, node,
                       preferred_element_type=jnp.float32)
        # hi/lo <= 2^15 are exact; recombined t2 <= 2^22 is f32-exact; the
        # final blend reaches 2^26, beyond f32's exact-integer range —
        # finish in int32
        w = 33 * n_chan
        t2 = (t[..., :w] * jnp.float32(128.0) + t[..., w:]).reshape(
            *v.shape[:-1], 33, n_chan).astype(jnp.int32)
        blend = (t2 * o_r.astype(jnp.int32)[..., None]).sum(-2)
        return None, (blend + 2048) >> 12

    _, out = jax.lax.scan(body, None, vals)
    out = out.reshape(h // rows, w_ // wcols, n, rows, wcols, n_chan)
    return jnp.moveaxis(out, (0, 1), (1, 3)).reshape(n, h, w_, n_chan)


def lab_l_u8_jax(batch_u8, target_px=2048):
    """(N, H, W, 3) uint8 -> (N, H, W) int32 l_u8, bit-exact with cv2."""
    nval = _lab_n_jax(batch_u8, (0,), target_px)[..., 0]
    return ((nval * 255) >> 14).astype(jnp.int32)


def lab_chan_jax(batch_u8, target_px=2048):
    """JAX version of ``lab_chan_np``: (l_u8 int32, ab f32).

    The integer lattice (and hence l_u8) is bit-exact on TPU (verified
    exhaustively on hardware); the final normalized ab values match the
    host to the last ulp of one f32 division (TPU lowers divide to a
    reciprocal multiply — observed <= 1.2e-7, vastly below the ~1e-3
    inverse-conversion float path that follows downstream).
    """
    nval = _lab_n_jax(batch_u8, (0, 1, 2), target_px)
    l_u8 = ((nval[..., 0] * 255) >> 14).astype(jnp.int32)
    ab = (nval[..., 1:].astype(jnp.float32) * jnp.float32(1.0 / 64.0)) \
        / jnp.float32(255.0)
    return l_u8, ab


def lab_normspace_jax(batch_u8, target_px=2048):
    """uint8 RGB -> the host's normalized lab space: channel 0 = L/100
    (== n_L / 2^14, exact — power-of-two scale), 1/2 = (chan+128)/255
    (to the last ulp of the divide on TPU; see ``lab_chan_jax``)."""
    nval = _lab_n_jax(batch_u8, (0, 1, 2), target_px).astype(jnp.float32)
    ch0 = nval[..., :1] * jnp.float32(1.0 / LAB_BASE)
    ab = (nval[..., 1:] * jnp.float32(1.0 / 64.0)) / jnp.float32(255.0)
    return jnp.concatenate([ch0, ab], axis=-1)


def _lab_l_pallas_kernel(img_ref, node_ref, out_ref, *, rows_per_block):
    """One row-block: packed-RGB int32 pixels -> l_u8 (f32 values).

    Per row: corner/weight splits on the VPU (exact f32 round ops identical
    to cv2's quantization); the (W, 1089) pair weights come from narrow
    (W, 33) one-hot maps expanded with pltpu.repeat / lane-concat (building
    them from full-width iota compares is VPU-bound); ONE full-speed bf16
    MXU dot against the hi||lo packed node table (node values reach 2^14,
    beyond bf16's exact-integer range; the two halves are < 2^7, live in
    columns 0:33 / 33:66 — N pads to 128 lanes either way — and recombine
    exactly). The final blend runs in int32 (it reaches 2^26, beyond f32's
    exact-integer range).
    """
    from jax.experimental.pallas import tpu as pltpu

    img = img_ref[0]  # (R, W) int32 packed r<<16 | g<<8 | b
    r, w = img.shape
    node = node_ref[...]  # (1089, 66) bf16: hi cols 0:33, lo cols 33:66

    iota33 = jax.lax.broadcasted_iota(jnp.int32, (w, 33), 1)
    # j_g = pair-column // 33 (the g-corner; k_b tiles via pltpu.repeat)
    j_g = jax.lax.broadcasted_iota(jnp.int32, (w, 33 * 33), 1) // 33

    def corners(vals):
        cx = jnp.round(vals.astype(jnp.float32) / jnp.float32(255.0)
                       * jnp.float32(LAB_BASE))
        tx = jnp.floor(cx * jnp.float32(1.0 / 512.0))
        fx = cx - tx * jnp.float32(512.0)
        wq = jnp.floor(fx * jnp.float32(1.0 / 32.0))
        return tx.astype(jnp.int32), wq

    def corner_onehot(iota, vals):
        tx, wq = corners(vals)
        return (iota == tx[:, None]).astype(jnp.float32) \
            * (jnp.float32(16.0) - wq[:, None]) \
            + (iota == tx[:, None] + 1).astype(jnp.float32) * wq[:, None]

    for i in range(rows_per_block):
        v = img[i, :]
        # pair[w, j*33 + k] = og[w, j] * ob[w, k]: the j-major factor comes
        # from full-width compares, the k-minor factor tiles (repeat)
        og_rep = corner_onehot(j_g, (v >> 8) & 255)       # (W, 1089)
        ob = corner_onehot(iota33, v & 255)               # (W, 33)
        ob_tile = pltpu.repeat(ob, 33, axis=1)
        pair = (og_rep * ob_tile).astype(jnp.bfloat16)    # ints <= 256: exact

        t = jnp.dot(pair, node, preferred_element_type=jnp.float32)
        t2 = (t[:, :33] * jnp.float32(128.0) + t[:, 33:]).astype(jnp.int32)

        o_r = corner_onehot(iota33, v >> 16).astype(jnp.int32)
        blend = jnp.sum(t2 * o_r, axis=1)  # (W,) int32 <= 2^26
        nval = (blend + 2048) >> 12
        out_ref[0, i, :] = ((nval * 255) >> 14).astype(jnp.float32)


@functools.lru_cache(maxsize=1)
def _node_packed():
    """(1089, 66) hi||lo halves of the node LUT, rows (g_corner, b_corner)
    j-major, columns 0:33 = value >> 7, 33:66 = value & 127."""
    nodes = _node_lut().reshape(33, 33 * 33).T  # (1089, 33)
    return np.concatenate([np.right_shift(nodes, 7),
                           np.bitwise_and(nodes, 127)],
                          axis=1).astype(np.float32)


def lab_l_u8_pallas(batch_u8, interpret=False):
    """Pallas TPU version of ``lab_l_u8_jax`` — same bit-exact integer
    pipeline fused in VMEM. Measured SLOWER than the XLA scan on v5e
    (~97 vs ~36 ms per batch-of-8 at 768x1024: the per-row (W, 1089)
    weight expansion is relayout/VPU-bound in Mosaic), so the XLA path
    stays production; this kernel is kept as the exactness cross-check
    and for future Mosaic revisions."""
    from jax.experimental import pallas as pl

    n, h, w_, _ = batch_u8.shape
    v = batch_u8.astype(jnp.int32)
    packed = (v[..., 0] << 16) | (v[..., 1] << 8) | v[..., 2]
    node = _node_packed()
    rows_per_block = 8 if h % 8 == 0 else 1
    n_blocks = h // rows_per_block

    kernel = functools.partial(_lab_l_pallas_kernel,
                               rows_per_block=rows_per_block)
    out = pl.pallas_call(
        kernel,
        grid=(n, n_blocks),
        in_specs=[
            pl.BlockSpec((1, rows_per_block, w_), lambda i, t: (i, t, 0)),
            pl.BlockSpec((33 * 33, 66), lambda i, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows_per_block, w_),
                               lambda i, t: (i, t, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, w_), jnp.float32),
        interpret=interpret,
    )(packed, jnp.asarray(node, jnp.bfloat16))
    return out.astype(jnp.int32)


def _lab_v3_kernel(img_ref, stretch_ref, node_ref, l_ref, a_ref, b_ref, *,
                   sub):
    """One flat pixel-row of the exact trilinear: packed-RGB int32 ->
    three f32 lattice-n planes (ints <= 2^14, f32-exact).

    v1 (``_lab_l_pallas_kernel``) lost to XLA because the pair weights
    were built with full-width iota compares in pixel-major layout —
    VPU/relayout-bound in Mosaic. v3's two structural fixes:

    * TRANSPOSED layout: pixels live on the LANE axis everywhere, so every
      vector op runs full 128-lane tiles (the (px, 33) layout wasted 3/4
      of each vreg), and the caller flattens row-blocks into one long lane
      dimension with a free XLA reshape (rows are contiguous) so per-op
      overheads amortize over ~1024 pixels.
    * VMEM pair construction: the hat-function corner weights
      (relu(16 - |u - 16c|), branch-free) build narrow (33, px) maps; the
      g-corner map stretches across its 33-row blocks with an elementwise
      sublane ``jnp.repeat`` (a (1089, 33) x (33, px) 0/1 stretch matmul
      for narrow blocks where Mosaic's repeat lowering bails — both
      exact, weights are ints <= 16), the b-corner map tiles with
      ``pltpu.repeat``, and their product (ints <= 256, bf16-exact) feeds
      one (256, 1089) x (1089, px) dot against the hi/lo-packed 3-channel
      node table. The (1089, px) pair transient lives and dies in VMEM —
      the HBM round trip that bounds the XLA scan never happens.

    The r-corner contraction folds the hi/lo recombination into one int32
    multiply-reduce: blend = sum over each 33-row block of
    t * or_tile * [128...,1...] (hi contribution <= 2^26 < int32).
    Measured 96 ms for 16x768x1024 on v5e vs 126 ms for the XLA scan
    (bit-exact vs numpy on chip); the (256, 1089) main dot alone runs at
    ~75% of bf16 peak, the stretch/tile/contraction VPU work the rest.
    """
    from jax.experimental.pallas import tpu as pltpu

    block = img_ref[0]            # (sub, PX) int32 packed r<<16 | g<<8 | b
    stretch = stretch_ref[...]    # (1089, 33) bf16: S^T
    node = node_ref[...]          # (256, 1089) bf16: rows half*99 + ch*33+i
    px = block.shape[1]

    iota16 = (jax.lax.broadcasted_iota(jnp.int32, (33, px), 0)
              * 16).astype(jnp.float32)
    scale = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (198, px), 0) < 99, 128, 1)

    def quant(vals):              # (sub, PX) int -> u = 16*tx + wq, f32
        cx = jnp.round(vals.astype(jnp.float32) / jnp.float32(255.0)
                       * jnp.float32(LAB_BASE))
        return jnp.floor(cx * jnp.float32(1.0 / 32.0))

    # hoisted, full-tile corner quantization for the whole row block
    u_r = quant(block >> 16)
    u_g = quant((block >> 8) & 255)
    u_b = quant(block & 255)

    def corner_onehot(u, i):      # -> (33, PX) hat weights, ints <= 16
        # weight(corner c) = relu(16 - |u - 16c|): 16-wq at tx, wq at tx+1
        return jnp.maximum(
            jnp.float32(16.0) - jnp.abs(u[i][None, :] - iota16),
            jnp.float32(0.0))

    for i in range(sub):
        og = corner_onehot(u_g, i).astype(jnp.bfloat16)
        ob = corner_onehot(u_b, i).astype(jnp.bfloat16)
        if px >= 256:
            # elementwise sublane upsample — Mosaic lowers this well at
            # full-tile widths (and it beats the stretch matmul by ~7%)
            og_rep = jnp.repeat(og, 33, axis=0)
        else:
            # narrow blocks hit "unsupported shape cast" in Mosaic's
            # repeat lowering — the 0/1 stretch matmul is exact either way
            og_rep = jnp.dot(stretch, og,
                             preferred_element_type=jnp.float32).astype(
                                 jnp.bfloat16)
        pair = (og_rep * pltpu.repeat(ob, 33, axis=0))
        t = jnp.dot(node, pair, preferred_element_type=jnp.float32)

        o_r = corner_onehot(u_r, i).astype(jnp.int32)
        or6 = pltpu.repeat(o_r, 6, axis=0)  # (198, PX): row c -> or[c % 33]
        contrib = t[:198, :].astype(jnp.int32) * or6 * scale
        for ch, out_ref in enumerate((l_ref, a_ref, b_ref)):
            blend = (jnp.sum(contrib[ch * 33:(ch + 1) * 33, :], axis=0)
                     + jnp.sum(contrib[99 + ch * 33:132 + ch * 33, :],
                               axis=0))
            out_ref[0, i, :] = (((blend + 2048) >> 12)).astype(jnp.float32)


@functools.lru_cache(maxsize=1)
def _v3_tables():
    """(stretch^T (1089, 33), node^T (256, 1089)) for ``_lab_v3_kernel``."""
    stretch = np.zeros((33 * 33, 33), np.float32)
    for j in range(33):
        stretch[j * 33:(j + 1) * 33, j] = 1.0
    # pair rows (j, k) j-major (og stretch-major, ob repeat-minor); node
    # output rows half*99 + ch*33 + i
    flat = _node_lut3().transpose(1, 2, 3, 0).reshape(33 * 33, 99)
    packed = np.concatenate([flat >> 7, flat & 127], axis=1)
    node = np.zeros((256, 33 * 33), np.float32)
    node[:198] = packed.T
    return stretch, node


def lab_n_pallas(batch_u8, interpret=False, flat_px=1024):
    """(N, H, W, 3) uint8 -> (N, H, W, 3) f32 lattice-n values, bit-exact
    with ``_lab_n_np`` (the v3 MXU kernel; see ``_lab_v3_kernel``)."""
    from jax.experimental import pallas as pl

    n, h, w_, _ = batch_u8.shape
    v = batch_u8.astype(jnp.int32)
    packed = (v[..., 0] << 16) | (v[..., 1] << 8) | v[..., 2]
    # flatten row-blocks into one lane dimension (rows are contiguous: a
    # free reshape, no relayout) so each kernel invocation sees a long
    # full-tile pixel row
    rows = min(h, max(1, flat_px // w_))
    while rows > 1 and h % rows:
        rows -= 1
    # Mosaic wants >= 8 sublanes per block (or the whole dim): group 8
    # flat superrows per block when the shape allows, else take the whole
    # column of superrows (tiny images only — production buckets are
    # 32-multiples)
    q = h // rows
    if q % 8 == 0:
        sub = 8
    elif q <= 32:
        sub = q
    else:
        rows, q, sub = h, 1, 1
    packed = packed.reshape(n, q, rows * w_)
    stretch, node = _v3_tables()

    plane = pl.BlockSpec((1, sub, rows * w_), lambda i, t: (i, t, 0))
    outs = pl.pallas_call(
        functools.partial(_lab_v3_kernel, sub=sub),
        grid=(n, q // sub),
        in_specs=[
            plane,
            pl.BlockSpec((33 * 33, 33), lambda i, t: (0, 0)),
            pl.BlockSpec((256, 33 * 33), lambda i, t: (0, 0)),
        ],
        out_specs=(plane, plane, plane),
        out_shape=tuple(jax.ShapeDtypeStruct((n, q, rows * w_), jnp.float32)
                        for _ in range(3)),
        interpret=interpret,
    )(packed, jnp.asarray(stretch, jnp.bfloat16),
      jnp.asarray(node, jnp.bfloat16))
    return jnp.stack([o.reshape(n, h, w_) for o in outs], axis=-1)


def _use_pallas_lab():
    # the W-chunked XLA scan (VMEM-sized pair transient) measures ~21 ms
    # vs the v3 Mosaic kernel's ~24.5 ms per batch-of-8 at 768x1024 on
    # v5e, so XLA is the default; MDIR_TPU_LAB_PALLAS=1 re-selects Mosaic
    return os.environ.get("MDIR_TPU_LAB_PALLAS", "0") == "1" \
        and jax.default_backend() == "tpu"


def lab_chan(batch_u8, interpret=False):
    """Production ``lab_chan_jax`` (the W-chunked XLA contraction; the v3
    Mosaic kernel stays available behind ``MDIR_TPU_LAB_PALLAS=1``)."""
    if not _use_pallas_lab() and not interpret:
        return lab_chan_jax(batch_u8)
    nval = lab_n_pallas(batch_u8, interpret=interpret)
    l_u8 = ((nval[..., 0].astype(jnp.int32) * 255) >> 14)
    ab = (nval[..., 1:] * jnp.float32(1.0 / 64.0)) / jnp.float32(255.0)
    return l_u8, ab


def lab_normspace(batch_u8, interpret=False):
    """Production ``lab_normspace_jax`` (same dispatch as ``lab_chan``)."""
    if not _use_pallas_lab() and not interpret:
        return lab_normspace_jax(batch_u8)
    nval = lab_n_pallas(batch_u8, interpret=interpret)
    ch0 = nval[..., :1] * jnp.float32(1.0 / LAB_BASE)
    ab = (nval[..., 1:] * jnp.float32(1.0 / 64.0)) / jnp.float32(255.0)
    return jnp.concatenate([ch0, ab], axis=-1)


def lab_l_u8(batch_u8, interpret=False):
    """Production ``lab_l_u8_jax`` (same dispatch as ``lab_chan``)."""
    if not _use_pallas_lab() and not interpret:
        return lab_l_u8_jax(batch_u8)
    return lab_chan(batch_u8, interpret=interpret)[0]


def lsh_l_u8_np(rgb_u8):
    """HLS lightness u8 plane: exactly (max + min) >> 1 for u8 inputs."""
    v = np.asarray(rgb_u8, np.int32)
    return (v.max(-1) + v.min(-1)) >> 1


def lsh_l_u8_jax(batch_u8):
    v = batch_u8[..., :3].astype(jnp.int32)
    return (jnp.max(v, axis=-1) + jnp.min(v, axis=-1)) >> 1


@functools.lru_cache(maxsize=1)
def device_corner_check():
    """On-device guard: all 256 u8 values through ``_soft_corner_onehot``
    must reproduce the exact ``_u8_corner_tables`` quantization.

    The numpy ``spot_check`` validates the replica against cv2 but cannot
    see a device-lowering drift (e.g. a future XLA revision whose divide
    strays beyond the 1-ulp contract the tie-margin argument assumes — see
    ``_soft_corner_onehot``). This runs the actual device computation once
    per process; tiny (256x33) and jit-free of the hot path.
    """
    try:
        onehot = np.asarray(
            jax.jit(lambda v: _soft_corner_onehot(v, jnp.float32))(
                jnp.arange(256, dtype=jnp.uint8)))
    except Exception:  # pragma: no cover - no usable backend
        return False
    tx_ref, w_ref = _u8_corner_tables()
    # decode (tx, w) back out of the soft one-hot rows
    expect = np.zeros((256, 33), np.float32)
    idx = np.arange(256)
    expect[idx, tx_ref] += 16.0 - w_ref
    expect[idx, np.minimum(tx_ref + 1, 32)] += w_ref
    return bool((onehot == expect).all())


@functools.lru_cache(maxsize=4)
def spot_check(space="lab", samples=4096, seed=0):
    """Sampled guard: numpy replica vs the live cv2 host chain.

    Returns True when the device-L computation is safe to use for ``space``.
    Cheap (one cvtColor call); biased toward channel extremes where corner
    and rounding bugs would show first.
    """
    try:
        from ..data.transforms import rgb2normspace_np
    except ImportError:  # pragma: no cover
        return False
    rng = np.random.RandomState(seed)
    u8 = rng.randint(0, 256, (samples, 3))
    u8[:256] = np.stack([np.arange(256)] * 3, -1)  # gray ramp
    u8[256:288, 1:] = 0                            # single-channel edges
    u8 = u8.astype(np.uint8)
    try:
        spc = rgb2normspace_np(
            (u8[None].astype(np.float32) / 255.0), space)
    except Exception:  # pragma: no cover - cv2 missing/unsupported space
        return False
    host = (spc[0, :, 0] * 255).astype(np.uint8).astype(np.int32)
    if space == "lab":
        ours = lab_l_u8_np(u8)
    elif space == "lsh":
        ours = lsh_l_u8_np(u8)
    else:
        return False
    return bool((ours == host).all())
