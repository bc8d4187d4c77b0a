"""Global descriptor pooling and normalization in JAX (NHWC layout).

Semantics pinned to the reference formulas
(``cirtorch/layers/functional.py:11-131``): MAC = global max, SPoC = global
mean, GeM = (mean(clamp(x, eps)^p))^(1/p) with learnable p, RMAC = multi-region
MAC with L2-normalized region vectors summed, L2N with eps added to the norm.

Every pool has a *masked* variant taking a (..., H, W) validity mask so images
padded into static shape buckets pool identically to their native-shape
versions (the TPU static-shape strategy; see ARCHITECTURE.md §2).
"""
import math

import jax

import jax.numpy as jnp
import numpy as np


def l2n(x, eps=1e-6, axis=-1):
    """x / (||x||_2 + eps) along ``axis`` (reference l2n, functional.py:130)."""
    norm = jnp.linalg.norm(x, ord=2, axis=axis, keepdims=True)
    return x / (norm + eps)


def mac(x, mask=None):
    """Global max pool: (..., H, W, C) -> (..., C)."""
    if mask is not None:
        neg = jnp.finfo(x.dtype).min
        x = jnp.where(mask[..., None] > 0, x, neg)
    return jnp.max(x, axis=(-3, -2))


def spoc(x, mask=None):
    """Global average pool: (..., H, W, C) -> (..., C)."""
    if mask is None:
        return jnp.mean(x, axis=(-3, -2))
    m = mask[..., None].astype(x.dtype)
    total = jnp.sum(x * m, axis=(-3, -2))
    count = jnp.maximum(jnp.sum(m, axis=(-3, -2)), 1.0)
    return total / count


def gem(x, p=3.0, eps=1e-6, mask=None):
    """Generalized-mean pool: (mean(clamp(x,eps)^p))^(1/p), (...,H,W,C)->(...,C)."""
    powed = jnp.clip(x, min=eps) ** p
    pooled = spoc(powed, mask=mask)
    return pooled ** (1.0 / p)


def _rmac_region_grid(h, w, levels=3):
    """Static RMAC region list [(y, x, size), ...] (functional.py:26-75).

    Shapes are static under jit, so this runs in Python at trace time.
    The arithmetic deliberately mirrors cirtorch's FLOAT32 tensor math
    (``torch.floor(wl2 + torch.Tensor(range(n))*b)``): float64 centers
    diverge from the reference at many feature extents (e.g. (4, 33)'s
    level-2 x-offsets end [..., 31] in f64 vs [..., 30] in torch f32),
    which would silently shift regional descriptors off published-model
    parity.
    """
    f32 = np.float32
    ovr = f32(0.4)
    steps = np.array([2, 3, 4, 5, 6, 7], np.float32)
    mindim = min(h, w)
    # scalar/tensor division in torch lowers to reciprocal-multiply
    # (36/5 gives 7.2000003, not 7.1999998) — replicate or idx diverges
    bsteps = f32(max(h, w) - mindim) * (f32(1) / (steps - f32(1)))
    diffs = np.abs((f32(mindim) ** 2 - f32(mindim) * bsteps)
                   / f32(mindim) ** 2 - ovr)
    idx = int(np.argmin(diffs))  # first minimum, like torch.min
    wd, hd = 0, 0
    if h < w:
        wd = idx + 1
    elif h > w:
        hd = idx + 1

    regions = []
    for level in range(1, levels + 1):
        region = int(math.floor(2 * mindim / (level + 1)))
        if region == 0:
            continue
        region2 = math.floor(region / 2 - 1)
        b = f32(0.0) if level + wd == 1 \
            else f32((w - region) / (level + wd - 1))
        cen_w = np.floor(
            f32(region2)
            + np.arange(level - 1 + wd + 1, dtype=np.float32) * b) - region2
        b = f32(0.0) if level + hd == 1 \
            else f32((h - region) / (level + hd - 1))
        cen_h = np.floor(
            f32(region2)
            + np.arange(level - 1 + hd + 1, dtype=np.float32) * b) - region2
        for i in cen_h:
            for j in cen_w:
                regions.append((int(i), int(j), region))
    return regions


def rmac(x, levels=3, eps=1e-6):
    """Regional MAC: full-image MAC + region MACs, each L2-normalized, summed.

    x: (N, H, W, C) -> (N, C). Static shapes only (the region grid is
    computed at trace time), matching the reference exactly for unmasked
    inputs.
    """
    h, w = x.shape[-3], x.shape[-2]
    v = mac(x)
    v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + eps)
    for (i, j, size) in _rmac_region_grid(h, w, levels):
        region = x[..., i:i + size, j:j + size, :]
        vt = mac(region)
        vt = vt / (jnp.linalg.norm(vt, axis=-1, keepdims=True) + eps)
        v = v + vt
    return v


def roipool(x, pool_fn, levels=3):
    """Region vectors for regional pooling (Rpool): (N,H,W,C) -> (N,R,C)."""
    h, w = x.shape[-3], x.shape[-2]
    vecs = [pool_fn(x)]
    for (i, j, size) in _rmac_region_grid(h, w, levels):
        vecs.append(pool_fn(x[..., i:i + size, j:j + size, :]))
    return jnp.stack(vecs, axis=-2)


def _box_mask(shape_hw, box):
    """(B, H, W) mask of one region per image; box (B, 4) = [y0, x0, bh, bw]."""
    h, w = shape_hw
    rows = jnp.arange(h)[None, :, None]
    cols = jnp.arange(w)[None, None, :]
    y0 = box[:, 0:1, None]
    x0 = box[:, 1:2, None]
    return ((rows >= y0) & (rows < y0 + box[:, 2:3, None])
            & (cols >= x0) & (cols < x0 + box[:, 3:4, None]))


def region_vectors(x, boxes, pool_fn):
    """Pool every region of every image: (B,H,W,C), (B,R,4) -> (B,R,C).

    Regions are host-computed rectangles inside each image's valid feature
    extent (``rmac_region_boxes``); a zero-size box marks padding. The R
    axis is a sequential ``lax.map`` so memory stays (B,H,W,C) per step —
    the batched counterpart of the reference's per-region slicing
    (cirtorch functional.py:26-123) without data-dependent shapes.
    """
    shape_hw = x.shape[-3:-1]

    def one(box_r):  # (B, 4) -> (B, C)
        return pool_fn(x, _box_mask(shape_hw, box_r))

    vecs = jax.lax.map(one, jnp.moveaxis(boxes, 1, 0))
    return jnp.moveaxis(vecs, 0, 1)


def rmac_masked(x, boxes, eps=1e-6):
    """Batched masked RMAC: per-region masked MAC, L2N, sum over real regions.

    boxes includes the full valid extent as region 0 (reference rmac pools
    the whole map first, functional.py:47-48).
    """
    vecs = region_vectors(x, boxes, lambda f, m: mac(f, mask=m))
    vecs = vecs / (jnp.linalg.norm(vecs, axis=-1, keepdims=True) + eps)
    real = (boxes[..., 2] > 0)[..., None].astype(vecs.dtype)
    return jnp.sum(vecs * real, axis=-2)


def rmac_region_boxes(h, w, levels=3):
    """Host: [y0, x0, bh, bw] boxes of the RMAC grid for a (h, w) feature
    extent, full-extent box first (the reference's region enumeration)."""
    boxes = [(0, 0, h, w)]
    for (i, j, size) in _rmac_region_grid(h, w, levels):
        boxes.append((i, j, size, size))
    return boxes


def powerlaw(x, eps=1e-6):
    """Signed sqrt power-law normalization (cirtorch functional.py:133-135;
    implemented as documented — the reference's own version has an unused-self
    bug and is never called)."""
    x = x + eps
    return jnp.sign(x) * jnp.sqrt(jnp.abs(x))


POOLING = {
    "mac": mac,
    "spoc": spoc,
    "gem": gem,
    "rmac": rmac,
}
