"""Image resizing: torch-bilinear-compatible JAX resize + PIL thumbnail host path.

Two distinct semantics matter for parity:

* **Multi-scale wrapper resize** — the reference uses
  ``F.interpolate(mode='bilinear', align_corners=False)`` with a scale factor
  (``wrapper.py:92-107``): output size floor(in*s), half-pixel centers. This is
  ``jax.image.resize(method='linear')`` with the matching output size.
* **Max-side load resize** — PIL ``thumbnail((s, s), ANTIALIAS)``
  (``datahelpers.py:48-50``): antialiased (Lanczos in PIL≥10 terms) resize so
  the longer side is ``s``, only if the image is larger. Done host-side via
  PIL to stay bit-compatible with the reference input pipeline.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np


def scale_output_size(size, scale):
    """Output spatial size for a torch-style scale_factor resize."""
    return tuple(int(math.floor(d * scale)) for d in size)


def torch_resize_grid(in_size, out_size, scale=None):
    """Sampling indices/weights of torch bilinear ``align_corners=False``.

    When ``scale`` is given (F.interpolate(scale_factor=s),
    recompute_scale_factor=False — the modern default the reference runs
    under), coordinates use 1/s directly: src = (dst + 0.5)/s - 0.5. Without
    it, the in/out size ratio is used (F.interpolate(size=...)).
    """
    step = (1.0 / scale) if scale is not None else (in_size / out_size)
    src = (np.arange(out_size, dtype=np.float64) + 0.5) * step - 0.5
    src = np.clip(src, 0.0, None)
    i0 = np.floor(src).astype(np.int64)
    i0 = np.minimum(i0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w = (src - i0).astype(np.float32)
    return i0, i1, w


def resize_bilinear(x, scale=None, size=None):
    """Bilinear resize of NHWC/HWC, exact torch F.interpolate semantics
    (align_corners=False; scale_factor coordinates when ``scale`` given)."""
    spatial = x.shape[-3:-1]
    if size is None:
        size = scale_output_size(spatial, scale)
    y0, y1, wy = torch_resize_grid(spatial[0], size[0], scale)
    x0, x1, wx = torch_resize_grid(spatial[1], size[1], scale)

    batched = x.ndim == 4
    if not batched:
        x = x[None]
    rows0 = jnp.take(x, y0, axis=-3)
    rows1 = jnp.take(x, y1, axis=-3)
    rows = rows0 * (1 - wy)[:, None, None] + rows1 * wy[:, None, None]
    cols0 = jnp.take(rows, x0, axis=-2)
    cols1 = jnp.take(rows, x1, axis=-2)
    out = cols0 * (1 - wx)[None, :, None] + cols1 * wx[None, :, None]
    return out if batched else out[0]


def max_side_resize_pil(img, imsize):
    """PIL thumbnail to max side ``imsize`` (in place on a copy), as imresize."""
    from PIL import Image

    img = img.copy()
    img.thumbnail((imsize, imsize), Image.LANCZOS)
    return img


def pad_to_shape(x, target_hw, mode="constant"):
    """Zero-pad HWC/NHWC to a bucket shape, returning (padded, mask).

    The mask marks valid (unpadded) pixels and drives masked pooling so that
    bucketed extraction matches native-shape extraction.
    """
    h, w = x.shape[-3], x.shape[-2]
    th, tw = target_hw
    assert th >= h and tw >= w, ((h, w), target_hw)
    pad = [(0, 0)] * (x.ndim - 3) + [(0, th - h), (0, tw - w), (0, 0)]
    padded = jnp.pad(x, pad, mode=mode)
    mask = jnp.zeros(x.shape[:-3] + (th, tw), dtype=jnp.float32)
    mask = mask.at[..., :h, :w].set(1.0)
    return padded, mask


def bucket_shape(h, w, multiple=32, max_side=None):
    """Round spatial dims up to ``multiple`` (optionally capped at max_side)."""
    round_up = lambda v: -(-v // multiple) * multiple
    bh, bw = round_up(h), round_up(w)
    if max_side:
        bh, bw = min(bh, round_up(max_side)), min(bw, round_up(max_side))
    return bh, bw
