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
import jax
import jax.numpy as jnp


def scale_output_size(size, scale):
    """Output spatial size for a torch-style scale_factor resize."""
    return tuple(int(jnp.floor(d * scale)) for d in size)


def resize_bilinear(x, scale=None, size=None):
    """Bilinear resize of NHWC (or HWC) with torch align_corners=False semantics.

    jax.image.resize 'linear' uses half-pixel centers, matching
    F.interpolate(..., align_corners=False).
    """
    spatial = x.shape[-3:-1]
    if size is None:
        size = scale_output_size(spatial, scale)
    new_shape = x.shape[:-3] + tuple(size) + x.shape[-1:]
    return jax.image.resize(x, new_shape, method="linear")


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
