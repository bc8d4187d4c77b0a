"""In-graph (device) preprocessing chains for fixed-size batches.

The host transform DSL (``data/transforms.py``) is exact but serial; for
fixed-size batches (training crops, same-size eval sets) the photometric
chain can run fused on device: raw uint8 RGB in HBM -> /255 -> colorspace ->
CLAHE on the lightness channel (cv2 semantics, vmapped over the batch) ->
back to RGB -> normalize. One compiled program; pairs with bf16 trunks.

Colorspace conversions use the calibrated JAX implementations
(``ops/colorspace.py``, ~1e-3 of cv2's float path); the CLAHE uint8
quantization amplifies that delta on isolated pixels (bin flips under the
LUT slope), so this is a *near-exact* opt-in fast path (mean error ~0.5%
normalized) — the host chain remains the bit-exact parity reference. Supported
DSL subset: ``pil2np | [apply_clahe[:clip[:space[:grid]]] |
add_clahe_fromrgb[:clip[:grid[:space]]] | tospace:<space>] | totensor |
normalize``.
"""
import functools

import jax
import jax.numpy as jnp

from . import clahe as clahe_ops
from . import colorspace as cs


def _parse_chain(chain):
    steps = []
    for item in [x.strip() for x in chain.split("|") if x.strip()]:
        name, *args = item.split(":")
        steps.append((name, args))
    return steps


SUPPORTED = {"pil2np", "apply_clahe", "add_clahe_fromrgb", "tospace",
             "totensor", "normalize"}


def supports_chain(chain):
    steps = _parse_chain(chain)
    return bool(steps) and all(name in SUPPORTED for name, _ in steps) \
        and steps[-1][0] == "normalize"


def make_device_preprocess(chain, mean_std):
    """Jitted fn: uint8 (N, H, W, 3) -> preprocessed float32 (N, H, W, C)."""
    steps = _parse_chain(chain)
    assert supports_chain(chain), chain
    mean = jnp.asarray(mean_std[0], jnp.float32)
    std = jnp.asarray(mean_std[1], jnp.float32)

    def apply_clahe_img(img, clip, space, grid):
        spc = cs.rgb2normspace(img, space)
        chan = clahe_ops.clahe_channel_jax(spc[..., 0], clip, grid)
        spc = spc.at[..., 0].set(chan)
        return cs.normspace2rgb(spc, space)

    def add_clahe_img(img, clip, grid, space):
        spc = cs.rgb2normspace(img[..., :3], space)
        chan = clahe_ops.clahe_channel_jax(spc[..., 0], clip, grid)
        return jnp.concatenate([img, chan[..., None]], axis=-1)

    @jax.jit
    def fn(batch_u8):
        x = batch_u8.astype(jnp.float32) / 255.0
        for name, args in steps:
            if name in ("pil2np", "totensor"):
                continue
            if name == "apply_clahe":
                clip = float(args[0]) if args else 4.0
                space = args[1] if len(args) > 1 else "lab"
                grid = (int(args[2]),) * 2 if len(args) > 2 else (8, 8)
                x = jax.vmap(lambda im: apply_clahe_img(
                    im, float(int(clip)), space, grid))(x)
            elif name == "add_clahe_fromrgb":
                clip = float(args[0]) if args else 4.0
                grid = (int(args[1]),) * 2 if len(args) > 1 else (8, 8)
                space = args[2] if len(args) > 2 else "lab"
                x = jax.vmap(lambda im: add_clahe_img(
                    im, float(int(clip)), grid, space))(x)
            elif name == "tospace":
                x = cs.rgb2normspace(x[..., :3], args[0])
            elif name == "normalize":
                c = x.shape[-1]
                x = (x - mean[:c]) / std[:c]
        return x

    return fn
