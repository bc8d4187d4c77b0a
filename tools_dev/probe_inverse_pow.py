#!/usr/bin/env python3
"""Decompose the inverse lab->rgb cost: full vs pow-free vs pow-only."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def sync(x):
    return np.asarray(x[0, :1, :1])


def bench(fn, *args, reps=5):
    sync(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time(); sync(fn(*args)); best = min(best, time.time() - t0)
    return best * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from mdir_tpu.ops import colorspace as cs

    n, h, w = 16, 768, 1024
    rng = np.random.RandomState(0)
    img = jax.device_put(rng.rand(n, h, w, 3).astype(np.float32))

    full = jax.jit(lambda x: cs.normspace2rgb(x, "lab"))
    print("normspace2rgb lab: %7.2f ms" % bench(full, img), flush=True)

    def nopow(x):
        lab = x * jnp.asarray(cs.LAB_SCALE) - jnp.asarray(cs.LAB_SHIFT)
        lum, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
        y = jnp.where(lum > 8.0, ((lum + 16.0) / 116.0) ** 3, lum / 903.3)
        fy = jnp.where(lum > 8.0, (lum + 16.0) / 116.0,
                       7.787 * (lum / 903.3) + 16.0 / 116.0)
        fx = fy + a / 500.0
        fz = fy - b / 200.0
        f_thresh = 7.787 * 0.008856 + 16.0 / 116.0

        def _finv(f):
            return jnp.where(f > f_thresh, f ** 3, (f - 16.0 / 116.0) / 7.787)

        xyz = jnp.stack([_finv(fx), y, _finv(fz)], axis=-1)
        xyz = xyz * jnp.asarray(cs.WHITE)
        lin = xyz @ jnp.asarray(cs.XYZ2RGB).T
        return jnp.clip(jnp.where(lin > 0.0031308, 12.92 * lin, 12.92 * lin),
                        0.0, 1.0)

    print("   pow-free body: %7.2f ms" % bench(jax.jit(nopow), img),
          flush=True)

    powonly = jax.jit(lambda x: x ** (1 / 2.4))
    print("   pow alone    : %7.2f ms" % bench(powonly, img), flush=True)

    sq = jax.jit(lambda x: jnp.sqrt(jnp.sqrt(x)))
    print("   x**0.25 (2 sqrt): %5.2f ms" % bench(sq, img), flush=True)


if __name__ == "__main__":
    main()
