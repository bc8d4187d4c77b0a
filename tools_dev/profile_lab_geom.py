#!/usr/bin/env python3
"""Block-geometry sweep for the v3 lab kernel."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

def sync(x):
    return np.asarray(x.ravel()[:2])

def bench(fn, *args, reps=4):
    out = fn(*args); sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time(); sync(fn(*args)); best = min(best, time.time()-t0)
    return best

def main():
    import jax
    from mdir_tpu.ops import lab_trilinear as lt

    N, H, W = 16, 768, 1024
    rng = np.random.RandomState(0)
    batch = jax.device_put(rng.randint(0, 256, (N, H, W, 3)).astype(np.uint8))
    sync(batch)
    ref_small = None

    for flat_px in (512, 1024, 2048):
        f = jax.jit(lambda b, fp=flat_px: lt.lab_n_pallas(b, flat_px=fp))
        t = bench(f, batch)
        print("flat_px=%-5d: %6.1f ms" % (flat_px, t*1e3), flush=True)

if __name__ == "__main__":
    main()
