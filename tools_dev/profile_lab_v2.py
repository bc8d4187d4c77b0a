#!/usr/bin/env python3
"""v2 Pallas lab kernel vs the XLA scan on the chip (16x768x1024)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

def sync(x):
    return np.asarray(x.ravel()[:2])

def bench(fn, *args, reps=5):
    out = fn(*args); sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time(); sync(fn(*args)); best = min(best, time.time()-t0)
    return best

def main():
    import jax, jax.numpy as jnp
    from mdir_tpu.ops import lab_trilinear as lt

    N, H, W = 16, 768, 1024
    rng = np.random.RandomState(0)
    batch = jax.device_put(rng.randint(0, 256, (N, H, W, 3)).astype(np.uint8))
    sync(batch)

    f_v2 = jax.jit(lt.lab_n_pallas)
    t = bench(f_v2, batch)
    print("pallas v2 lab_n: %6.1f ms" % (t*1e3), flush=True)

    f_xla = jax.jit(lambda b: lt._lab_n_jax(b, (0, 1, 2)))
    t = bench(f_xla, batch)
    print("xla scan  lab_n: %6.1f ms" % (t*1e3), flush=True)

    # exactness on-chip at a sampled batch
    small = jax.device_put(rng.randint(0, 256, (2, 64, 96, 3)).astype(np.uint8))
    a = np.asarray(f_v2(small)); b = np.asarray(f_xla(small))
    print("on-chip v2 == xla:", (a == b).all(), flush=True)
    ref = lt._lab_n_np(np.asarray(small))
    print("on-chip v2 == numpy:", (a == ref).all(), flush=True)

if __name__ == "__main__":
    main()
