#!/usr/bin/env python3
"""On-chip A/B for the CLAHE bucketed kernels: exactness vs the host
implementation + timing across MDIR_TPU_CLAHE_CHUNK_PX values.

Usage: python tools_dev/opt_clahe_ab.py [N H W] [chunk_px ...]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def sync(x):
    return np.asarray(x[0, :1, :1])


def main():
    argv = sys.argv[1:]
    n, h, w = (int(a) for a in argv[:3]) if len(argv) >= 3 else (8, 768, 1024)
    chunks = [int(a) for a in argv[3:]] or [4096, 8192, 16384, 32768, 65536]

    import jax
    import jax.numpy as jnp
    from mdir_tpu.ops import clahe as C

    rng = np.random.RandomState(0)
    # mixed valid extents exercise sentinel tiles + per-image aux scalars
    shapes = [(h, w), (h - 68, w - 100)] * (n // 2) + [(h, w)] * (n % 2)
    imgs = [rng.randint(0, 256, s).astype(np.uint8) for s in shapes]
    batch_np = np.zeros((n, h, w), np.int32)
    for i, im in enumerate(imgs):
        batch_np[i, :im.shape[0], :im.shape[1]] = im
    aux_h = C.pack_clahe_aux(C.clahe_bucket_aux(shapes, (h, w), 4.0, (8, 8)))

    batch = jax.device_put(batch_np)
    aux_d = tuple(jnp.asarray(a) for a in aux_h)

    ref = [C.clahe_u8_np(im, 4.0, (8, 8)) for im in imgs]

    for chunk in chunks:
        os.environ["MDIR_TPU_CLAHE_CHUNK_PX"] = str(chunk)

        @jax.jit
        def run(b, a):
            return C.clahe_u8_bucketed_jax(
                b, C.unpack_clahe_aux(*a, (h, w), (8, 8)), (8, 8))

        out = np.asarray(run(batch, aux_d))
        bad = 0
        for i, im in enumerate(imgs):
            hh, ww = im.shape
            bad += int((out[i, :hh, :ww].astype(np.int32) != ref[i]).sum())
        t0 = time.time(); sync(run(batch, aux_d)); first = time.time() - t0
        best = min(
            (lambda s: (sync(run(batch, aux_d)), time.time() - s)[1])(
                time.time())
            for _ in range(5))
        print("chunk_px=%6d  %7.2f ms/batch-%d  (%5.2f ms/img)  "
              "mismatches=%d  first=%.2fs"
              % (chunk, best * 1e3, n, best * 1e3 / n, bad, first),
              flush=True)


if __name__ == "__main__":
    main()
