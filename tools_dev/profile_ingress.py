#!/usr/bin/env python3
"""Transfer anatomy of the streaming e2e path on the live tunnel.

Answers: where do the e2e passes lose time vs the raw link rate?
- per-device_put fixed latency (small arrays) vs streaming bandwidth
- cost of a chunk's transfer set (batch + grids [+ clahe aux]) issued as
  N separate device_puts vs ONE packed blob
- dispatch latency of the fused program launch

Run on the chip (not under tests): python tools_dev/profile_ingress.py
"""
import time

import numpy as np


def sync(x):
    return np.asarray(x).ravel()[:1]


def timed(fn, reps=2):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)

    # raw bandwidth, large payload
    big = np.random.randint(0, 255, (8, 768, 1024, 3), np.uint8)

    def put_big():
        d = jax.device_put(big)
        sync(d)

    t_big = timed(put_big)
    import sys; sys.stdout.flush()
    print("batch %.1f MB: %.3f s -> %.1f MB/s"
          % (big.nbytes / 1e6, t_big, big.nbytes / t_big / 1e6), flush=True)

    # per-call fixed latency: small arrays of decreasing size
    for shape, dtype in (((16, 768, 3), np.float32), ((16, 1024, 3), np.float32),
                         ((16, 2), np.int32), ((16, 4), np.float32),
                         ((4,), np.float32)):
        arr = np.zeros(shape, dtype)

        def put_small():
            sync(jax.device_put(arr))

        t = timed(put_small, reps=5)
        print("put %-18s %8d B: %.4f s" % (shape, arr.nbytes, t), flush=True)

    # a chain chunk's transfer set as issued today: batch + valid +
    # 2 scales x (ypack, xpack, out_valid) + clahe (ints, scalars) = 10 puts
    valid = np.zeros((8, 2), np.int32)
    ypack = np.zeros((8, 544, 3), np.float32)
    xpack = np.zeros((8, 726, 3), np.float32)
    ov = np.zeros((8, 2), np.int32)
    ints = np.zeros((8, 768 + 8 + 1024 + 8, 2), np.int32)
    scalars = np.zeros((8, 4), np.float32)
    pieces = [valid, ypack, xpack, ov, ypack.copy(), xpack.copy(), ov.copy(),
              ints, scalars]

    def put_separate():
        devs = [jax.device_put(big)] + [jax.device_put(p) for p in pieces]
        for d in devs:
            sync(d)

    t_sep = timed(put_separate)
    total = big.nbytes + sum(p.nbytes for p in pieces)
    print("chunk as %d separate puts: %.3f s (payload %.1f MB -> %.1f MB/s)"
          % (len(pieces) + 1, t_sep, total / 1e6, total / t_sep / 1e6))

    # same payload, aux packed into ONE int32 blob + the batch
    blob = np.concatenate([p.view(np.int32).ravel() for p in pieces])

    def put_packed():
        d1 = jax.device_put(big)
        d2 = jax.device_put(blob)
        sync(d1)
        sync(d2)

    t_packed = timed(put_packed)
    print("chunk as batch + 1 blob:   %.3f s (-> %.1f MB/s)"
          % (t_packed, total / t_packed / 1e6))

    # dispatch latency of a trivial jitted program on resident data
    dev = jax.device_put(big)
    f = jax.jit(lambda x: x.astype(jnp.float32).sum())
    sync(f(dev))
    t_disp = timed(lambda: sync(f(dev)), reps=5)
    print("jitted trivial launch + sync on resident 37MB: %.4f s" % t_disp)

    # async pipelining: does a second put overlap with the first?
    def put_two_async():
        d1 = jax.device_put(big)
        d2 = jax.device_put(big)
        sync(d1)
        sync(d2)

    t_two = timed(put_two_async, reps=2)
    print("two big puts, sync after both: %.3f s (1x=%.3f; ratio %.2f)"
          % (t_two, t_big, t_two / t_big))


if __name__ == "__main__":
    main()
