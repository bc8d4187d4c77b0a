#!/usr/bin/env python3
"""Per-stage resident cost of the device CLAHE chain at 16x768x1024."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

def sync(x):
    idx = (0,) * (x.ndim - 1)
    return np.asarray(x[idx][..., :1])

def bench(fn, *args, reps=5):
    out = fn(*args); sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time(); sync(fn(*args)); best = min(best, time.time()-t0)
    return best

def main():
    import jax, jax.numpy as jnp
    from mdir_tpu.data.transforms import initialize_transforms
    from mdir_tpu.ops.preprocess import chain_from_transform, make_bucketed_chain
    from mdir_tpu.ops.clahe import clahe_bucket_aux, pack_clahe_aux, unpack_clahe_aux, clahe_u8_bucketed_jax
    from mdir_tpu.ops import lab_trilinear as lt
    from mdir_tpu.ops import colorspace as cs

    N, H, W = 16, 768, 1024
    mean_std = ([0.485, 0.456, 0.406], [0.229, 0.224, 0.225])
    chain = chain_from_transform(initialize_transforms(
        "pil2np | apply_clahe | totensor | normalize", list(mean_std)))
    rng = np.random.RandomState(0)
    batch = jax.device_put(rng.randint(0, 256, (N, H, W, 3)).astype(np.uint8))
    aux_h = pack_clahe_aux(clahe_bucket_aux([(H, W)]*N, (H, W), *chain.clahe_params))
    aux = tuple(jnp.asarray(a) for a in aux_h)
    grid = chain.clahe_params[1]

    chain_fn = make_bucketed_chain(chain)
    full = jax.jit(lambda b, a: chain_fn(b, unpack_clahe_aux(*a, (H, W), grid)))
    print("chain_fn full: %6.1f ms" % (bench(full, batch, aux)*1e3), flush=True)

    t = bench(jax.jit(lambda b: lt.lab_chan_jax(b)[0]), batch)
    print("lab_chan (l+ab): %6.1f ms" % (t*1e3), flush=True)

    l_u8 = jax.jit(lambda b: lt.lab_chan_jax(b)[0])(batch)
    sync(l_u8)
    clahe = jax.jit(lambda l, a: clahe_u8_bucketed_jax(
        l, unpack_clahe_aux(*a, (H, W), grid), grid))
    print("clahe bucketed: %6.1f ms" % (bench(clahe, l_u8, aux)*1e3), flush=True)

    chan = clahe(l_u8, aux)
    sync(chan)
    ab = jnp.zeros((N, H, W, 2), jnp.float32)
    inv = jax.jit(lambda c, a: cs.normspace2rgb(
        jnp.concatenate([c[..., None]/255.0, a], -1), "lab"))
    print("inverse lab->rgb: %6.1f ms" % (bench(inv, chan.astype(jnp.float32), ab)*1e3), flush=True)

if __name__ == "__main__":
    main()
