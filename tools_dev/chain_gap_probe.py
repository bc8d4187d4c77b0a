#!/usr/bin/env python3
"""Decompose the chain-resident vs resident gap at the bench config:
times the fused no-chain program, the fused chain program, and the chain
alone, all at batch 16, 768x1024, bf16 trunk, sync-last pattern."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import bench
    from mdir_tpu.models import initialize_model
    from mdir_tpu.ops.dtypes import resolve_compute_dtype, cast_f32_tree
    from mdir_tpu.data.transforms import initialize_transforms
    from mdir_tpu.ops.preprocess import chain_from_transform, \
        make_bucketed_chain
    from mdir_tpu.ops.clahe import clahe_bucket_aux, pack_clahe_aux, \
        unpack_clahe_aux
    from mdir_tpu.parallel.extract import _get_fused

    N, H, W = 16, 768, 1024
    model = initialize_model({
        "architecture": "cirnet", "cir_architecture": "resnet101",
        "local_whitening": False, "pooling": "gem", "regional": False,
        "whitening": False, "pretrained": False})
    mean_std = (model.meta["mean"], model.meta["std"])
    compute_dtype, _ = resolve_compute_dtype({})
    scales = (1, 1.0 / np.sqrt(2), 0.5)
    variables = cast_f32_tree(model.variables, compute_dtype)

    rng = np.random.RandomState(2)
    batch = jax.device_put(rng.randint(0, 256, (N, H, W, 3)).astype(np.uint8))
    args = bench._resident_args(model, mean_std, N, (H, W), scales)

    def timeit(label, fn, call, reps=6):
        out = fn(*call)
        np.asarray(jax.tree_util.tree_leaves(out)[0])  # compile+warm
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            outs = [fn(*call) for _ in range(reps)]
            np.asarray(jax.tree_util.tree_leaves(outs[-1])[0])
            best = min(best, (time.time() - t0) / reps)
        print("%-22s %7.1f ms/batch-%d  (%5.2f ms/img -> %6.1f img/s)"
              % (label, best * 1e3, N, best * 1e3 / N, N / best), flush=True)
        return best

    # no-chain resident (normalize on device)
    fused_plain = _get_fused(model.module, scales, False, True, compute_dtype)
    t_plain = timeit("fused plain", fused_plain, (variables,) + args)

    chain = chain_from_transform(initialize_transforms(
        "pil2np | apply_clahe | totensor | normalize", list(mean_std)))
    aux = tuple(jnp.asarray(a) for a in pack_clahe_aux(clahe_bucket_aux(
        [(H, W)] * N, (H, W), *chain.clahe_params)))
    fused_chain = _get_fused(model.module, scales, False, False,
                             compute_dtype, chain=chain)
    zero = jnp.zeros((0,), jnp.float32)
    call = (variables, batch, args[1], args[2], aux, None,
            jnp.float32(3.0), zero, zero, zero, zero)
    t_chain = timeit("fused chain", fused_chain, call)

    grid = chain.clahe_params[1]
    chain_fn = make_bucketed_chain(chain)
    alone = jax.jit(lambda b, a: jnp.sum(
        chain_fn(b, unpack_clahe_aux(*a, (H, W), grid)),
        dtype=jnp.float32))
    t_alone = timeit("chain alone (sum)", alone, (batch, aux))

    print("gap (chain fused - plain): %6.1f ms; chain alone %6.1f ms; "
          "unexplained %6.1f ms"
          % ((t_chain - t_plain) * 1e3, t_alone * 1e3,
             (t_chain - t_plain - t_alone) * 1e3), flush=True)


if __name__ == "__main__":
    main()
