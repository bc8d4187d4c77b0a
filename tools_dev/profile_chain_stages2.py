#!/usr/bin/env python3
"""Per-stage resident cost of the device CLAHE chain, overhead-amortized.

The v1 profiler timed single dispatches with a slice readback per rep; on
axon that readback is its own un-jitted dispatch costing ~30 ms, swamping
elementwise stages. Here each stage is timed as ``reps`` back-to-back
dispatches synced once at the end (the bench.py resident pattern), with a
null-program baseline to show the residual fixed cost.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def bench(fn, *args, reps=8):
    """Times ``reps`` pipelined dispatches of ``fn`` synced via a scalar
    output. The scalar sum is fused into the same program (so each rep's
    host sync transfers 4 bytes), at the cost of eliding the final HBM
    write of the full output — report alongside the null floor."""
    import jax.numpy as jnp

    probe = jax.jit(lambda *a: sum(
        jnp.sum(leaf.astype(jnp.float32))
        for leaf in jax.tree_util.tree_leaves(fn(*a))))
    np.asarray(probe(*args))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        outs = [probe(*args) for _ in range(reps)]
        # device execution is serial: the last scalar being ready implies
        # all reps finished. One host read = one tunnel RTT total (~25 ms),
        # amortized over reps instead of paid per rep.
        np.asarray(outs[-1])
        best = min(best, (time.time() - t0) / reps)
    return best


def main():
    global jax
    import jax
    import jax.numpy as jnp
    from mdir_tpu.data.transforms import initialize_transforms
    from mdir_tpu.ops.preprocess import chain_from_transform, \
        make_bucketed_chain
    from mdir_tpu.ops.clahe import clahe_bucket_aux, pack_clahe_aux, \
        unpack_clahe_aux, clahe_u8_bucketed_jax, HIST_SIZE, _hist_dynamic, \
        _luts_dynamic
    from mdir_tpu.ops import lab_trilinear as lt
    from mdir_tpu.ops import colorspace as cs

    N, H, W = (int(a) for a in sys.argv[1:4]) if len(sys.argv) > 3 \
        else (8, 768, 1024)
    mean_std = ([0.485, 0.456, 0.406], [0.229, 0.224, 0.225])
    chain = chain_from_transform(initialize_transforms(
        "pil2np | apply_clahe | totensor | normalize", list(mean_std)))
    rng = np.random.RandomState(0)
    batch = jax.device_put(rng.randint(0, 256, (N, H, W, 3)).astype(np.uint8))
    aux_h = pack_clahe_aux(clahe_bucket_aux([(H, W)] * N, (H, W),
                                            *chain.clahe_params))
    aux = tuple(jnp.asarray(a) for a in aux_h)
    grid = chain.clahe_params[1]

    null = jax.jit(lambda b: b[0, 0, 0, 0].astype(jnp.int32) + 1)
    print("null program   : %7.2f ms  (fixed dispatch+sync floor)"
          % (bench(null, batch) * 1e3), flush=True)

    chain_fn = make_bucketed_chain(chain)
    full = jax.jit(lambda b, a: chain_fn(b, unpack_clahe_aux(*a, (H, W),
                                                             grid)))
    t_full = bench(full, batch, aux)
    print("chain_fn full  : %7.2f ms (%5.2f ms/img)"
          % (t_full * 1e3, t_full * 1e3 / N), flush=True)

    t = bench(jax.jit(lambda b: lt.lab_chan_jax(b)), batch)
    print("lab_chan (l+ab): %7.2f ms" % (t * 1e3), flush=True)

    t = bench(jax.jit(lambda b: lt.lab_l_u8_jax(b)), batch)
    print("lab_l only     : %7.2f ms" % (t * 1e3), flush=True)

    l_u8 = jax.jit(lambda b: lt.lab_chan_jax(b)[0])(batch)
    np.asarray(l_u8[:1, :1, 0])
    clahe = jax.jit(lambda l, a: clahe_u8_bucketed_jax(
        l, unpack_clahe_aux(*a, (H, W), grid), grid))
    print("clahe bucketed : %7.2f ms" % (bench(clahe, l_u8, aux) * 1e3),
          flush=True)

    # clahe split: hist+luts only vs interp only
    gh, gw = grid

    def luts_only(l, a):
        a = unpack_clahe_aux(*a, (H, W), grid)

        def tile_luts(vals, row_src, col_src, row_tile, col_tile, clim, sc):
            padded = jnp.take(jnp.take(vals, row_src, 0), col_src, 1)
            hist = _hist_dynamic(padded, row_tile, col_tile, gh, gw, chunk=1)
            return _luts_dynamic(hist.reshape(gh * gw, HIST_SIZE), clim, sc)

        return jax.vmap(tile_luts)(l, a["row_src"], a["col_src"],
                                   a["row_tile"], a["col_tile"], a["clim"],
                                   a["scale"])

    print("  hist+luts    : %7.2f ms" % (bench(jax.jit(luts_only), l_u8,
                                                aux) * 1e3), flush=True)

    chan = clahe(l_u8, aux)
    np.asarray(chan[:1, :1, 0])
    ab = jnp.zeros((N, H, W, 2), jnp.float32)
    inv = jax.jit(lambda c, a: cs.normspace2rgb(
        jnp.concatenate([c[..., None] / 255.0, a], -1), "lab"))
    print("inverse lab2rgb: %7.2f ms" % (bench(inv, chan.astype(jnp.float32),
                                               ab) * 1e3), flush=True)

    pw = jax.jit(lambda c, a: (jnp.concatenate([c[..., None], a], -1)
                               ** (1 / 2.4)))
    print("  pow alone    : %7.2f ms" % (bench(pw, chan.astype(jnp.float32),
                                               ab) * 1e3), flush=True)


if __name__ == "__main__":
    main()
