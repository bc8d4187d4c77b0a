"""Database ranking and junk-aware mAP, vectorized for on-device execution.

Protocol parity with ``cirtorch/utils/evaluate.py``: trapezoidal AP over
positive positions with junk entries removed by rank-shifting, queries with no
positives excluded from the mean, the revisited E/M/H regrouping for
roxford5k/rparis6k, and precision@k. The per-rank while-loops of the
reference are re-derived as cumulative sums so the whole evaluation is a few
masked reductions — it runs identically under numpy or jax.numpy.

Ranking itself is one matmul over the HBM-resident descriptor database plus
an argsort (``rank_database``).
"""
import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def rank_database(vecs, qvecs):
    """vecs: (D, N) database, qvecs: (D, Q) queries -> ranks (N, Q).

    scores[n, q] = <db_n, q_q>; ranks column q lists db indices by descending
    score (matches ``np.argsort(-vecs.T @ qvecs, axis=0)``).
    """
    scores = jnp.dot(vecs.T, qvecs, precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    return jnp.argsort(-scores, axis=0)


def rank_database_sharded(vecs, qvecs, mesh):
    """Database-sharded ranking over a device mesh.

    The (D, N) descriptor database is split along N across the mesh's data
    axis (each chip scores its shard: one local matmul), queries are
    replicated, and XLA inserts the ICI all-gather the global argsort needs.
    This is the "shard the database matrix" scaling story of SURVEY §2.12
    for databases beyond one chip's HBM; results equal ``rank_database``.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = mesh.axis_names[0]
    n = vecs.shape[1]
    pad = -n % mesh.devices.size
    if pad:
        # pad with -inf-scoring columns so they rank last and slice away
        vecs = jnp.concatenate(
            [jnp.asarray(vecs),
             jnp.full((vecs.shape[0], pad), jnp.nan, vecs.dtype)], axis=1)
    db = jax.device_put(jnp.asarray(vecs), NamedSharding(mesh, P(None, axis)))
    q = jax.device_put(jnp.asarray(qvecs), NamedSharding(mesh, P()))

    ranks = _ranked_nan_last(db, q)
    # padded columns score -inf, so they occupy exactly the last rows
    return ranks[:n]


@jax.jit
def _ranked_nan_last(db, q):
    # module-level jit (a per-call closure would re-trace every validation
    # — expensive on a backend where compiles cost 15-300 s)
    scores = jnp.dot(db.T, q, precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    scores = jnp.where(jnp.isnan(scores), -jnp.inf, scores)
    return jnp.argsort(-scores, axis=0)


def _ap_from_masks(is_pos, is_junk, nres):
    """Vectorized trapezoidal AP for one query.

    is_pos/is_junk: (N,) boolean over rank positions; nres: #positives.
    Equivalent to compute_ap(junk-shifted positions, nres).
    """
    xp = jnp if isinstance(is_pos, jnp.ndarray) else np
    n = is_pos.shape[0]
    ranks_idx = xp.arange(n)
    junk_before = xp.cumsum(is_junk) - is_junk  # exclusive cumsum
    adj = ranks_idx - junk_before  # junk-shifted 0-based rank
    order = xp.cumsum(is_pos) - 1  # j: 0-based index among positives

    prec0 = xp.where(adj == 0, 1.0, order / xp.maximum(adj, 1))
    prec1 = (order + 1) / (adj + 1)
    contrib = xp.where(is_pos, (prec0 + prec1) / 2.0, 0.0)
    return contrib.sum() / nres


def _precision_at_k(is_pos, is_junk, kappas):
    """Vectorized precision@k on junk-shifted 1-based positions."""
    xp = jnp if isinstance(is_pos, jnp.ndarray) else np
    n = is_pos.shape[0]
    junk_before = xp.cumsum(is_junk) - is_junk
    pos1 = xp.arange(n) - junk_before + 1  # 1-based adjusted position
    max_pos = xp.max(xp.where(is_pos, pos1, 0))
    prs = []
    for kappa in kappas:
        kq = xp.minimum(max_pos, kappa)
        prs.append(xp.sum(is_pos & (pos1 <= kq)) / xp.maximum(kq, 1))
    return xp.stack(prs) if prs else xp.zeros((0,))


def compute_map(ranks, gnd, kappas=()):
    """mAP over queries with junk handling (protocol of evaluate.py:39-111).

    ranks: (db_size, nq) integer array; gnd: list of dicts with 'ok' and
    optional 'junk' arrays of db indices. Returns (map, aps, pr, prs).
    """
    ranks = np.asarray(ranks)
    db_size, nq = ranks.shape
    aps = np.full(nq, np.nan)
    prs = np.full((nq, len(kappas)), np.nan)
    nempty = 0

    for i in range(nq):
        ok = np.asarray(gnd[i]["ok"], dtype=np.int64).ravel()
        if ok.size == 0:
            nempty += 1
            continue
        junk = np.asarray(gnd[i].get("junk", []), dtype=np.int64).ravel()

        ok_mask = np.zeros(db_size, dtype=bool)
        ok_mask[ok] = True
        junk_mask = np.zeros(db_size, dtype=bool)
        if junk.size:
            junk_mask[junk] = True

        is_pos = ok_mask[ranks[:, i]]
        is_junk = junk_mask[ranks[:, i]]
        aps[i] = _ap_from_masks(is_pos, is_junk, ok.size)
        if kappas:
            prs[i] = np.asarray(_precision_at_k(is_pos, is_junk, list(kappas)))

    denom = max(nq - nempty, 1)
    mean_ap = np.nansum(aps) / denom if nq > nempty else 0.0
    pr = np.nansum(prs, axis=0) / denom if kappas else np.zeros(0)
    return mean_ap, aps, pr, prs


def compute_map_and_print(dataset, ranks, gnd, kappas=(1, 5, 10), printer=print):
    """Old ('ok') vs revisited (E/M/H) protocol dispatch (evaluate.py:114-152)."""
    if "ok" in gnd[0]:
        mean_ap, aps, _, _ = compute_map(ranks, gnd)
        printer(">> {}: mAP {:.2f}".format(dataset, np.around(mean_ap * 100, 2)))
        return {"map": mean_ap}, {"ap": aps}

    if dataset.startswith("roxford5k") or dataset.startswith("rparis6k"):
        def regroup(ok_keys, junk_keys):
            out = []
            for g in gnd:
                out.append({
                    "ok": np.concatenate([np.asarray(g[k]).ravel() for k in ok_keys]),
                    "junk": np.concatenate([np.asarray(g[k]).ravel() for k in junk_keys]),
                })
            return out

        map_e, aps_e, pr_e, _ = compute_map(ranks, regroup(["easy"], ["junk", "hard"]), kappas)
        map_m, aps_m, pr_m, _ = compute_map(ranks, regroup(["easy", "hard"], ["junk"]), kappas)
        map_h, aps_h, pr_h, _ = compute_map(ranks, regroup(["hard"], ["junk", "easy"]), kappas)

        printer(">> {}: mAP E: {}, M: {}, H: {}".format(
            dataset, np.around(map_e * 100, 2), np.around(map_m * 100, 2),
            np.around(map_h * 100, 2)))
        printer(">> {}: mP@k{} E: {}, M: {}, H: {}".format(
            dataset, list(kappas), np.around(pr_e * 100, 2),
            np.around(pr_m * 100, 2), np.around(pr_h * 100, 2)))
        return ({"map_easy": map_e, "map_medium": map_m, "map_hard": map_h},
                {"ap_easy": aps_e, "ap_medium": aps_m, "ap_hard": aps_h})

    raise ValueError("Unknown evaluation protocol for dataset %s" % dataset)
