"""mAP protocol parity: vectorized compute_map vs a direct transcription of
the reference's loop-based algorithm (evaluate.py:3-111)."""
import numpy as np
import pytest

from mdir_tpu.ops import ranking


def _reference_compute_ap(ranks, nres):
    nimgranks = len(ranks)
    ap = 0.0
    recall_step = 1.0 / nres
    for j in range(nimgranks):
        rank = ranks[j]
        precision_0 = 1.0 if rank == 0 else float(j) / rank
        precision_1 = float(j + 1) / (rank + 1)
        ap += (precision_0 + precision_1) * recall_step / 2.0
    return ap


def _reference_compute_map(ranks, gnd, kappas=()):
    mean_ap = 0.0
    nq = len(gnd)
    aps = np.zeros(nq)
    pr = np.zeros(len(kappas))
    prs = np.zeros((nq, len(kappas)))
    nempty = 0
    for i in range(nq):
        qgnd = np.array(gnd[i]["ok"])
        if qgnd.shape[0] == 0:
            aps[i] = float("nan")
            prs[i, :] = float("nan")
            nempty += 1
            continue
        try:
            qgndj = np.array(gnd[i]["junk"])
        except KeyError:
            qgndj = np.empty(0)
        pos = np.arange(ranks.shape[0])[np.isin(ranks[:, i], qgnd)]
        junk = np.arange(ranks.shape[0])[np.isin(ranks[:, i], qgndj)]
        k = 0
        ij = 0
        if len(junk):
            ip = 0
            while ip < len(pos):
                while ij < len(junk) and pos[ip] > junk[ij]:
                    k += 1
                    ij += 1
                pos[ip] = pos[ip] - k
                ip += 1
        ap = _reference_compute_ap(pos, len(qgnd))
        mean_ap += ap
        aps[i] = ap
        pos += 1
        for j, kappa in enumerate(kappas):
            kq = min(max(pos), kappa)
            prs[i, j] = (pos <= kq).sum() / kq
        pr = pr + prs[i, :]
    mean_ap = mean_ap / (nq - nempty)
    pr = pr / (nq - nempty)
    return mean_ap, aps, pr, prs


def _random_gnd(rng, db_size, nq, with_junk=True):
    gnd = []
    for _ in range(nq):
        n_ok = rng.randint(0, 8)
        perm = rng.permutation(db_size)
        ok = perm[:n_ok]
        junk = perm[n_ok:n_ok + rng.randint(0, 6)] if with_junk else []
        gnd.append({"ok": np.array(ok), "junk": np.array(junk)})
    return gnd


@pytest.mark.parametrize("with_junk", [True, False])
@pytest.mark.parametrize("seed", range(10))
def test_compute_map_matches_reference(with_junk, seed):
    rng = np.random.RandomState(seed)
    db_size, nq = 50, 12
    scores = rng.rand(db_size, nq)
    ranks = np.argsort(-scores, axis=0)
    gnd = _random_gnd(rng, db_size, nq, with_junk)
    kappas = (1, 5, 10)

    ref = _reference_compute_map(ranks, gnd, kappas)
    ours = ranking.compute_map(ranks, gnd, kappas)

    np.testing.assert_allclose(ref[0], ours[0], rtol=1e-12)
    np.testing.assert_allclose(ref[1], ours[1], rtol=1e-12)
    np.testing.assert_allclose(ref[2], ours[2], rtol=1e-12)


def test_rank_database_matches_numpy(rng):
    vecs = rng.rand(8, 30).astype(np.float32)
    qvecs = rng.rand(8, 7).astype(np.float32)
    ref = np.argsort(-np.dot(vecs.T, qvecs), axis=0)
    ours = np.asarray(ranking.rank_database(vecs, qvecs))
    scores = np.dot(vecs.T, qvecs)
    # argsort ties can differ; compare via scores ordering
    for q in range(7):
        np.testing.assert_allclose(scores[ref[:, q], q], scores[ours[:, q], q])


def test_revisited_protocol(rng):
    db_size, nq = 40, 6
    ranks = np.argsort(-rng.rand(db_size, nq), axis=0)
    gnd = []
    for _ in range(nq):
        perm = rng.permutation(db_size)
        gnd.append({"easy": perm[:3], "hard": perm[3:6], "junk": perm[6:9]})
    averages, scores = ranking.compute_map_and_print(
        "roxford5k", ranks, gnd, printer=lambda *_: None)
    assert set(averages) == {"map_easy", "map_medium", "map_hard"}
    assert all(0 <= v <= 1 for v in averages.values())
    # medium protocol = easy+hard positives; check against reference impl
    gnd_m = [{"ok": np.concatenate([g["easy"], g["hard"]]), "junk": g["junk"]}
             for g in gnd]
    ref_m = _reference_compute_map(ranks, gnd_m)[0]
    np.testing.assert_allclose(averages["map_medium"], ref_m, rtol=1e-12)


def test_rank_database_sharded_equals_single():
    """Database-sharded ranking over the 8-device mesh == single-device,
    including a database size that does not divide the mesh."""
    import jax.numpy as jnp

    from mdir_tpu.ops.ranking import rank_database, rank_database_sharded
    from mdir_tpu.parallel.mesh import make_mesh

    rng = np.random.RandomState(0)
    for n in (64, 61):  # divisible and padded cases
        vecs = rng.randn(32, n).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=0, keepdims=True)
        qvecs = rng.randn(32, 5).astype(np.float32)
        qvecs /= np.linalg.norm(qvecs, axis=0, keepdims=True)
        single = np.asarray(rank_database(jnp.asarray(vecs),
                                          jnp.asarray(qvecs)))
        sharded = np.asarray(rank_database_sharded(vecs, qvecs, make_mesh(8)))
        np.testing.assert_array_equal(single, sharded)
