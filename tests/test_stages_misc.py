"""Whitening stages: apply / learn Lw (with retry) / PCA / paste."""
import numpy as np
import pytest

from mdir_tpu.stages import whiten as whiten_stage


def test_whiten_apply(rng):
    D, N = 8, 20
    values = rng.rand(N, D)
    names = ["n%d" % i for i in range(N)]
    whitening = {"m": rng.rand(D, 1), "P": rng.rand(D, D)}
    metadata, out_names, out = whiten_stage.whiten(
        {"dimensions": 4}, (whitening, names, values))
    assert out.shape == (N, 4)
    assert out_names == names
    norms = np.linalg.norm(out, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_learn_lw_whitening(rng):
    D, N = 6, 50
    names = ["n%d" % i for i in range(N)]
    values = rng.rand(N, D).astype(np.float32)
    queries = names[:20]
    positives = names[20:40]
    metadata, lw = whiten_stage.learn_lw_whitening(
        {}, (names, values, queries, positives))
    assert set(lw.keys()) == {"m", "P"}
    assert lw["P"].shape == (D, D)
    assert metadata["stats"]["failed_times"] == 0


def test_learn_pca_whitening(rng):
    values = rng.rand(40, 6)
    metadata, pca = whiten_stage.learn_pca_whitening({"shrink": 3}, (values,))
    assert pca["P"].shape == (6, 6)


def test_paste_pca_normalize(rng):
    a = rng.rand(10, 4)
    b = rng.rand(10, 4)
    metadata, out = whiten_stage.paste_pca_normalize({"dimensions": 3}, (a, b))
    assert out.shape == (10, 8)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-6)

    metadata, out = whiten_stage.paste_pca_normalize({"dimensions": None}, (a, b))
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-6)


def test_learn_lw_whitening_retry_on_non_psd(rng, monkeypatch):
    """The Lw retry path: a non-positive-definite failure retries on a
    shrinking random query subset (reference stages/whiten.py Lw fallback);
    metadata records the failed trials and the subset fraction used."""
    D, N = 6, 50
    names = ["n%d" % i for i in range(N)]
    values = rng.rand(N, D).astype(np.float32)
    queries, positives = names[:20], names[20:40]

    real = whiten_stage.whitenlearn
    calls = {"n": 0}

    def flaky(vecs, qidxs, pidxs):
        calls["n"] += 1
        if calls["n"] == 1:
            raise np.linalg.LinAlgError("Matrix is not positive definite")
        return real(vecs, qidxs, pidxs)

    monkeypatch.setattr(whiten_stage, "whitenlearn", flaky)
    np.random.seed(0)
    metadata, lw = whiten_stage.learn_lw_whitening(
        {}, (names, values, queries, positives))
    assert metadata["stats"]["failed_times"] == 1
    assert metadata["stats"]["vectors_used"] < 1.0
    assert lw["P"].shape == (D, D)

    # a non-PSD-unrelated LinAlgError re-raises immediately
    def hard_fail(vecs, qidxs, pidxs):
        raise np.linalg.LinAlgError("Singular matrix")

    monkeypatch.setattr(whiten_stage, "whitenlearn", hard_fail)
    with pytest.raises(np.linalg.LinAlgError):
        whiten_stage.learn_lw_whitening(
            {}, (names, values, queries, positives))


def test_checkpoint_roll_relative_directory_keeps_best(tmp_path, monkeypatch):
    """Rolling checkpoints under a RELATIVE checkpoint directory must rescue
    the best epoch's weights, not delete them.

    Regression (data loss, inherited from the reference checkpoints.py:100):
    the victim path was compared unresolved against best.resolve(), so with
    a relative directory the rescue branch never fired — the best weights
    were unlinked and net_bestsofar left dangling."""
    from mdir_tpu.learning.checkpoints import (Checkpoints, SUFFIX_BEST,
                                               SUFFIX_BEST_SO_FAR)

    monkeypatch.chdir(tmp_path)
    ckpt = Checkpoints("exp_rel", store_every=0, checkpoint_every=1)

    def state(tag):
        return {"net": {"frozen": False, "tag": tag}}

    # epoch 0 is best; epoch 1 is not (epoch 0 must be rescued when rolled)
    ckpt.save_epoch(state("e0"), {"t": 0}, 0, is_best=True, is_last=False)
    ckpt.save_epoch(state("e1"), {"t": 1}, 1, is_best=False, is_last=True)

    best = ckpt.directory / ("net" + SUFFIX_BEST)
    assert best.exists(), "best checkpoint lost on roll"
    from mdir_tpu.learning.checkpoints import load_checkpoint_any
    assert load_checkpoint_any(best)["tag"] == "e0"
    assert not (ckpt.directory / ("net" + SUFFIX_BEST_SO_FAR)).exists()


def test_save_notrain_rerun_refreshes_role_links(tmp_path):
    """Re-running an epochs==0 train stage into the same directory must
    refresh net_best/net_last instead of FileExistsError."""
    from mdir_tpu.learning.checkpoints import Checkpoints, SUFFIX_BEST

    ckpt = Checkpoints(str(tmp_path / "exp"), store_every=0,
                       checkpoint_every=1)
    ckpt.save_notrain({"net": {"frozen": False, "tag": "a"}})
    ckpt.save_notrain({"net": {"frozen": False, "tag": "b"}})
    from mdir_tpu.learning.checkpoints import load_checkpoint_any
    assert load_checkpoint_any(ckpt.directory / ("net" + SUFFIX_BEST))[
        "tag"] == "b"
