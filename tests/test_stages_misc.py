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
