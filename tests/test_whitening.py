"""Whitening algebra parity vs the reference numpy formulas."""
import numpy as np

from mdir_tpu.ops import whitening


def _reference_whitenapply(X, m, P, dimensions=None):
    if not dimensions:
        dimensions = P.shape[0]
    X = np.dot(P[:dimensions, :], X - m)
    X = X / (np.linalg.norm(X, ord=2, axis=0, keepdims=True) + 1e-6)
    return X


def test_whitenapply(rng):
    X = rng.rand(16, 40)
    m = rng.rand(16, 1)
    P = rng.rand(16, 16)
    ref = _reference_whitenapply(X, m, P)
    ours = np.asarray(whitening.whitenapply(X, m, P))
    # device path runs float32; reference is float64
    np.testing.assert_allclose(ref, ours, rtol=1e-5, atol=1e-6)
    ref8 = _reference_whitenapply(X, m, P, 8)
    ours8 = np.asarray(whitening.whitenapply(X, m, P, 8))
    np.testing.assert_allclose(ref8, ours8, rtol=1e-5, atol=1e-6)


def test_whitenlearn_whitens_differences(rng):
    D, N = 8, 200
    X = rng.rand(D, N)
    qidxs = np.arange(0, 100)
    pidxs = np.arange(100, 200)
    m, P = whitening.whitenlearn(X, qidxs, pidxs)
    # After projection, the difference covariance must be (near) identity-like
    df = np.dot(P, X[:, qidxs] - X[:, pidxs])
    S = df @ df.T / df.shape[1]
    # Lw: P = eig-rotation of Cholesky-inverse; difference covariance becomes
    # diagonal (rotation of whitened space)
    off_diag = S - np.diag(np.diag(S))
    assert np.abs(off_diag).max() < 1e-6


def test_pcawhitenlearn_decorrelates(rng):
    D, N = 6, 500
    A = rng.rand(D, D)
    X = A @ rng.randn(D, N)
    m, P = whitening.pcawhitenlearn(X)
    Y = P @ (X - m)
    cov = Y @ Y.T / N
    np.testing.assert_allclose(cov, np.eye(D), atol=1e-6)


def test_robust_cholesky_jitter():
    S = np.zeros((4, 4))  # singular -> needs jitter
    L = whitening.robust_cholesky(S)
    assert np.isfinite(L).all()


def test_whitenapply_rows_matches_columns():
    """Row-major convenience wrapper == the column-major reference apply."""
    import jax.numpy as jnp

    from mdir_tpu.ops.whitening import whitenapply, whitenapply_rows

    rng = np.random.RandomState(0)
    vecs = rng.rand(5, 8).astype(np.float32)
    m = rng.rand(8, 1).astype(np.float32)
    P = rng.rand(8, 8).astype(np.float32)
    rows = np.asarray(whitenapply_rows(vecs, m, P, dimensions=4))
    cols = np.asarray(whitenapply(jnp.asarray(vecs.T), m, P, dimensions=4))
    np.testing.assert_allclose(rows, cols.T, rtol=1e-6)
