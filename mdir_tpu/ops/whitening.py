"""Descriptor whitening: apply on device (JAX), learn on host (float64).

Semantics pinned to ``cirtorch/utils/whiten.py``: descriptors are D x N
column matrices; ``whitenapply`` projects P[:dims]·(X−m) and L2-normalizes
columns; ``whitenlearn`` (Lw) whitens by the covariance of query−positive
difference vectors (Cholesky-inverse) then rotates by the eigenbasis of the
projected data; ``pcawhitenlearn`` with optional Arun shrinkage. The Cholesky
retries with a growing diagonal jitter.
"""
import jax
import jax.numpy as jnp
import numpy as np


def whitenapply(X, m, P, dimensions=None):
    """Whiten D x N columns: P[:dims]·(X−m), then column L2-norm (+1e-6)."""
    if not dimensions:
        dimensions = P.shape[0]
    X = jnp.dot(jnp.asarray(P)[:dimensions, :], jnp.asarray(X) - jnp.asarray(m),
                precision=jax.lax.Precision.HIGHEST)
    norms = jnp.linalg.norm(X, ord=2, axis=0, keepdims=True)
    return X / (norms + 1e-6)


def whitenapply_rows(vecs, m, P, dimensions=None):
    """Row-major convenience: (N, D) in, (N, dims) out."""
    return whitenapply(jnp.asarray(vecs).T, m, P, dimensions).T


def robust_cholesky(S):
    """Cholesky with escalating diagonal jitter until positive definite."""
    alpha = 0.0
    while True:
        try:
            return np.linalg.cholesky(S + alpha * np.eye(*S.shape))
        except np.linalg.LinAlgError:
            alpha = 1e-10 if alpha == 0 else alpha * 10
            if alpha > 1e6:
                raise


def whitenlearn(X, qidxs, pidxs):
    """Learn Lw whitening from D x N data and query/positive index pairs."""
    X = np.asarray(X, dtype=np.float64)
    m = X[:, qidxs].mean(axis=1, keepdims=True)
    df = X[:, qidxs] - X[:, pidxs]
    S = np.dot(df, df.T) / df.shape[1]
    P = np.linalg.inv(robust_cholesky(S))
    df = np.dot(P, X - m)
    D = np.dot(df, df.T)
    eigval, eigvec = np.linalg.eig(D)
    order = eigval.argsort()[::-1]
    eigvec = eigvec[:, order]
    P = np.dot(eigvec.T, P)
    return m, P


def pcawhitenlearn(X, shrink=None):
    """Learn PCA whitening from D x N data (optional Arun shrinkage)."""
    X = np.asarray(X, dtype=np.float64)
    n = X.shape[1]
    m = X.mean(axis=1, keepdims=True)
    Xc = X - m
    cov = np.dot(Xc, Xc.T)
    cov = (cov + cov.T) / (2 * n)
    eigval, eigvec = np.linalg.eig(cov)
    order = eigval.argsort()[::-1]
    eigval = eigval[order]
    eigvec = eigvec[:, order]
    if shrink:
        b = eigval[shrink - 1]
        eigval = (1 - b) * eigval + b
    P = np.dot(np.linalg.inv(np.sqrt(np.diag(eigval))), eigvec.T)
    return m, P
