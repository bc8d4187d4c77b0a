"""Whitening stages: apply, learn Lw (with subset retry), learn PCA, paste.

Same stage contracts as ``mdir/stages/whiten.py`` — signatures
``stage(params, data) -> (metadata, *out)``, float64 host math, metadata
timing/stat keys, and the Lw behavior of retrying on shrinking random query
subsets when the difference covariance is not positive definite — built
around a shared timing/resource helper instead of per-stage boilerplate.
"""
import contextlib
import sys
import time

import numpy as np

from ..ops.whitening import pcawhitenlearn, whitenapply, whitenlearn
from ..tools import stats

LW_MAX_TRIALS = 100
LW_MAX_EXCLUDED = 0.95


@contextlib.contextmanager
def _timed(metadata, timing_key):
    """Fill ``metadata`` with {timings: {key}, resource_usage} around a block."""
    resources = stats.ResourceUsage()
    start = time.time()
    yield
    metadata["timings"] = {timing_key: round(time.time() - start, 2)}
    metadata["resource_usage"] = \
        resources.take_current_stats().get_resources()


def whiten(params, data):
    """Apply pre-computed whitening."""
    dimensions = params.pop("dimensions", None) or None
    assert not params, params.keys()
    whitening, names, values = data
    assert len(names) == len(values)

    metadata = {}
    with _timed(metadata, "whitening_apply"):
        whitened = np.asarray(
            whitenapply(values.T, whitening["m"], whitening["P"], dimensions))
    return metadata, names, whitened.T


def _lw_subset(qidxs, pidxs, trial):
    """Query/positive pairs for one Lw attempt: everything on trial 0, then
    random subsets shrinking linearly toward (1 - LW_MAX_EXCLUDED)."""
    if trial == 0:
        return qidxs, pidxs
    keep = int(len(qidxs) * (1 - trial / LW_MAX_TRIALS * LW_MAX_EXCLUDED))
    picked = np.random.permutation(len(qidxs))[:keep]
    print("Using subset of queries (%s/%s) trial %s"
          % (len(picked), len(qidxs), trial), file=sys.stderr)
    return qidxs[picked], pidxs[picked]


def learn_lw_whitening(params, data):
    """Learn Lw whitening with retry-on-non-PSD subset fallback."""
    assert not params
    names, values, queries, positives = data
    assert len(names) == len(values)
    assert len(queries) == len(positives)

    values = values.astype(np.float64).T
    name_index = {x: i for i, x in enumerate(names)}
    qidxs = np.array([name_index[x] for x in queries])
    pidxs = np.array([name_index[x] for x in positives])

    metadata = {}
    with _timed(metadata, "whitening_learn"):
        for trial in range(LW_MAX_TRIALS):
            qwhit, pwhit = _lw_subset(qidxs, pidxs, trial)
            try:
                whit_m, whit_p = whitenlearn(values, qwhit, pwhit)
                break
            except np.linalg.LinAlgError as exc:
                if "positive definite" not in str(exc) \
                        or trial >= LW_MAX_TRIALS - 1:
                    raise

    metadata["stats"] = {
        "failed_times": trial,
        "vectors_used": round(len(qwhit) / float(len(qidxs)), 2),
        "vectors_total": len(qidxs),
    }
    return metadata, {"m": whit_m, "P": whit_p}


def learn_pca_whitening(params, data):
    """Learn PCA whitening."""
    shrink = params.pop("shrink", None) or None
    assert not params
    values, = data

    metadata = {}
    with _timed(metadata, "whitening_learn"):
        whit_m, whit_p = pcawhitenlearn(values.astype(np.float64).T, shrink)
    return metadata, {"m": whit_m, "P": whit_p}


def _pca_project(value, dimensions):
    """Project onto the top eigenvectors of the (centered) gram matrix."""
    centered = value - np.mean(value)
    eigval, eigvec = np.linalg.eig(centered.T.dot(centered))
    top = eigvec[:, np.argsort(eigval)[-dimensions:]]
    return centered.dot(top.dot(top.T))


def paste_pca_normalize(params, data):
    """Concatenate vectors horizontally, optional PCA reduction, L2 normalize."""
    dimensions = params.pop("dimensions") or None
    assert not params
    assert len(set(len(x) for x in data)) == 1

    if data[0].shape == (0,):
        return {}, data[0]

    value = np.concatenate(data, axis=1)
    metadata = {}
    if dimensions:
        with _timed(metadata, "pca_compute"):
            value = _pca_project(value, dimensions)

    value = value / np.expand_dims(np.linalg.norm(value, axis=1), axis=1)
    return metadata, value
