"""Histogram matching and gamma equalization of lightness channels.

Parity with reference ``functional.py:55-97``: 256-bin histograms over
[-0.5/255, 1+0.5/255], CDF matching against a stored reference CDF (the
``f3d_lab`` table, a published data artifact of the reference shipped here as
``_hist_f3d_lab.npy``), channel-to-channel matching, and gamma root-finding so
that mean(L^gamma) hits a target.

Both numpy (host, exact) and JAX (in-graph) implementations are provided; the
JAX gamma solver is a fixed-iteration Newton (jit-friendly).
"""
import os

import jax.numpy as jnp
import numpy as np

HISTOGRAM_BINS = np.linspace(-0.00196078431372549, 1.0019607843137255, 257)
HISTOGRAM_CENTERS = np.linspace(0, 1, 256)

_HIST_F3D_LAB = np.load(os.path.join(os.path.dirname(__file__), "_hist_f3d_lab.npy"))
HISTOGRAM_CDF = {
    "f3d_lab": np.cumsum(_HIST_F3D_LAB),
}


def channel_histogram_matching(chan, histogram):
    """Match channel's CDF to a named reference CDF, or 'eq' for equalization."""
    cdf = np.cumsum(np.histogram(chan, HISTOGRAM_BINS)[0]) / chan.size
    centers = HISTOGRAM_CENTERS
    if histogram == "eq":
        return np.interp(chan, centers, cdf * centers[-1]).astype(np.float32)
    return np.interp(
        chan, centers, np.interp(cdf, HISTOGRAM_CDF[histogram], centers)
    ).astype(np.float32)


def channel2channel_histogram_matching(chan0, chan1):
    """Match chan0's histogram to chan1's."""
    cdf0 = np.cumsum(np.histogram(chan0, HISTOGRAM_BINS)[0]) / chan0.size
    cdf1 = np.cumsum(np.histogram(chan1, HISTOGRAM_BINS)[0]) / chan1.size
    return np.interp(
        chan0, HISTOGRAM_CENTERS, np.interp(cdf0, cdf1, HISTOGRAM_CENTERS)
    ).astype(np.float32)


def channel_gamma_matching(channel, target):
    """Find gamma s.t. mean(channel**gamma) == target (Newton, scipy host path)."""
    import warnings

    import scipy.optimize

    func = lambda gamma: np.mean(np.power(channel, gamma)) - target
    x0 = np.log(target) / np.log(np.mean(channel))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        try:
            solution = scipy.optimize.newton(func, x0=x0, tol=1e-4, maxiter=50)
        except RuntimeError:
            solution = 0.1 if abs(func(0.1)) < abs(func(10)) else 10
    solution = np.clip(solution, 0.1, 10)
    return np.power(channel, solution)


# ---------------------------------------------------------------------------
# JAX implementations
# ---------------------------------------------------------------------------

def _histogram_cdf_jax(chan):
    bins = jnp.asarray(HISTOGRAM_BINS)
    hist, _ = jnp.histogram(chan.ravel(), bins=bins)
    return jnp.cumsum(hist) / chan.size


def channel_histogram_matching_jax(chan, histogram):
    cdf = _histogram_cdf_jax(chan)
    centers = jnp.asarray(HISTOGRAM_CENTERS)
    if histogram == "eq":
        return jnp.interp(chan, centers, cdf * centers[-1]).astype(jnp.float32)
    ref_cdf = jnp.asarray(HISTOGRAM_CDF[histogram])
    mapped = jnp.interp(cdf, ref_cdf, centers)
    return jnp.interp(chan, centers, mapped).astype(jnp.float32)


def channel2channel_histogram_matching_jax(chan0, chan1):
    cdf0 = _histogram_cdf_jax(chan0)
    cdf1 = _histogram_cdf_jax(chan1)
    centers = jnp.asarray(HISTOGRAM_CENTERS)
    return jnp.interp(chan0, centers, jnp.interp(cdf0, cdf1, centers)).astype(jnp.float32)


def channel_gamma_matching_jax(channel, target, iters=25):
    """Fixed-iteration Newton on gamma, jit-friendly. Matches the host solver
    to its 1e-4 tolerance on well-behaved inputs."""
    logc = jnp.where(channel > 0, jnp.log(jnp.maximum(channel, 1e-30)), 0.0)

    def body(gamma, _):
        powed = jnp.power(channel, gamma)
        f = jnp.mean(powed) - target
        fprime = jnp.mean(powed * logc)
        new = gamma - f / jnp.where(jnp.abs(fprime) < 1e-12, 1e-12, fprime)
        return jnp.clip(new, 0.05, 20.0), None

    import jax

    x0 = jnp.log(target) / jnp.log(jnp.maximum(jnp.mean(channel), 1e-30))
    x0 = jnp.clip(x0, 0.05, 20.0)
    gamma, _ = jax.lax.scan(body, x0, None, length=iters)
    gamma = jnp.clip(gamma, 0.1, 10.0)
    return jnp.power(channel, gamma)
