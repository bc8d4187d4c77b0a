"""Weight initialization schemes applied to parameter pytrees.

Parity with ``mdir/components/model/weight_initialization.py``: ``normal``
(std-1 normal on conv weight and bias), ``normal_p2p`` (pix2pix: std 0.02 on
conv/linear weights, zero bias, BN weight N(1, 0.02)), ``he_normal`` (fan-in
He on conv/linear weights, bias 0.01).

Applied post-init by walking the param pytree: leaf roles are inferred from
their path (kernel vs bias vs BN scale).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np


def _fan_in(shape):
    # HWIO conv kernel: receptive * in; Dense: (in, out)
    if len(shape) == 4:
        return shape[0] * shape[1] * shape[2]
    if len(shape) == 2:
        return shape[0]
    return shape[0] if shape else 1


def _walk(params, fn, path=()):
    if isinstance(params, dict):
        return {k: _walk(v, fn, path + (k,)) for k, v in params.items()}
    return fn(path, params)


def _is_bn(path):
    return any(p == "bn" or p.startswith("bn") for p in path[-2:-1]) or "bn" in path


def init_normal(rng, params):
    """N(0,1) on conv kernels and biases (reference init_weights_normal —
    convs only)."""
    keys = iter(jax.random.split(rng, 4096))

    def fn(path, leaf):
        if _is_bn(path):
            return leaf
        if path[-1] in ("kernel", "bias") and len(leaf.shape) in (1, 4):
            return jax.random.normal(next(keys), leaf.shape, leaf.dtype)
        return leaf

    return _walk(params, fn)


def init_normal_p2p(rng, params):
    """pix2pix init: weights N(0, 0.02), bias 0; BN scale N(1, 0.02), bias 0."""
    keys = iter(jax.random.split(rng, 4096))

    def fn(path, leaf):
        if _is_bn(path):
            if path[-1] == "scale":
                return 1.0 + 0.02 * jax.random.normal(next(keys), leaf.shape, leaf.dtype)
            if path[-1] == "bias":
                return jnp.zeros_like(leaf)
            return leaf
        if path[-1] == "kernel":
            return 0.02 * jax.random.normal(next(keys), leaf.shape, leaf.dtype)
        if path[-1] == "bias":
            return jnp.zeros_like(leaf)
        return leaf

    return _walk(params, fn)


def init_he_normal(rng, params):
    """He-normal weights, const-0.01 biases (better than 0 before ReLU)."""
    keys = iter(jax.random.split(rng, 4096))

    def fn(path, leaf):
        if _is_bn(path):
            return leaf
        if path[-1] == "kernel":
            std = math.sqrt(2.0 / _fan_in(leaf.shape))
            return std * jax.random.normal(next(keys), leaf.shape, leaf.dtype)
        if path[-1] == "bias":
            return jnp.full_like(leaf, 0.01)
        return leaf

    return _walk(params, fn)


WEIGHT_INITIALIZATIONS = {
    "normal": init_normal,
    "normal_p2p": init_normal_p2p,
    "he_normal": init_he_normal,
}
