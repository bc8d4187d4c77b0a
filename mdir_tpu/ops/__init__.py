"""TPU-native compute primitives: pooling, normalization, CLAHE, colorspace,
histogram matching, whitening, ranking/mAP.

Each op has a JAX implementation (jit/vmap/grad-compatible, TPU-first); the
parity-critical host preprocessing additionally has an exact numpy
implementation pinned to OpenCV semantics by tests.
"""
from . import clahe, colorspace, histogram, pooling, ranking, resize, whitening

__all__ = [
    "clahe", "colorspace", "histogram", "pooling", "ranking", "resize",
    "whitening", "pooling_pallas", "clahe_pallas",
]


def __getattr__(name):
    # Pallas kernels import lazily (pull in jax.experimental.pallas)
    if name in ("pooling_pallas", "clahe_pallas"):
        import importlib

        module = importlib.import_module("." + name, __name__)
        globals()[name] = module
        return module
    raise AttributeError(name)
