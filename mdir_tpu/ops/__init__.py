"""TPU-native compute primitives: pooling, normalization, CLAHE, colorspace,
histogram matching, whitening, ranking/mAP.

Each op has a JAX implementation (jit/vmap/grad-compatible, TPU-first); the
parity-critical host preprocessing additionally has an exact numpy
implementation pinned to OpenCV semantics by tests.
"""
from . import clahe, colorspace, histogram, pooling, ranking, resize, whitening

__all__ = [
    "clahe", "colorspace", "histogram", "pooling", "ranking", "resize",
    "whitening",
]
