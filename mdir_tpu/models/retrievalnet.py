"""ImageRetrievalNet: trunk -> (lwhiten) -> pool -> L2N -> (whiten) -> L2N.

Functional parity with ``cirtorch/networks/imageretrievalnet.py:82-135``:
same component order, GeM's learnable ``p`` (a real parameter, trained with
10x lr and no weight decay via the optimizer param groups), optional local /
regional / global whitening linear layers. Output is (N, D) row vectors; the
reference's D x N column convention is produced at the Network wrapper
boundary where its losses/whitening consume it.

Supports batched static-shape extraction through the trunk's ``valid_hw``
masking (exact equivalence with native-shape forward; see trunks.py).
"""
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops import pooling as pool_ops
from .layers import Dense
from .trunks import OUTPUT_DIM, TOTAL_STRIDE, feature_mask, make_trunk


class GeMPool(nn.Module):
    """GeM with learnable p (cirtorch GeM layer; param path pool/p)."""
    p_init: float = 3.0
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x, mask=None):
        p = self.param("p", lambda key: jnp.full((1,), self.p_init))
        return pool_ops.gem(x, p=p[0], eps=self.eps, mask=mask)


class GeMPoolL2NPallas(nn.Module):
    """Fused masked GeM + L2N (single pass over the feature map; Pallas on
    TPU, jnp fallback elsewhere). Same param path pool/p as GeMPool, so
    checkpoints interoperate."""
    p_init: float = 3.0
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x, valid_hw):
        from ..ops.pooling_pallas import fused_gem_l2n

        p = self.param("p", lambda key: jnp.full((1,), self.p_init))
        return fused_gem_l2n(x, valid_hw, p[0], eps=self.eps)


class ImageRetrievalNet(nn.Module):
    architecture: str = "resnet101"
    local_whitening: bool = False
    pooling: str = "gem"
    regional: bool = False
    whitening: bool = False
    frozen_bn: bool = True
    p_init: float = 3.0
    # eval-path kernel choice: fuse masked GeM+L2N into one Pallas pass
    # (extraction programs only — the kernel has no autodiff rule, so the
    # training apply keeps the XLA composition; see parallel/extract.py)
    pallas_pool: bool = False
    # mixed-precision seam: cast the trunk's output features to this dtype
    # before lwhiten/pool/L2N/whiten. The training step clones the module
    # with head_dtype="float32" so a bf16 trunk feeds an f32 head — the
    # contrastive loss's margin arithmetic and the L2 normalizations stay
    # full-precision while the conv FLOPs ride the MXU's native dtype.
    head_dtype: Optional[str] = None

    @property
    def out_channels(self):
        return OUTPUT_DIM[self.architecture]

    @property
    def total_stride(self):
        return TOTAL_STRIDE[self.architecture]

    @nn.compact
    def __call__(self, x, valid_hw=None, region_boxes=None):
        """x: (N, H, W, C) -> (N, D) L2-normalized descriptors.

        ``region_boxes`` (N, R, 4) int32 [y0, x0, bh, bw] enables the
        batched RMAC/Rpool path: host-computed region grids over each
        image's *valid feature extent* (ops/pooling.py::rmac_region_boxes +
        models/trunks.py::trunk_valid_extent); zero-size boxes are padding.
        """
        dim = OUTPUT_DIM[self.architecture]

        o, valid_hw = make_trunk(
            self.architecture, self.frozen_bn, name="features")(x, valid_hw)
        if self.head_dtype is not None:
            o = o.astype(jnp.dtype(self.head_dtype))

        # local whitening on the channel dim (imageretrievalnet.py:99-104)
        if self.local_whitening:
            o = Dense(dim, name="lwhiten")(o)

        mask = None
        if valid_hw is not None:
            mask = feature_mask(o.shape[-3:-1], valid_hw, dtype=o.dtype)

        # pool -> l2n (pooled vectors are (N, D))
        if self.regional:
            assert region_boxes is not None or valid_hw is None, \
                "bucketed Rpool needs region_boxes (see parallel/extract.py)"
            o = self._regional_pool(o, dim, region_boxes)
            o = pool_ops.l2n(o)
        elif self.pallas_pool and self.pooling == "gem" \
                and valid_hw is not None:
            # fused pool+normalize: one pass over the feature map
            o = GeMPoolL2NPallas(self.p_init, name="pool")(o, valid_hw)
        else:
            o = self._global_pool(o, mask, region_boxes)
            o = pool_ops.l2n(o)

        # whiten -> l2n
        if self.whitening:
            o = Dense(dim, name="whiten")(o)
            o = pool_ops.l2n(o)

        return o

    def _global_pool(self, o, mask, region_boxes=None):
        if self.pooling == "gem":
            return GeMPool(self.p_init, name="pool")(o, mask=mask)
        if self.pooling == "mac":
            return pool_ops.mac(o, mask=mask)
        if self.pooling == "spoc":
            return pool_ops.spoc(o, mask=mask)
        if self.pooling == "rmac":
            if region_boxes is not None:
                return pool_ops.rmac_masked(o, region_boxes)
            assert mask is None, \
                "bucketed rmac needs region_boxes (see parallel/extract.py)"
            return pool_ops.rmac(o)
        raise ValueError("Unknown pooling %s" % self.pooling)

    def _regional_pool(self, o, dim, region_boxes=None):
        """Rpool (cirtorch pooling.py:64-100): region vectors -> L2N ->
        regional whitening -> L2N -> sum -> L2N. The caller then applies
        the network-level L2N AGAIN, exactly like the reference (Rpool
        norms its aggregate at pooling.py:95 and ImageRetrievalNet norms
        the pool output once more) — a single norm differs by ~1e-6
        relative (the inner eps), a systematic deviation from published
        -r model descriptors."""
        if self.pooling == "gem":
            gem_pool = GeMPool(self.p_init, name="pool")
            region_fn = gem_pool
        elif self.pooling == "mac":
            region_fn = pool_ops.mac
        elif self.pooling == "spoc":
            region_fn = pool_ops.spoc
        else:
            raise ValueError("Unsupported regional pooling %s" % self.pooling)
        if region_boxes is not None:
            vecs = pool_ops.region_vectors(
                o, region_boxes, lambda f, m: region_fn(f, mask=m))
        else:
            vecs = pool_ops.roipool(o, lambda r: region_fn(r))  # (N, R, D)
        vecs = pool_ops.l2n(vecs)
        vecs = Dense(dim, name="pool_whiten")(vecs)
        vecs = pool_ops.l2n(vecs)
        if region_boxes is not None:
            # padded region slots must not contribute (the Dense bias makes
            # them nonzero otherwise)
            vecs = vecs * (region_boxes[..., 2] > 0)[..., None]
        return pool_ops.l2n(vecs.sum(axis=-2))


def init_retrieval_net(architecture="resnet101", local_whitening=False,
                       pooling="gem", regional=False, whitening=False,
                       p_init=3.0, frozen_bn=True):
    net = ImageRetrievalNet(
        architecture=architecture, local_whitening=bool(local_whitening),
        pooling=pooling, regional=bool(regional), whitening=bool(whitening),
        frozen_bn=frozen_bn, p_init=p_init)
    meta = {
        "architecture": architecture,
        "local_whitening": bool(local_whitening),
        "pooling": pooling,
        "regional": bool(regional),
        "whitening": whitening,
        "mean": [0.485, 0.456, 0.406],
        "std": [0.229, 0.224, 0.225],
        "outputdim": OUTPUT_DIM[architecture],
        "in_channels": 3,
        "out_channels": OUTPUT_DIM[architecture],
    }
    return net, meta
