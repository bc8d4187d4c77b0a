"""Batched multi-scale descriptor extraction — the TPU hot path.

The reference extracts descriptors one image at a time at native resolution
(``extract_vectors``, imageretrievalnet.py:277-312). Here images are grouped
into static shape buckets, padded (exactly masked through the trunk — see
models/trunks.py), and processed as large batches so the MXU sees big
convolutions; the multi-scale loop, p-power aggregation, and learned
whitening run fused on device. Numerically equivalent to the per-image
wrapper path (tested), including torch's ``F.interpolate(align_corners=False)``
resize, reproduced exactly per image via host-computed gather grids so one
compiled program serves all native sizes in a bucket.
"""
import collections
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..data.datasets import ImagesFromList
from ..ops.resize import torch_resize_grid
from ..data.loaders import DataLoader
from ..learning.wrappers import (CirMultiscaleAggregation, CirtorchWhiten,
                                 Compose, FakeBatch)

BUCKET_MULTIPLE = 64
MAX_BATCH = 16


def _round_up(v, m):
    return -(-v // m) * m


def _resize_one(img, y0, y1, wy, x0, x1, wx):
    """Separable bilinear gather resize of one (H, W, C) image."""
    rows0 = jnp.take(img, y0, axis=0)
    rows1 = jnp.take(img, y1, axis=0)
    rows = rows0 * (1.0 - wy)[:, None, None] + rows1 * wy[:, None, None]
    cols0 = jnp.take(rows, x0, axis=1)
    cols1 = jnp.take(rows, x1, axis=1)
    return cols0 * (1.0 - wx)[None, :, None] + cols1 * wx[None, :, None]


@jax.jit
def batched_resize(batch, y0, y1, wy, x0, x1, wx):
    """vmap'd exact per-image resize; indices are per image (N, OH)/(N, OW)."""
    return jax.vmap(_resize_one)(batch, y0, y1, wy, x0, x1, wx)


class BucketedApply:
    """Caches one jitted masked-apply per module; XLA caches per shape."""

    def __init__(self, model):
        self.model = model
        module = model.module

        def fn(variables, x, valid_hw):
            return module.apply(variables, x, valid_hw=valid_hw)

        self.fn = jax.jit(fn)

    def __call__(self, batch, valid_hw):
        return self.fn(self.model.variables, batch, valid_hw)


def _analyze_wrappers(network):
    """Check the network's eval wrappers are the fusable pattern
    [cirwhiten?] [cirmultiscale?] [fakebatch?] and return (scales, whiten)."""
    compose = network.wrappers["eval"]
    scales = [1]
    whiten = None
    for wrapper in compose.wrappers:
        if isinstance(wrapper, CirtorchWhiten):
            whiten = wrapper
        elif isinstance(wrapper, CirMultiscaleAggregation):
            scales = wrapper.scales
        elif isinstance(wrapper, FakeBatch):
            pass
        else:
            return None
    return scales, whiten


def _load_images(images, image_size, transform, bbxs=None, workers=6):
    """Decode + crop + thumbnail + transform on host threads -> HWC arrays."""
    dataset = ImagesFromList(root="", images=images, imsize=image_size,
                             bbxs=bbxs, transform=transform)
    loader = DataLoader(dataset, batch_size=1, num_workers=workers,
                        collate_fn=lambda items: items[0])
    return list(loader)


def extract_vectors_batched(model, arrays, scales=(1,), msp=1.0, whiten=None,
                            bucket_multiple=BUCKET_MULTIPLE, max_batch=MAX_BATCH,
                            max_side=None):
    """Multi-scale descriptors for a list of HWC arrays. Returns (D, N).

    Equivalent to the reference per-image loop: per scale s, each image is
    bilinearly resized (exact torch grid), descriptors are GeM/...-pooled with
    valid-extent masking, aggregated as (mean over scales of v^msp)^(1/msp),
    L2-normalized, then optionally whitened (P(x-m), L2).
    """
    n = len(arrays)
    dim = model.meta["out_channels"]
    apply_fn = BucketedApply(model)
    acc = np.zeros((n, dim), np.float64)

    for scale in scales:
        # per-image scaled sizes, torch floor semantics
        sizes = []
        for arr in arrays:
            h, w = arr.shape[:2]
            if scale == 1:
                sizes.append((h, w))
            else:
                sizes.append((int(math.floor(h * scale)),
                              int(math.floor(w * scale))))

        # group images by (input bucket, output size bucket)
        groups = collections.defaultdict(list)
        for i, arr in enumerate(arrays):
            ih, iw = arr.shape[:2]
            oh, ow = sizes[i]
            in_bucket = (_round_up(ih, bucket_multiple), _round_up(iw, bucket_multiple))
            out_bucket = (_round_up(oh, bucket_multiple), _round_up(ow, bucket_multiple))
            groups[(in_bucket, out_bucket)].append(i)

        for (in_bucket, out_bucket), idxs in groups.items():
            for start in range(0, len(idxs), max_batch):
                chunk = idxs[start:start + max_batch]
                bsz = len(chunk)
                channels = arrays[chunk[0]].shape[-1]

                batch = np.zeros((bsz,) + in_bucket + (channels,), np.float32)
                for bi, i in enumerate(chunk):
                    arr = arrays[i]
                    batch[bi, :arr.shape[0], :arr.shape[1]] = arr

                if scale == 1:
                    scaled = jnp.asarray(batch)
                    valid = np.array([arrays[i].shape[:2] for i in chunk],
                                     np.int32)
                else:
                    oh_b, ow_b = out_bucket
                    y0 = np.zeros((bsz, oh_b), np.int64)
                    y1 = np.zeros((bsz, oh_b), np.int64)
                    wy = np.zeros((bsz, oh_b), np.float32)
                    x0 = np.zeros((bsz, ow_b), np.int64)
                    x1 = np.zeros((bsz, ow_b), np.int64)
                    wx = np.zeros((bsz, ow_b), np.float32)
                    for bi, i in enumerate(chunk):
                        ih, iw = arrays[i].shape[:2]
                        oh, ow = sizes[i]
                        gy0, gy1, gwy = torch_resize_grid(ih, oh, scale)
                        gx0, gx1, gwx = torch_resize_grid(iw, ow, scale)
                        y0[bi, :oh], y1[bi, :oh], wy[bi, :oh] = gy0, gy1, gwy
                        x0[bi, :ow], x1[bi, :ow], wx[bi, :ow] = gx0, gx1, gwx
                    scaled = batched_resize(jnp.asarray(batch), y0, y1, wy,
                                            x0, x1, wx)
                    valid = np.array(
                        [sizes[i] for i in chunk], np.int32)
                    # the gather pads with row/col-0 copies beyond the valid
                    # extent; the trunk's masking contract requires zeros there
                    from ..models.trunks import apply_valid_mask

                    scaled = apply_valid_mask(scaled, jnp.asarray(valid))

                vecs = apply_fn(scaled, jnp.asarray(valid))  # (B, D)
                vecs = np.asarray(vecs, np.float64)
                for bi, i in enumerate(chunk):
                    acc[i] += vecs[bi] ** msp

    acc = (acc / len(scales)) ** (1.0 / msp)
    acc = acc / np.linalg.norm(acc, axis=1, keepdims=True)
    vecs = acc.T  # (D, N)

    if whiten is not None:
        vecs = np.asarray(whiten.postprocess(jnp.asarray(vecs, jnp.float32),
                                             None, None))
    return vecs


def extract_vectors_network(network, images, image_size, transform, bbxs=None,
                            batch_size=MAX_BATCH):
    """Extract (D, N) descriptors for image paths through ``network``.

    Uses the fused bucketed TPU path when the network's eval wrappers are the
    standard whiten/multiscale pattern; otherwise falls back to the exact
    per-image wrapper loop.
    """
    network.eval()
    arrays = _load_images(images, image_size, transform, bbxs)

    analyzed = _analyze_wrappers(network) if hasattr(network, "wrappers") else None
    model = network.model
    if analyzed is not None and getattr(model, "is_descriptor_model", False) \
            and not _is_sequential(network) \
            and model.meta["pooling"] in ("gem", "mac", "spoc") \
            and not model.meta["regional"]:
        scales, whiten = analyzed
        msp = 1.0
        if len(scales) > 1 and model.meta["pooling"] == "gem" \
                and not model.meta["regional"] and not model.meta["whitening"]:
            msp = float(model.pool_p)
        return extract_vectors_batched(model, arrays, scales=scales, msp=msp,
                                       whiten=whiten, max_batch=batch_size)

    # exact fallback: per-image wrapper path
    dim = network.meta["out_channels"]
    vecs = np.zeros((dim, len(arrays)))
    for i, arr in enumerate(arrays):
        out = network(arr)
        vecs[:, i] = np.asarray(out).reshape(-1)
    return vecs


def _is_sequential(network):
    from ..learning.network import SequentialNetwork

    return isinstance(network, SequentialNetwork)
