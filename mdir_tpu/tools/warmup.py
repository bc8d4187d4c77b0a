"""Pre-compile the extraction programs a dataset will need.

First-eval latency is dominated by XLA compiles (one fused program per shape
bucket x batch). ``warmup_extraction`` runs tiny dummy batches through every
(bucket, scale) combination derived from a list of image shapes, populating
the persistent compilation cache so production evals start hot.

Usage::

    from mdir_tpu.tools.warmup import warmup_extraction

    warmup_extraction(model, shapes=[(768, 1024), (1024, 768)],
                      scales=(1, 2 ** -0.5, 0.5), max_batch=8,
                      mean_std=(mean, std))
"""
import numpy as np


def bucket_shapes(shapes, bucket_multiple=64):
    round_up = lambda v: -(-v // bucket_multiple) * bucket_multiple
    return sorted({(round_up(h), round_up(w)) for h, w in shapes})


def warmup_extraction(model, shapes, scales=(1,), max_batch=None,
                      mean_std=None, compute_dtype=None, msp=3.0):
    """Compile every bucket program for the given native image shapes."""
    from ..parallel.extract import MAX_BATCH, StreamingExtractor

    max_batch = max_batch or MAX_BATCH
    extractor = StreamingExtractor(
        model, scales=scales, msp=msp, normalize_mean_std=mean_std,
        compute_dtype=compute_dtype, max_batch=max_batch)
    dtype = np.uint8 if mean_std is not None else np.float32

    index = 0
    compiled = []
    for (h, w) in sorted(set(shapes)):
        # a full chunk per shape forces the (bucket, max_batch) program
        for _ in range(max_batch):
            extractor.add(index, np.zeros((h, w, 3), dtype))
            index += 1
        compiled.append((h, w))
    extractor.finish(index)
    return compiled
