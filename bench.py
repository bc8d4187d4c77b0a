#!/usr/bin/env python3
"""Headline benchmark: multi-scale descriptor extraction throughput.

Measures images/sec/chip for the reference's eval workload — ResNet101-GeM,
3 scales [1, 1/sqrt2, 1/2], image size 1024 — through the fused bucketed TPU
path (shape-bucketed batches, exact masked pooling, on-device multi-scale
aggregation). Prints ONE JSON line.

``vs_baseline`` is relative to the reference implementation's measured regime:
torch bs=1 multi-scale extraction on a single V100 runs ~15 images/s for
ResNet101@1024 (the reference publishes no throughput numbers — SURVEY.md §6;
15 img/s is the nominal single-GPU figure for this exact pipeline).
"""
import json
import os
import sys
import time

import numpy as np

REFERENCE_IMGS_PER_SEC = 15.0


def main():
    import jax

    from mdir_tpu.models import initialize_model
    from mdir_tpu.parallel.extract import extract_vectors_batched

    arch = os.environ.get("BENCH_ARCH", "resnet101")
    image_size = int(os.environ.get("BENCH_IMAGE_SIZE", "1024"))
    n_images = int(os.environ.get("BENCH_IMAGES", "64"))
    max_batch = int(os.environ.get("BENCH_MAX_BATCH", "8"))

    model = initialize_model({
        "architecture": "cirnet", "cir_architecture": arch,
        "local_whitening": False, "pooling": "gem", "regional": False,
        "whitening": False, "pretrained": False})

    # typical thumbnailed shapes: landscape + portrait aspect at max side 1024
    rng = np.random.RandomState(0)
    shapes = [(int(image_size * 0.75), image_size),
              (image_size, int(image_size * 0.75))]
    arrays = [(rng.rand(*shapes[i % 2], 3) * 255).astype(np.uint8)
              for i in range(n_images)]
    scales = [1, 1.0 / np.sqrt(2), 1.0 / 2]
    msp = float(model.pool_p)
    mean_std = (model.meta["mean"], model.meta["std"])
    compute_dtype = os.environ.get("MDIR_TPU_COMPUTE_DTYPE") or None

    def run(imgs):
        return extract_vectors_batched(
            model, imgs, scales=scales, msp=msp, max_batch=max_batch,
            normalize_mean_std=mean_std, compute_dtype=compute_dtype)

    # warmup: compile every (bucket, batch) program the timed run will hit
    run(arrays[:2 * max_batch])

    start = time.time()
    vecs = run(arrays)
    elapsed = time.time() - start
    assert vecs.shape[1] == n_images
    assert np.isfinite(vecs).all()

    imgs_per_sec = n_images / elapsed
    print(json.dumps({
        "metric": "multiscale_resnet101_gem_extraction",
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / REFERENCE_IMGS_PER_SEC, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
