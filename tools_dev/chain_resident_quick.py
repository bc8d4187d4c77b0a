#!/usr/bin/env python3
"""Quick chain-resident capture: exactly bench.py's
_measure_chain_resident at the headline config (resnet101, batch 16,
768x1024, production dtype policy)."""
import os
import sys

sys.path.insert(0, "/root/repo")
import numpy as np


def main():
    import bench
    from mdir_tpu.models import initialize_model
    from mdir_tpu.ops.dtypes import resolve_compute_dtype

    arch = os.environ.get("BENCH_ARCH", "resnet101")
    max_batch = int(os.environ.get("BENCH_MAX_BATCH", "16"))
    model = initialize_model({
        "architecture": "cirnet", "cir_architecture": arch,
        "local_whitening": False, "pooling": "gem", "regional": False,
        "whitening": False, "pretrained": False})
    mean_std = (model.meta["mean"], model.meta["std"])
    compute_dtype, _ = resolve_compute_dtype({})
    scales = (1, 1.0 / np.sqrt(2), 0.5)
    rate = bench._measure_chain_resident(
        model, mean_std, max_batch, (768, 1024), scales,
        compute_dtype=compute_dtype)
    print("clahe_chain_device_resident_imgs_per_sec = %.1f" % rate,
          flush=True)


if __name__ == "__main__":
    main()
