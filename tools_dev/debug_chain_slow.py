#!/usr/bin/env python3
"""Why did the packed CLAHE-chain e2e crawl in the bench capture?

Runs the exact bench chain path (StreamingExtractor, packed transfers)
under combinations of {f32, bf16} x {uplink thread, inline} and prints
per-pass rates with adjacent tunnel probes.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax

    from mdir_tpu.data.transforms import initialize_transforms
    from mdir_tpu.models import initialize_model
    from mdir_tpu.ops.preprocess import chain_from_transform
    from mdir_tpu.parallel.extract import StreamingExtractor

    model = initialize_model({
        "architecture": "cirnet", "cir_architecture": "resnet101",
        "local_whitening": False, "pooling": "gem", "regional": False,
        "whitening": False, "pretrained": False})
    mean_std = (model.meta["mean"], model.meta["std"])
    chain = chain_from_transform(initialize_transforms(
        "pil2np | apply_clahe | totensor | normalize", list(mean_std)))
    scales = [1, 1.0 / np.sqrt(2), 0.5]
    msp = float(model.pool_p)

    rng = np.random.RandomState(2)
    shapes = [(768, 1024), (1024, 768)]
    arrays = [chain.host_input(
        (rng.rand(*shapes[i % 2], 3) * 255).astype(np.uint8))
        for i in range(32)]
    by = sum(a.nbytes for a in arrays)
    probe = np.concatenate([a.reshape(-1) for a in arrays[:16]])

    def tunnel():
        t0 = time.time()
        d = jax.device_put(probe)
        np.asarray(d[:1])
        return probe.nbytes / (time.time() - t0) / 1e6

    for dtype in (None, "bfloat16"):
        for inline in ("0", "1"):
            os.environ["MDIR_TPU_UPLINK_THREAD"] = "0" if inline == "1" \
                else "1"

            def run():
                e = StreamingExtractor(model, scales=scales, msp=msp,
                                       max_batch=16, compute_dtype=dtype,
                                       device_chain=chain)
                for i, a in enumerate(arrays):
                    e.add(i, a)
                return e.finish(len(arrays))

            run()  # warm
            for rep in range(2):
                t0 = time.time()
                vecs = run()
                el = time.time() - t0
                tun = tunnel()
                print("dtype=%-8s inline=%s pass%d: %5.2f s %6.2f img/s "
                      "%5.1f MB/s | tunnel %5.1f -> sat %.2f"
                      % (dtype, inline, rep, el, 32 / el, by / el / 1e6,
                         tun, (by / el / 1e6) / tun), flush=True)
            assert np.isfinite(vecs).all()
        os.environ.pop("MDIR_TPU_UPLINK_THREAD", None)


if __name__ == "__main__":
    main()
