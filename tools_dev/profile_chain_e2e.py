#!/usr/bin/env python3
"""Instrument the CLAHE-chain streaming path phase by phase on the chip.

Prints per-chunk: host prep (batch assembly + grids + clahe aux), uplink
transfer wall (per device_put), launch, and the end-to-end rate; compares
against the raw tunnel rate for the same bytes measured in the same minute.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax

    from mdir_tpu.data.transforms import initialize_transforms
    from mdir_tpu.models import initialize_model
    from mdir_tpu.ops.preprocess import chain_from_transform
    from mdir_tpu.parallel import extract as ex

    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    max_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    model = initialize_model({
        "architecture": "cirnet", "cir_architecture": "resnet101",
        "local_whitening": False, "pooling": "gem", "regional": False,
        "whitening": False, "pretrained": False})
    mean_std = (model.meta["mean"], model.meta["std"])
    chain = chain_from_transform(initialize_transforms(
        "pil2np | apply_clahe | totensor | normalize", list(mean_std)))
    print("ships_l:", chain.ships_l, flush=True)

    rng = np.random.RandomState(2)
    shapes = [(768, 1024), (1024, 768)]
    arrays = [chain.host_input(
        (rng.rand(*shapes[i % 2], 3) * 255).astype(np.uint8))
        for i in range(n_images)]
    scales = (1, 1.0 / np.sqrt(2), 0.5)

    # instrument: wrap _transfer_and_launch's device puts
    times = {"prep": 0.0, "put": 0.0, "launch": 0.0, "chunks": 0}
    orig_submit = ex.StreamingExtractor._submit
    orig_tl = ex.StreamingExtractor._transfer_and_launch

    def submit(self, bucket):
        t0 = time.time()
        orig_submit(self, bucket)
        times["prep"] += time.time() - t0  # includes enqueue wait

    def transfer_and_launch(self, indices, batch, valid, grids, clahe_aux,
                            boxes):
        import jax.numpy as jnp

        t0 = time.time()
        put = jnp.asarray
        dev_batch = put(batch)
        dev_valid = put(valid)
        dev_grids = tuple(None if g is None else tuple(put(a) for a in g)
                          for g in grids)
        dev_aux = None if clahe_aux is None \
            else tuple(put(a) for a in clahe_aux)
        # force the transfers to complete to attribute time correctly
        np.asarray(dev_batch[0, 0, 0, :1])
        t1 = time.time()
        vecs = self.fused(self.variables, dev_batch, dev_valid, dev_grids,
                          dev_aux, None, jnp.float32(self.msp), self.P,
                          self.m, self.mean, self.std)
        t2 = time.time()
        times["put"] += t1 - t0
        times["launch"] += t2 - t1
        times["chunks"] += 1
        self.results.append((indices, vecs))

    ex.StreamingExtractor._submit = submit
    ex.StreamingExtractor._transfer_and_launch = transfer_and_launch

    def run():
        e = ex.StreamingExtractor(model, scales=scales, msp=float(model.pool_p),
                                  max_batch=max_batch, device_chain=chain)
        for i, a in enumerate(arrays):
            e.add(i, a)
        return e.finish(len(arrays))

    run()  # warm/compile
    for key in times:
        times[key] = 0.0 if key != "chunks" else 0

    best = float("inf")
    for rep in range(2):
        for key in times:
            times[key] = 0.0 if key != "chunks" else 0
        t0 = time.time()
        vecs = run()
        el = time.time() - t0
        by = sum(a.nbytes for a in arrays)
        print("pass %d: %.2f s  %.2f img/s  %.1f MB/s | prep %.2f  put %.2f "
              "launch %.2f (chunks %d)"
              % (rep, el, n_images / el, by / el / 1e6, times["prep"],
                 times["put"], times["launch"], times["chunks"]), flush=True)
        best = min(best, el)
    assert np.isfinite(vecs).all()

    # raw tunnel now, same payload scale
    probe = np.concatenate([a.reshape(-1) for a in arrays[:max_batch]])
    t0 = time.time()
    d = jax.device_put(probe)
    np.asarray(d[:1])
    tun = probe.nbytes / (time.time() - t0) / 1e6
    print("tunnel now: %.1f MB/s -> e2e saturation %.2f"
          % (tun, (sum(a.nbytes for a in arrays) / best / 1e6) / tun),
          flush=True)


if __name__ == "__main__":
    main()
