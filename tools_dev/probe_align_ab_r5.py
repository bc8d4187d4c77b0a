"""Clean A/B: train step at 362 vs 368-padded, interleaved, reps=8."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def _sync(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(leaf[(0,) * (leaf.ndim - 1)][..., :1])


def main():
    import jax

    from mdir_tpu.data.transforms import initialize_transforms
    from mdir_tpu.learning.network import CirNetwork
    from mdir_tpu.learning.train_step import TrainStep, prepare_batch
    from mdir_tpu.models import initialize_model
    from mdir_tpu.optim.criteria import initialize_criterion
    from mdir_tpu.ops.preprocess import chain_from_transform

    model = initialize_model({
        "architecture": "cirnet", "cir_architecture": "resnet101",
        "local_whitening": False, "pooling": "gem", "regional": False,
        "whitening": False, "pretrained": False})
    mean_std = (model.meta["mean"], model.meta["std"])
    chain = chain_from_transform(initialize_transforms(
        "pil2np | totensor | normalize", list(mean_std)))
    network = CirNetwork(model, CirNetwork.NetworkParams(
        model={}, runtime={"wrappers": ""}))
    criterion = initialize_criterion(
        {"loss": "contrastive", "margin": 0.7, "eps": 1e-6})

    rng = np.random.RandomState(3)
    tuples = [[(rng.rand(362, 362, 3) * 255).astype(np.uint8)
               for _ in range(7)] for _ in range(5)]
    targets = [np.array([-1.0, 1.0] + [0.0] * 5, np.float32)] * 5
    batch0, valid, tgt, _ = prepare_batch(tuples, targets)
    key = jax.random.PRNGKey(0)
    params = network.model.params
    net_vars = {k: v for k, v in network.model.variables.items()
                if k != "params"}

    runs = {}
    for hw, label in [((362, 362), "t362"), ((368, 368), "t368")]:
        step = TrainStep(network, criterion, batch_average=True,
                         device_chain=chain, compute_dtype="auto")
        batch = batch0
        if hw != (362, 362):
            batch = np.pad(batch0, [(0, 0), (0, hw[0] - 362),
                                    (0, hw[1] - 362), (0, 0)])
        (loss, _), grads = step.gradients(params, batch, valid, tgt, key)
        _sync(grads)
        dev = (jax.device_put(params), jax.device_put(batch),
               jax.device_put(valid), jax.device_put(tgt), key, None,
               jax.device_put(net_vars))
        runs[label] = (step, dev)

    times = {"t362": [], "t368": []}
    for trial in range(4):
        for label in ("t362", "t368") if trial % 2 == 0 else ("t368", "t362"):
            step, dev = runs[label]
            start = time.time()
            out = None
            for _ in range(8):
                out = step._grad_fn(*dev)[1]
            _sync(out)
            times[label].append((time.time() - start) / 8)
    for label, ts in times.items():
        print(json.dumps({"probe": label + "_ab",
                          "ms_best": round(min(ts) * 1e3, 1),
                          "ms_all": [round(t * 1e3, 1) for t in ts],
                          "tuples_per_sec_best": round(5 / min(ts), 2)}),
              flush=True)


main()
