#!/usr/bin/env python3
"""Train-step anatomy on the chip: where does the throughput go?

Measures at the bench geometry (5 tuples x 7 images @362, bucket 384):
  - forward-only rate/TFLOPs vs value_and_grad, remat on/off, f32 vs bf16
  - the actual bf16-vs-f32 gradient cosine + loss delta (the guard inputs)
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def sync(tree):
    import jax

    leaves = jax.tree_util.tree_leaves(tree)
    return np.asarray(leaves[0]).ravel()[:1]


def main():
    import jax
    import jax.numpy as jnp

    from mdir_tpu.learning.network import CirNetwork
    from mdir_tpu.learning.train_step import TrainStep, prepare_batch
    from mdir_tpu.models import initialize_model
    from mdir_tpu.optim.criteria import initialize_criterion

    model = initialize_model({
        "architecture": "cirnet", "cir_architecture": "resnet101",
        "local_whitening": False, "pooling": "gem", "regional": False,
        "whitening": False, "pretrained": False})
    network = CirNetwork(model, CirNetwork.NetworkParams(
        model={}, runtime={"wrappers": ""}))
    criterion = initialize_criterion(
        {"loss": "contrastive", "margin": 0.7, "eps": 1e-6})

    rng = np.random.RandomState(3)
    tuples = [[rng.rand(362, 362, 3).astype(np.float32) for _ in range(7)]
              for _ in range(5)]
    targets = [np.array([-1.0, 1.0] + [0.0] * 5, np.float32)] * 5
    batch, valid, tgt, _ = prepare_batch(tuples, targets)
    params = network.model.params
    key = jax.random.PRNGKey(0)
    print("batch", batch.shape, batch.dtype, "elements", batch.size,
          "remat_min", os.environ.get("MDIR_TPU_REMAT_MIN_ELEMENTS",
                                      str(2 ** 23)), flush=True)

    def flops_of(lowered):
        try:
            cost = lowered.compile().cost_analysis()
            cost = cost[0] if isinstance(cost, (list, tuple)) else cost
            return float(cost.get("flops", 0.0))
        except Exception:
            return 0.0

    # forward-only rate
    module = model.module
    variables = model.variables

    def fwd(variables, batch, valid):
        return module.apply(variables, batch, valid_hw=valid)

    for dtype in (None, "bfloat16"):
        var = variables
        b = jnp.asarray(batch)
        if dtype:
            var = jax.tree.map(lambda a: a.astype(dtype)
                               if a.dtype == jnp.float32 else a, var)
            b = b.astype(dtype)
        jf = jax.jit(fwd)
        fl = flops_of(jf.lower(var, b, jnp.asarray(valid)))
        out = jf(var, b, jnp.asarray(valid))
        sync(out)
        t0 = time.time()
        for _ in range(4):
            out = jf(var, b, jnp.asarray(valid))
        sync(out)
        el = (time.time() - t0) / 4
        print("fwd-only %-8s: %6.1f ms  %5.1f TFLOP/s"
              % (dtype, el * 1e3, fl / el / 1e12), flush=True)

    for remat in ("0", str(2 ** 40)):
        os.environ["MDIR_TPU_REMAT_MIN_ELEMENTS"] = remat
        for dtype in ("float32", "bfloat16"):
            step = TrainStep(network, criterion, batch_average=True,
                             compute_dtype=dtype)
            (loss, _), grads = step.gradients(params, batch, valid, tgt, key)
            sync(grads)
            fl = flops_of(step._grad_fn.lower(params, batch, valid, tgt,
                                              key, None))
            t0 = time.time()
            for _ in range(3):
                (loss, _), grads = step.gradients(params, batch, valid, tgt,
                                                  key)
            sync(grads)
            el = (time.time() - t0) / 3
            print("grad remat=%-13s %-8s: %6.1f ms  %5.1f TFLOP/s  "
                  "(%.2f tuples/s)"
                  % (remat, dtype, el * 1e3, fl / el / 1e12, 5 / el),
                  flush=True)
    os.environ.pop("MDIR_TPU_REMAT_MIN_ELEMENTS", None)

    # guard inputs: bf16 vs f32 loss/grad agreement at this geometry
    f32 = TrainStep(network, criterion, batch_average=True,
                    compute_dtype="float32")
    b16 = TrainStep(network, criterion, batch_average=True,
                    compute_dtype="bfloat16")
    (le, _), ge = f32.gradients(params, batch, valid, tgt, key)
    (lf, _), gf = b16.gradients(params, batch, valid, tgt, key)
    fe = np.concatenate([np.asarray(g, np.float32).ravel()
                         for g in jax.tree_util.tree_leaves(ge)])
    ff = np.concatenate([np.asarray(g, np.float32).ravel()
                         for g in jax.tree_util.tree_leaves(gf)])
    cos = (fe * ff).sum() / (np.linalg.norm(fe) * np.linalg.norm(ff) + 1e-12)
    print("loss f32 %.6f bf16 %.6f (rel %.4f); grad cosine %.5f"
          % (float(le), float(lf),
             abs(float(lf) - float(le)) / max(abs(float(le)), 1e-6), cos),
          flush=True)


if __name__ == "__main__":
    main()
