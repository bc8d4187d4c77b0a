"""On-chip probe (round 5): train-step decomposition + phase-convT impact.

Runs on the real TPU (axon). Prints one JSON line per experiment:
  1. train step (bf16 production policy): grad-program ms + XLA
     flops/bytes roofline, fwd-only ms at the same geometry, and a
     368-padded-bucket variant (16-aligned spatial) to measure alignment
     waste at the cirtorch 362 geometry.
  2. p2p U-Net resident forward with MDIR_TPU_CONVT_PHASE on/off.
  3. composed (U-Net + VGG16 3-scale) resident with phase on/off.

Usage: python tools_dev/probe_train_composed_r5.py [train|unet|composed|all]
"""
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


def _time(fn, reps=3):
    fn()  # warm
    start = time.time()
    out = None
    for _ in range(reps):
        out = fn()
    _sync(out)
    return (time.time() - start) / reps


def probe_train():
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
    for hw, label in [((362, 362), "t362"), ((368, 368), "t368_pad")]:
        step = TrainStep(network, criterion, batch_average=True,
                         device_chain=chain, compute_dtype="auto")
        tuples = [[(rng.rand(362, 362, 3) * 255).astype(np.uint8)
                   for _ in range(7)] for _ in range(5)]
        targets = [np.array([-1.0, 1.0] + [0.0] * 5, np.float32)] * 5
        batch, valid, tgt, _ = prepare_batch(tuples, targets)
        if hw != (362, 362):
            pad = [(0, 0), (0, hw[0] - 362), (0, hw[1] - 362), (0, 0)]
            batch = np.pad(batch, pad)
        params = network.model.params
        key = jax.random.PRNGKey(0)
        (loss, _), grads = step.gradients(params, batch, valid, tgt, key)
        _sync(grads)  # compile + guard
        net_vars = {k: v for k, v in network.model.variables.items()
                    if k != "params"}
        flops = bytes_ = None
        try:
            cost = step._grad_fn.lower(
                params, batch, valid, tgt, key, None,
                net_vars).compile().cost_analysis()
            cost = cost[0] if isinstance(cost, (list, tuple)) else cost
            flops = float(cost.get("flops", 0.0))
            bytes_ = float(cost.get("bytes accessed", 0.0))
        except Exception as exc:  # noqa: BLE001
            print("cost_analysis failed:", exc, file=sys.stderr)
        dev = (jax.device_put(params), jax.device_put(batch),
               jax.device_put(valid), jax.device_put(tgt), key, None,
               jax.device_put(net_vars))
        t_grad = _time(lambda: step._grad_fn(*dev)[1])

        # fwd-only at the same geometry (bf16 trunk, f32 head — the same
        # policy the grad program uses), to split fwd vs bwd time
        from mdir_tpu.learning.train_step import _apply_model

        fwd = jax.jit(lambda p, b: _apply_model(
            network.model, p, b.astype(np.float32) / 255.0, None, False,
            None, compute_dtype=step.compute_dtype)[0])
        dev_b = jax.device_put(batch)
        dev_p = jax.device_put(params)
        t_fwd = _time(lambda: fwd(dev_p, dev_b))
        rec = {"probe": label, "ms_per_step": round(t_grad * 1e3, 2),
               "ms_fwd_only": round(t_fwd * 1e3, 2),
               "tuples_per_sec": round(5 / t_grad, 2),
               "compute_dtype": step.compute_dtype}
        if flops:
            floor = max(flops / 197e12, (bytes_ or 0) / 819e9)
            rec.update(tflops=round(flops / 1e12, 3),
                       bytes_gb=round((bytes_ or 0) / 1e9, 2),
                       roofline_floor_ms=round(floor * 1e3, 2),
                       roofline_frac=round(floor / t_grad, 3),
                       mfu=round(flops / t_grad / 197e12, 3))
        print(json.dumps(rec), flush=True)


def probe_unet():
    import jax
    import jax.numpy as jnp

    from mdir_tpu.models import initialize_model

    for flag in ("1", "0"):
        os.environ["MDIR_TPU_CONVT_PHASE"] = flag
        model = initialize_model({"architecture": "p2p_unet",
                                  "in_channels": 3, "out_channels": 3})
        module, variables = model.module, model.variables
        fwd = jax.jit(lambda v, x: module.apply(v, x, train=False))
        x = jnp.asarray(np.random.RandomState(5).rand(8, 512, 768, 3),
                        jnp.float32)
        flops = bytes_ = None
        try:
            cost = fwd.lower(variables, x).compile().cost_analysis()
            cost = cost[0] if isinstance(cost, (list, tuple)) else cost
            flops = float(cost.get("flops", 0.0))
            bytes_ = float(cost.get("bytes accessed", 0.0))
        except Exception:
            pass
        xd = jax.device_put(x)
        vd = jax.device_put(variables)
        t = _time(lambda: fwd(vd, xd), reps=4)
        rec = {"probe": f"unet_phase={flag}",
               "ms_per_batch8": round(t * 1e3, 1),
               "imgs_per_sec": round(8 / t, 1)}
        if flops:
            floor = max(flops / 197e12, (bytes_ or 0) / 819e9)
            rec.update(tflops=round(flops / 1e12, 3),
                       roofline_floor_ms=round(floor * 1e3, 2),
                       roofline_frac=round(floor / t, 3))
        print(json.dumps(rec), flush=True)


def probe_composed():
    import bench

    for flag in ("0",):
        os.environ["MDIR_TPU_CONVT_PHASE"] = flag
        rate, tflops, dtype, roof = bench._measure_composed(reps=3)
        rec = {"probe": f"composed_phase={flag}",
               "imgs_per_sec": round(rate, 2), "dtype": dtype}
        if tflops:
            rec["tflops_per_sec"] = round(tflops, 2)
            rec["mfu"] = round(tflops * 1e12 / 197e12, 3)
        rec.update(roof)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("unet", "all"):
        probe_unet()
    if which in ("composed", "all"):
        probe_composed()
    if which in ("train", "all"):
        probe_train()
