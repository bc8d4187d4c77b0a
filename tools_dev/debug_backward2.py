#!/usr/bin/env python3
"""Bisect TrainStep's 10x grad slowdown vs raw jax.grad."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from mdir_tpu.models import initialize_model
    from mdir_tpu.optim.criteria import initialize_criterion

    model = initialize_model({
        "architecture": "cirnet", "cir_architecture": "resnet101",
        "local_whitening": False, "pooling": "gem", "regional": False,
        "whitening": False, "pretrained": False})
    module = model.module
    variables = model.variables
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}
    criterion = initialize_criterion(
        {"loss": "contrastive", "margin": 0.7, "eps": 1e-6})

    rng = np.random.RandomState(0)
    batch = jnp.asarray(rng.rand(35, 384, 384, 3).astype(np.float32))
    valid = jnp.asarray(np.tile([[362, 362]], (35, 1)).astype(np.int32))
    tgt = jnp.asarray(np.tile([-1.0, 1.0, 0, 0, 0, 0, 0], 5).astype(np.float32))

    def timeit(f, *a, reps=3):
        out = f(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        t0 = time.time()
        for _ in range(reps):
            out = f(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        return (time.time() - t0) / reps

    # 1: sum loss, no mutable
    def l1(p):
        out = module.apply({**rest, "params": p}, batch, valid_hw=valid)
        return out.sum()
    print("1 sum, no mutable:        %7.1f ms" % (timeit(jax.jit(jax.grad(l1)), params)*1e3), flush=True)

    # 2: contrastive criterion, no mutable
    def l2(p):
        out = module.apply({**rest, "params": p}, batch, valid_hw=valid)
        return criterion(out.T, tgt)
    print("2 contrastive, no mut:    %7.1f ms" % (timeit(jax.jit(jax.grad(l2)), params)*1e3), flush=True)

    # 3: sum loss, mutable batch_stats
    def l3(p):
        out, _ = module.apply({**rest, "params": p}, batch, valid_hw=valid,
                              mutable=["batch_stats"])
        return out.sum()
    print("3 sum, mutable bs:        %7.1f ms" % (timeit(jax.jit(jax.grad(l3)), params)*1e3), flush=True)

    # 4: contrastive + mutable + has_aux (the TrainStep shape)
    def l4(p):
        out, bs = module.apply({**rest, "params": p}, batch, valid_hw=valid,
                               mutable=["batch_stats"])
        loss = criterion(out.T, tgt)
        return loss, {"bs": bs, "_output": out.T}
    print("4 full TrainStep shape:   %7.1f ms" % (timeit(jax.jit(jax.value_and_grad(l4, has_aux=True)), params)*1e3), flush=True)

if __name__ == "__main__":
    main()
