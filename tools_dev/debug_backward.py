#!/usr/bin/env python3
"""Bisect the slow backward: masking? pooling? conv grads themselves?"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from mdir_tpu.models import initialize_model
    from mdir_tpu.models.trunks import make_trunk

    model = initialize_model({
        "architecture": "cirnet", "cir_architecture": "resnet101",
        "local_whitening": False, "pooling": "gem", "regional": False,
        "whitening": False, "pretrained": False})
    module = model.module
    variables = model.variables
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    rng = np.random.RandomState(0)
    batch = jnp.asarray(rng.rand(35, 384, 384, 3).astype(np.float32))
    valid = jnp.asarray(np.tile([[362, 362]], (35, 1)).astype(np.int32))

    trunk = make_trunk("resnet101")
    tvars = {"params": params["features"]}
    if "batch_stats" in rest:
        tvars["batch_stats"] = rest["batch_stats"]["features"]

    def timeit(f, *a, reps=3):
        out = f(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        t0 = time.time()
        for _ in range(reps):
            out = f(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        return (time.time() - t0) / reps

    # full model grad (mask + gem + descriptor)
    def loss_full(p):
        out = module.apply({**rest, "params": p}, batch, valid_hw=valid)
        return out.sum()
    t = timeit(jax.jit(jax.grad(loss_full)), params)
    print("grad full model w/ mask: %7.1f ms" % (t*1e3), flush=True)

    # trunk-only grad with masking
    def loss_masked(p):
        tv = dict(tvars); tv["params"] = p
        feats, _ = trunk.apply(tv, batch, valid)
        return feats.sum()
    t = timeit(jax.jit(jax.grad(loss_masked)), tvars["params"])
    print("grad trunk w/ mask:      %7.1f ms" % (t*1e3), flush=True)

    # trunk-only grad WITHOUT masking
    def loss_plain(p):
        tv = dict(tvars); tv["params"] = p
        feats, _ = trunk.apply(tv, batch, None)
        return feats.sum()
    t = timeit(jax.jit(jax.grad(loss_plain)), tvars["params"])
    print("grad trunk no mask:      %7.1f ms" % (t*1e3), flush=True)

    # forward-only for scale
    t = timeit(jax.jit(lambda p: loss_plain(p)), tvars["params"])
    print("fwd trunk no mask:       %7.1f ms" % (t*1e3), flush=True)

if __name__ == "__main__":
    main()
