"""ZeRO-sharded data-parallel training (``runtime: param_sharding: zero``).

The reference is single-device (SURVEY.md §2.11); plain DP here replicates
params and all-reduces gradients. The ZeRO mode instead emits
reduce-scattered gradients from the train-step program and keeps the
optimizer state sharded N ways (``parallel/mesh.py::zero_shardings``), with
the param all-gather riding inside the compiled optimizer update — same
total ICI bytes, 1/N gradient + optimizer-state memory per device. These
tests pin (a) the sharding rule, (b) numerical equality with plain DP over
real optimizer steps, and (c) the yaml runtime surface reaching it.
"""
import jax
import numpy as np
import pytest

from mdir_tpu.parallel.mesh import make_mesh, zero_shardings

from test_train_step import _make_network, _tuple_batch


def _sharded_dim(sharding):
    spec = sharding.spec
    for i, part in enumerate(spec):
        if part is not None:
            return i
    return None


def test_zero_shardings_rule():
    mesh = make_mesh(8)
    tree = {
        "w": np.zeros((16, 3), np.float32),     # dim 0 divisible by 8
        "b": np.zeros((3,), np.float32),        # nothing divisible
        "big": np.zeros((8, 24, 5), np.float32),  # prefers the LARGEST dim
        "scalar": np.zeros((), np.float32),
    }
    shardings = zero_shardings(mesh, tree)
    assert _sharded_dim(shardings["w"]) == 0
    assert _sharded_dim(shardings["b"]) is None
    assert _sharded_dim(shardings["big"]) == 1
    assert _sharded_dim(shardings["scalar"]) is None


def _grads_and_step(mesh, param_sharding, n_steps=2):
    """Run n_steps of adam on the contrastive tuple batch; return the final
    params plus the internals needed for sharding assertions."""
    from mdir_tpu.learning.train_step import TrainStep, prepare_batch
    from mdir_tpu.optim.criteria import initialize_criterion
    from mdir_tpu.optim.optimizers import init_adam

    network = _make_network()
    criterion = initialize_criterion(
        {"loss": "contrastive", "margin": 0.7, "eps": 1e-6})
    step = TrainStep(network, criterion, batch_average=True, mesh=mesh,
                     param_sharding=param_sharding)
    optimizer = init_adam(network.parameters({}), lr=1e-3, weight_decay=0)
    if param_sharding == "zero":
        optimizer.shard_state(mesh)

    params = network.model.params
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    grads = None
    for i in range(n_steps):
        images, targets_list = _tuple_batch(rng, n_tuples=4, tuple_len=4,
                                            hw=64)
        batch, valid, targets, _ = prepare_batch(images, targets_list)
        (loss, _aux), grads = step.gradients(params, batch, valid, targets,
                                             key)
        params = optimizer.apply(params, grads)
    return params, grads, optimizer, float(np.asarray(loss))


def test_zero_matches_plain_dp():
    mesh = make_mesh(8)
    params_dp, grads_dp, _opt_dp, loss_dp = _grads_and_step(mesh, None)
    params_z, grads_z, opt_z, loss_z = _grads_and_step(mesh, "zero")

    np.testing.assert_allclose(loss_z, loss_dp, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(params_dp),
                    jax.tree_util.tree_leaves(params_z)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)

    # the ZeRO path's large gradient leaves really are sharded, and the
    # optimizer's moment leaves follow the same placement
    n = mesh.devices.size
    grad_dims = [_sharded_dim(g.sharding)
                 for g in jax.tree_util.tree_leaves(grads_z)
                 if any(d % n == 0 for d in g.shape)]
    assert grad_dims and all(d is not None for d in grad_dims)
    state_dims = [_sharded_dim(leaf.sharding)
                  for leaf in jax.tree_util.tree_leaves(opt_z.state)
                  if hasattr(leaf, "sharding") and leaf.ndim >= 1
                  and any(d % n == 0 for d in leaf.shape)]
    assert state_dims and all(d is not None for d in state_dims)
    # and the emitted params are replicated for downstream consumers
    for leaf in jax.tree_util.tree_leaves(params_z):
        assert _sharded_dim(leaf.sharding) is None


def test_zero_state_dict_roundtrip_restores_placement():
    from mdir_tpu.optim.optimizers import init_adam

    mesh = make_mesh(8)
    network = _make_network()
    optimizer = init_adam(network.parameters({}), lr=1e-3, weight_decay=0)
    optimizer.shard_state(mesh)
    snapshot = optimizer.state_dict()
    optimizer.load_state_dict(snapshot)
    n = mesh.devices.size
    dims = [_sharded_dim(leaf.sharding)
            for leaf in jax.tree_util.tree_leaves(optimizer.state)
            if hasattr(leaf, "sharding") and getattr(leaf, "ndim", 0) >= 1
            and any(d % n == 0 for d in leaf.shape)]
    assert dims and all(d is not None for d in dims)


def test_param_sharding_reaches_train_step_from_runtime():
    """The yaml runtime section selects the mode (VERDICT #5 pattern: fast
    paths must be reachable from the scenario surface, not env vars only)."""
    from mdir_tpu.learning.network import CirNetwork
    from mdir_tpu.learning.train_step import TrainStep
    from mdir_tpu.models import initialize_model
    from mdir_tpu.optim.criteria import initialize_criterion

    model = initialize_model({
        "architecture": "cirnet", "cir_architecture": "alexnet",
        "local_whitening": False, "pooling": "gem", "regional": False,
        "whitening": False, "pretrained": False})
    network = CirNetwork(model, CirNetwork.NetworkParams(
        model={}, runtime={"wrappers": "", "param_sharding": "zero"}))
    criterion = initialize_criterion(
        {"loss": "contrastive", "margin": 0.7, "eps": 1e-6})
    step = TrainStep(network, criterion, batch_average=True)
    assert step.param_sharding == "zero"
    with pytest.raises(AssertionError):
        TrainStep(network, criterion, batch_average=True,
                  param_sharding="fsdp")
