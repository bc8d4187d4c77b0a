"""Optimizers and schedulers: torch-semantics parity."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mdir_tpu.optim import optimizers, schedulers


def _flat_params(value=1.0):
    return {"w": jnp.full((4,), value), "b": jnp.zeros((2,))}


def _net_parameters(params):
    return {"params": params,
            "labels": jax.tree.map(lambda _: "default", params),
            "opts": {}}


def test_sgd_matches_torch(rng):
    torch = pytest.importorskip("torch")

    w0 = rng.randn(4).astype(np.float32)
    grads = [rng.randn(4).astype(np.float32) for _ in range(3)]

    wt = torch.tensor(w0.copy(), requires_grad=True)
    opt = torch.optim.SGD([wt], lr=0.1, momentum=0.9, weight_decay=0.01)
    for g in grads:
        opt.zero_grad()
        wt.grad = torch.tensor(g)
        opt.step()

    params = {"w": jnp.asarray(w0)}
    ours = optimizers.init_sgd(_net_parameters(params), lr=0.1, momentum=0.9,
                               weight_decay=0.01)
    for g in grads:
        params = ours.apply(params, {"w": jnp.asarray(g)})
    np.testing.assert_allclose(wt.detach().numpy(), np.asarray(params["w"]),
                               rtol=1e-5, atol=1e-6)


def test_adam_matches_torch(rng):
    torch = pytest.importorskip("torch")

    w0 = rng.randn(4).astype(np.float32)
    grads = [rng.randn(4).astype(np.float32) for _ in range(4)]

    wt = torch.tensor(w0.copy(), requires_grad=True)
    opt = torch.optim.Adam([wt], lr=0.01, weight_decay=0.05)
    for g in grads:
        opt.zero_grad()
        wt.grad = torch.tensor(g)
        opt.step()

    params = {"w": jnp.asarray(w0)}
    ours = optimizers.init_adam(_net_parameters(params), lr=0.01,
                                weight_decay=0.05)
    for g in grads:
        params = ours.apply(params, {"w": jnp.asarray(g)})
    np.testing.assert_allclose(wt.detach().numpy(), np.asarray(params["w"]),
                               rtol=1e-4, atol=1e-6)


def test_optimizer_state_roundtrip(rng):
    params = _flat_params()
    opt = optimizers.init_sgd(_net_parameters(params), lr=0.1, momentum=0.9,
                              weight_decay=0.0)
    params = opt.apply(params, jax.tree.map(jnp.ones_like, params))
    state = opt.state_dict()

    opt2 = optimizers.init_sgd(_net_parameters(params), lr=0.1, momentum=0.9,
                               weight_decay=0.0)
    opt2.load_state_dict(state)
    p1 = opt.apply(params, jax.tree.map(jnp.ones_like, params))
    p2 = opt2.apply(params, jax.tree.map(jnp.ones_like, params))
    np.testing.assert_allclose(np.asarray(p1["w"]), np.asarray(p2["w"]))


def test_gamma_scheduler_matches_torch():
    torch = pytest.importorskip("torch")

    wt = torch.nn.Parameter(torch.zeros(1))
    topt = torch.optim.SGD([wt], lr=1.0)
    tsched = torch.optim.lr_scheduler.ExponentialLR(topt, gamma=0.9)

    params = _flat_params()
    opt = optimizers.init_sgd(_net_parameters(params), lr=1.0, momentum=0.0,
                              weight_decay=0.0)
    sched = schedulers.GammaScheduler(opt, last_epoch=-1, gamma=0.9)

    for _ in range(4):
        np.testing.assert_allclose(topt.param_groups[0]["lr"],
                                   opt.learning_rates["default"], rtol=1e-6)
        tsched.step()
        sched.step()


def test_gamma_exp_sugar():
    import math

    params = _flat_params()
    opt = optimizers.init_sgd(_net_parameters(params), lr=1.0, momentum=0.0,
                              weight_decay=0.0)
    sched = schedulers.GammaScheduler(opt, last_epoch=-1, gamma="exp(-0.01)")
    assert abs(sched.gamma - math.exp(-0.01)) < 1e-12


def test_lambda_scheduler_matches_torch():
    torch = pytest.importorskip("torch")

    nepochs, fixed_ratio = 10, 0.5
    rule = lambda e: 1 - max(0, e + 1 - fixed_ratio * nepochs) / \
        float((1 - fixed_ratio) * nepochs + 1)
    wt = torch.nn.Parameter(torch.zeros(1))
    topt = torch.optim.SGD([wt], lr=1.0)
    tsched = torch.optim.lr_scheduler.LambdaLR(topt, lr_lambda=rule)

    params = _flat_params()
    opt = optimizers.init_sgd(_net_parameters(params), lr=1.0, momentum=0.0,
                              weight_decay=0.0)
    sched = schedulers.LambdaScheduler(opt, last_epoch=-1, nepochs=nepochs,
                                       fixed_ratio=fixed_ratio)
    for _ in range(nepochs):
        np.testing.assert_allclose(topt.param_groups[0]["lr"],
                                   opt.learning_rates["default"], rtol=1e-6)
        tsched.step()
        sched.step()


def test_scheduler_resume():
    params = _flat_params()
    opt = optimizers.init_sgd(_net_parameters(params), lr=1.0, momentum=0.0,
                              weight_decay=0.0)
    fresh = schedulers.GammaScheduler(opt, last_epoch=-1, gamma=0.9)
    for _ in range(3):
        fresh.step()
    lr_after_3 = opt.learning_rates["default"]

    opt2 = optimizers.init_sgd(_net_parameters(params), lr=1.0, momentum=0.0,
                               weight_decay=0.0)
    resumed = schedulers.GammaScheduler(opt2, last_epoch=2, gamma=0.9)
    np.testing.assert_allclose(opt2.learning_rates["default"], lr_after_3,
                               rtol=1e-6)


def test_scheduler_set_composition(rng):
    """The 'set' composition drives one base scheduler per sub-optimizer of
    an alternation (reference scheduler/__init__.py); each sub-net's lr
    factor follows its own params."""
    from mdir_tpu.optim.schedulers import initialize_scheduler

    params_a, params_b = _flat_params(1.0), _flat_params(2.0)
    opt_a = optimizers.init_sgd(_net_parameters(params_a), lr=0.1,
                                momentum=0, weight_decay=0)
    opt_b = optimizers.init_sgd(_net_parameters(params_b), lr=0.1,
                                momentum=0, weight_decay=0)
    opts = {"a": opt_a, "b": opt_b}

    sched = initialize_scheduler(
        opts,
        {"composition": {"type": "set"},
         "a": {"algorithm": "gamma", "gamma": 0.5},
         "b": {"algorithm": "const"}},
        nepochs=4)
    for step in range(3):
        sched.step()
    def lr_of(opt):
        sub = next(iter(opt.state.inner_states.values()))
        return float(sub.inner_state.hyperparams["learning_rate"])

    assert lr_of(opt_a) == pytest.approx(0.1 * 0.5 ** 3)
    assert lr_of(opt_b) == pytest.approx(0.1)


def test_scheduler_set_over_alternation(rng):
    """The 'set' composition iterates an OptimizerAlternation's sub-nets
    (names via __iter__/__getitem__); the alternation's set_lr_factor
    broadcast also scales every member."""
    from mdir_tpu.optim.optimizers import OptimizerAlternation
    from mdir_tpu.optim.schedulers import initialize_scheduler

    def mk(value):
        params = _flat_params(value)
        return optimizers.init_sgd(_net_parameters(params), lr=0.1,
                                   momentum=0, weight_decay=0)

    alt = OptimizerAlternation({"a": mk(1.0), "b": mk(2.0)},
                               alternate_iteration=1, order="a,b")
    sched = initialize_scheduler(
        alt,
        {"composition": {"type": "set"},
         "a": {"algorithm": "lambda", "fixed_ratio": 0.5},
         "b": {"algorithm": "gamma", "gamma": 0.5}},
        nepochs=4)

    def lr_of(opt):
        sub = next(iter(opt.state.inner_states.values()))
        return float(sub.inner_state.hyperparams["learning_rate"])

    sched.step()
    sched.step()
    # lambda: factor(2) = 1 - max(0, 3 - 2)/3; gamma: 0.5^2
    assert lr_of(alt["a"]) == pytest.approx(0.1 * (1 - 1 / 3.0))
    assert lr_of(alt["b"]) == pytest.approx(0.1 * 0.25)

    # set_lr_factor on the alternation broadcasts to every member
    alt.set_lr_factor(0.5)
    assert lr_of(alt["a"]) == pytest.approx(0.05)
    assert lr_of(alt["b"]) == pytest.approx(0.05)
