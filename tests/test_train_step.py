"""TrainStep rematerialization: size-gated, engaged above the threshold, and
numerically identical to the plain path on a mining-shaped tuple batch.

The reference keeps memory bounded with "fakebatch" per-image backwards
(``mdir/learning/epoch_iteration.py:46-75``); our whole-batch program instead
wraps the model apply in ``jax.checkpoint`` once the bucket exceeds
``MDIR_TPU_REMAT_MIN_ELEMENTS``, trading recompute for activation memory.
"""
import jax
import numpy as np


def _make_network():
    from mdir_tpu.learning.network import CirNetwork
    from mdir_tpu.models import initialize_model

    model = initialize_model({
        "architecture": "cirnet", "cir_architecture": "alexnet",
        "local_whitening": False, "pooling": "gem", "regional": False,
        "whitening": False, "pretrained": False})
    return CirNetwork(model, CirNetwork.NetworkParams(
        model={}, runtime={"wrappers": ""}))


def _tuple_batch(rng, n_tuples=2, tuple_len=4, hw=96):
    images = [[rng.rand(hw, hw, 3).astype(np.float32)
               for _ in range(tuple_len)] for _ in range(n_tuples)]
    targets = [np.array([-1.0, 1.0, 0.0, 0.0], np.float32)] * n_tuples
    return images, targets


def test_remat_engages_and_matches(monkeypatch):
    from mdir_tpu.learning.train_step import TrainStep, prepare_batch
    from mdir_tpu.optim.criteria import initialize_criterion

    network = _make_network()
    criterion = initialize_criterion(
        {"loss": "contrastive", "margin": 0.7, "eps": 1e-6})
    batch_images, batch_targets = _tuple_batch(np.random.RandomState(0))
    batch, valid, targets, _ = prepare_batch(batch_images, batch_targets)
    params = network.model.params
    key = jax.random.PRNGKey(0)

    def run(threshold):
        monkeypatch.setenv("MDIR_TPU_REMAT_MIN_ELEMENTS", str(threshold))
        step = TrainStep(network, criterion, batch_average=True)
        (loss, _aux), grads = step.gradients(params, batch, valid, targets,
                                             key)
        return float(np.asarray(loss)), grads, step

    loss_plain, grads_plain, step_plain = run(10 ** 15)
    loss_remat, grads_remat, step_remat = run(0)

    assert np.isfinite(loss_remat) and loss_remat > 0
    np.testing.assert_allclose(loss_remat, loss_plain, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(grads_plain),
                    jax.tree_util.tree_leaves(grads_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)

    # the checkpoint wrapper is actually in the traced program above the
    # threshold and absent below it
    def trace(step, threshold):
        monkeypatch.setenv("MDIR_TPU_REMAT_MIN_ELEMENTS", str(threshold))
        return str(jax.make_jaxpr(
            lambda p: step._grad_fn(p, batch, valid, targets, key))(params))

    assert "remat" in trace(step_remat, 0)
    assert "remat" not in trace(step_plain, 10 ** 15)
