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
            lambda p: step._grad_fn(p, batch, valid, targets, key,
                                    None))(params))

    assert "remat" in trace(step_remat, 0)
    assert "remat" not in trace(step_plain, 10 ** 15)


def test_device_chain_train_step_matches_host():
    """TrainStep with a DeviceChain (raw uint8 tuple batch, CLAHE fused into
    the train program) produces the same loss/grads as the host transform
    chain feeding the plain step."""
    import numpy as np

    from mdir_tpu.data.transforms import initialize_transforms
    from mdir_tpu.learning.train_step import TrainStep, prepare_batch
    from mdir_tpu.optim.criteria import initialize_criterion
    from mdir_tpu.ops.clahe import clahe_bucket_aux
    from mdir_tpu.ops.preprocess import chain_from_transform

    network = _make_network()
    criterion = initialize_criterion(
        {"loss": "contrastive", "margin": 0.7, "eps": 1e-6})
    mean_std = [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]]
    transform = initialize_transforms(
        "pil2np | apply_clahe | totensor | normalize", mean_std)
    chain = chain_from_transform(transform)
    assert chain is not None and chain.clahe_params is not None

    rng = np.random.RandomState(1)
    raw = [[(rng.rand(96 + 8 * j, 96, 3) * 255).astype(np.uint8)
            for j in range(3)] for _ in range(2)]
    targets_in = [np.array([-1.0, 1.0, 0.0], np.float32)] * 2
    params = network.model.params
    key = jax.random.PRNGKey(0)

    # host path: transform each image, then the plain step
    from PIL import Image

    host_imgs = [[transform(Image.fromarray(img)) for img in tpl]
                 for tpl in raw]
    hb, hv, ht, _ = prepare_batch(host_imgs, targets_in)
    step_host = TrainStep(network, criterion, batch_average=True)
    (loss_h, _), grads_h = step_host.gradients(params, hb, hv, ht, key)

    # device path: raw uint8 (+ host L plane unless the device recomputes
    # it bit-exactly) + fused chain
    raw_in = [[chain.host_input(img) for img in tpl] for tpl in raw]
    db, dv, dt, _ = prepare_batch(raw_in, targets_in)
    assert db.dtype == np.uint8
    assert db.shape[-1] == (4 if chain.ships_l else 3)
    clip, grid = chain.clahe_params
    aux = clahe_bucket_aux([tuple(v) for v in dv], db.shape[1:3],
                           clip_limit=clip, grid=grid)
    step_dev = TrainStep(network, criterion, batch_average=True,
                         device_chain=chain)
    (loss_d, _), grads_d = step_dev.gradients(params, db, dv, dt, key,
                                              clahe_aux=aux)

    np.testing.assert_allclose(float(loss_d), float(loss_h), rtol=2e-3)
    # cv2-vs-JAX colorspace is ~1e-3 per pixel; first-layer grads multiply
    # pixels directly, so pin per-leaf gradient direction + magnitude
    for a, b in zip(jax.tree_util.tree_leaves(grads_h),
                    jax.tree_util.tree_leaves(grads_d)):
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        assert abs(na - nb) <= 5e-2 * max(na, 1e-8), (na, nb)
        if na > 1e-8:
            cos = float(np.dot(a, b) / (na * nb))
            # residual: cv2's internal cbrt spline on the a/b channels
            # (~1e-3/px); far below SGD noise for training purposes
            assert cos > 0.995, cos
