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
        net_vars = {k: v for k, v in network.model.variables.items()
                    if k != "params"}
        return str(jax.make_jaxpr(
            lambda p: step._grad_fn(p, batch, valid, targets, key,
                                    None, net_vars))(params))

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


def test_batch_stats_accumulate_across_steps():
    """BN running stats must flow INTO each training step, not be baked in
    as trace-time constants: two steps on different batches end with
    different stats than one direct step on the second batch (torch
    cumulative running-average semantics; regression for the stale-stats
    closure bug)."""
    import jax

    from mdir_tpu.learning.network import initialize_network
    from mdir_tpu.optim.criteria import initialize_criterion

    def mknet():
        return initialize_network({
            "type": "SingleNetwork", "path": None,
            "model": {"architecture": "p2p_unet", "in_channels": 3,
                      "out_channels": 3, "nested_levels": 3},
            "initialize": {"weights": "normal_p2p", "seed": 0},
            "runtime": {"wrappers": "",
                        "data": {"mean_std": [[0.5] * 3, [0.5] * 3],
                                 "transforms":
                                 "pil2np | totensor | normalize"}},
        }, None)

    from mdir_tpu.learning.train_step import TrainStep, prepare_batch

    criterion = initialize_criterion({"loss": "l1"})
    rng = np.random.RandomState(0)
    mk = lambda off: [rng.rand(64, 64, 3).astype(np.float32) + off
                      for _ in range(2)]
    targets = mk(0)
    b1, v1, t1, _ = prepare_batch(mk(0), targets)
    b2, v2, t2, _ = prepare_batch(mk(5.0), targets)
    key = jax.random.PRNGKey(0)

    def stats(aux):
        return np.concatenate([np.asarray(l).ravel() for l in
                               jax.tree_util.tree_leaves(aux["net"])])

    net = mknet()
    step = TrainStep(net, criterion, batch_average=True)
    (_, aux1), _ = step.gradients(net.model.params, b1, v1, t1, key)
    net.model.variables = {**net.model.variables,
                           "batch_stats": aux1["net"]}
    (_, aux2), _ = step.gradients(net.model.params, b2, v2, t2, key)

    fresh = mknet()
    step2 = TrainStep(fresh, criterion, batch_average=True)
    (_, aux3), _ = step2.gradients(fresh.model.params, b2, v2, t2, key)

    assert not np.allclose(stats(aux2), stats(aux3)), \
        "batch_stats input is a stale trace-time constant"

    # cumulative torch/flax formula: with momentum m, the two-step result
    # equals m * stats(step1) + (1 - m) * batchstats(b2), where the second
    # term is recoverable from the fresh run: fresh = m * init + (1-m) * bs2
    init = np.concatenate([np.asarray(l).ravel() for l in
                           jax.tree_util.tree_leaves(
                               mknet().model.variables["batch_stats"])])
    m = 0.9
    bs2 = (stats(aux3) - m * init) / (1 - m)
    np.testing.assert_allclose(stats(aux2), m * stats(aux1) + (1 - m) * bs2,
                               rtol=1e-4, atol=1e-5)


def test_batched_eval_loss_equals_wrapper_path():
    """LossValidation's batched tuple program must equal the per-image
    wrapper path exactly (bucketed-extraction invariant), including
    mixed-shape tuples and the fakebatch D x N layout."""
    from mdir_tpu.learning.train_step import get_eval_loss_fn, prepare_batch
    from mdir_tpu.learning.wrappers import CirFakeTupleBatch, Compose
    from mdir_tpu.optim.criteria import initialize_criterion

    network = _make_network()
    network.wrappers["eval"] = Compose([CirFakeTupleBatch()])
    network.eval()
    criterion = initialize_criterion(
        {"loss": "contrastive", "margin": 0.7, "eps": 1e-6})

    rng = np.random.RandomState(3)
    images = [[rng.rand(96 + 8 * j, 96, 3).astype(np.float32)
               for j in range(3)] for _ in range(2)]
    targets = [np.array([-1.0, 1.0, 0.0], np.float32)] * 2

    # wrapper path (per-image applies through FakeBatch)
    flat_targets = np.concatenate([t.reshape(-1) for t in targets])
    wrapper_loss = float(np.asarray(criterion(network(images),
                                              flat_targets)))

    fn = get_eval_loss_fn(network, criterion)
    assert fn is not None
    batch, valid, tgt, n = prepare_batch(images, targets)
    net_vars = {k: v for k, v in network.model.variables.items()
                if k != "params"}
    batched_loss = float(np.asarray(fn(network.model.params, net_vars,
                                       batch, valid, tgt)))
    np.testing.assert_allclose(batched_loss, wrapper_loss, rtol=1e-5)

    # non-fusable wrappers refuse (fall back to the wrapper path)
    from mdir_tpu.learning.wrappers import ReflectPadMakeDivisible
    network.wrappers["eval"] = Compose([ReflectPadMakeDivisible(32)])
    assert get_eval_loss_fn(network, criterion) is None


def test_eval_loss_cache_does_not_pin_variables():
    """The eval-loss cache captures only the weight-free module structure;
    it must not keep the Model wrapper (and its .variables tree) alive for
    the life of the process."""
    import gc
    import weakref

    from mdir_tpu.learning.train_step import get_eval_loss_fn
    from mdir_tpu.learning.wrappers import CirFakeTupleBatch, Compose
    from mdir_tpu.optim.criteria import initialize_criterion

    network = _make_network()
    network.wrappers["eval"] = Compose([CirFakeTupleBatch()])
    network.eval()
    criterion = initialize_criterion(
        {"loss": "contrastive", "margin": 0.7, "eps": 1e-6})
    assert get_eval_loss_fn(network, criterion) is not None

    model_ref = weakref.ref(network.model)
    del network
    gc.collect()
    assert model_ref() is None, "eval-loss cache pins the Model wrapper"


def test_loss_validation_over_tuple_loader():
    """LossValidation end-to-end over a tuple loader: the batched padded
    program computes each batch's loss (equal to the wrapper path by the
    bucketed-extraction invariant), reported batch-normalized for
    sum-reduction criteria."""
    from mdir_tpu.learning.validation import LossValidation
    from mdir_tpu.learning.wrappers import CirFakeTupleBatch, Compose
    from mdir_tpu.optim.criteria import initialize_criterion

    network = _make_network()
    network.wrappers["eval"] = Compose([CirFakeTupleBatch()])
    network.eval()
    criterion = initialize_criterion(
        {"loss": "contrastive", "margin": 0.7, "eps": 1e-6})

    rng = np.random.RandomState(5)
    batches = []
    for _ in range(2):
        images = [[rng.rand(96, 96 + 8 * j, 3).astype(np.float32)
                   for j in range(3)] for _ in range(2)]
        targets = [np.array([-1.0, 1.0, 0.0], np.float32)] * 2
        batches.append((images, targets))

    class _Loader(list):
        dataset = object()  # no prepare_epoch: plain pregenerated data

    validation = LossValidation(_Loader(batches), criterion,
                                network_overlay=None, frequency=1)
    logged = []
    losses = validation.validate(
        network, None,
        lambda i, total, label, value, dtype: logged.append((label, value)))
    assert len(losses) == 2 and all(np.isfinite(l) for l in losses)

    # wrapper-path reference, batch-normalized like the class reports
    for (images, targets), got in zip(batches, losses):
        flat_targets = np.concatenate([t.reshape(-1) for t in targets])
        ref = float(np.asarray(criterion(network(images), flat_targets)))
        np.testing.assert_allclose(got, ref / len(images), rtol=1e-5)
    assert any(label == "loss" for label, _ in logged)
