#!/usr/bin/env python3
"""Headline benchmark: multi-scale descriptor extraction throughput.

Measures images/sec/chip for the reference's eval workload — ResNet101-GeM,
3 scales [1, 1/sqrt2, 1/2], image size 1024 — through the fused bucketed TPU
path (shape-bucketed batches, exact masked pooling, on-device multi-scale
resize + aggregation, raw-uint8 ingress with fused normalization). Prints
ONE JSON line.

Fields:
- ``value``: end-to-end images/sec including host->device ingress. On this
  harness the chip sits behind a ~20-60 MB/s tunnel, so the ceiling is the
  tunnel: ``tunnel_mbps`` is the measured raw device_put bandwidth for the
  same payloads, ``ingress_mbps`` the achieved e2e rate in bytes, and
  ``ingress_saturation`` their ratio (≈1.0 means the pipeline is
  transfer-bound and saturating the link — local-PCIe deployments see the
  device-resident rate instead). The tunnel's rate swings several-fold
  within a run, so a probe minutes from the pass can measure a different
  link: the ``budget_*`` fields decompose the BEST pass's wall time on the
  producer timeline (fill + stream + drain + sync = wall, exactly), with
  ``downstream_wait_frac`` the swing-proof limiter signal — the fraction
  of the pass the producer spent waiting on the uplink/wire/device. The
  r03 ``ingress_occupancy`` field (put-time / wall) is retired: a live
  probe showed ``jnp.asarray`` puts are async on axon (a 37 MB payload
  "puts" in ~27 ms against a ~30-40 MB/s wire), so put time never measured
  wire time — the wire drains in ``budget_sync_s``.
- ``device_resident_imgs_per_sec``: the same fused program with inputs
  already in HBM — the chip-side rate.
- ``device_tflops`` / ``mfu_vs_bf16_peak``: achieved TFLOP/s from XLA's
  compiled cost analysis over the resident run, and its fraction of the
  v5e bf16 peak (197 TFLOP/s) — the f32 run's MFU is naturally bounded
  around half of peak.
- ``bf16_*``: the resident run with MDIR_TPU_COMPUTE_DTYPE=bfloat16 trunk
  compute + descriptor cosine vs f32 (quality delta of the fast path).
- ``pallas_device_resident_imgs_per_sec``: resident rate with the fused
  Pallas GeM+L2N pooling in the graph (MDIR_TPU_PALLAS=1).

``vs_baseline`` is relative to the reference implementation's regime: torch
bs=1 multi-scale extraction on a single V100 runs ~15 images/s for
ResNet101@1024 (the reference publishes no throughput numbers — SURVEY.md §6).
"""
import json
import math
import os
import sys
import time

import numpy as np

REFERENCE_IMGS_PER_SEC = 15.0
V5E_BF16_PEAK_FLOPS = 197e12
V5E_HBM_BYTES_PER_SEC = 819e9


def _program_cost(lowered):
    """(flops, bytes_accessed) from XLA's compiled cost analysis."""
    try:
        cost = lowered.compile().cost_analysis()
        if not cost:
            return None, None
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        return (float(cost.get("flops", 0.0)) or None,
                float(cost.get("bytes accessed", 0.0)) or None)
    except Exception:
        return None, None


def _roofline_fields(prefix, flops, bytes_, seconds_per_call):
    """The program's own empirical roofline: floor = max(MXU time at bf16
    peak, HBM time at 819 GB/s) over XLA's *executed* flops/bytes;
    ``*_roofline_frac`` = floor / measured (1.0 = the program runs at the
    speed of light for what it actually executes — lowering waste like
    conv_transpose's zero-taps still counts as executed flops, see
    docs/MFU.md)."""
    if not flops or not seconds_per_call:
        return {}
    floor = flops / V5E_BF16_PEAK_FLOPS
    if bytes_:
        floor = max(floor, bytes_ / V5E_HBM_BYTES_PER_SEC)
    return {prefix + "roofline_floor_ms": round(floor * 1e3, 2),
            prefix + "roofline_frac": round(floor / seconds_per_call, 3),
            **({prefix + "bytes_accessed_gb": round(bytes_ / 1e9, 2)}
               if bytes_ else {})}


def _sync(x):
    """Hard sync: host read (block_until_ready is a no-op on axon)."""
    return np.asarray(x[(0,) * (x.ndim - 1)][..., :1])


def _measure_tunnel(batch, reps=2):
    """Raw host->device bandwidth for the benchmark's own payload."""
    import jax

    best = float("inf")
    for _ in range(reps):
        start = time.time()
        dev = jax.device_put(batch)
        _sync(dev)
        best = min(best, time.time() - start)
        del dev
    return batch.nbytes / best / 1e6


def _resident_args(model, mean_std, max_batch, shape, scales):
    import jax
    import jax.numpy as jnp

    from mdir_tpu.ops.resize import torch_resize_grid
    from mdir_tpu.parallel.extract import _round_up

    rng = np.random.RandomState(1)
    h, w = shape
    batch = (rng.rand(max_batch, h, w, 3) * 255).astype(np.uint8)
    valid = np.tile(np.array([[h, w]], np.int32), (max_batch, 1))

    def grids_for(scale):
        oh_b, ow_b = _round_up(int(h * scale), 64), _round_up(int(w * scale), 64)
        oh, ow = int(h * scale), int(w * scale)
        gy0, gy1, gwy = torch_resize_grid(h, oh, scale)
        gx0, gx1, gwx = torch_resize_grid(w, ow, scale)

        def pack(i0, i1, wt, n):
            out = np.zeros((max_batch, n, 3), np.float32)
            out[:, :len(i0), 0] = i0
            out[:, :len(i1), 1] = i1
            out[:, :len(wt), 2] = wt
            return jnp.asarray(out)

        return (pack(gy0, gy1, gwy, oh_b), pack(gx0, gx1, gwx, ow_b),
                jnp.asarray(np.tile(np.array([[oh, ow]], np.int32),
                                    (max_batch, 1))))

    grids = tuple(None if s == 1 else grids_for(s) for s in scales)
    dev = jax.device_put(batch)
    vdev = jnp.asarray(valid)
    mean = jnp.asarray(mean_std[0], jnp.float32)
    std = jnp.asarray(mean_std[1], jnp.float32)
    P = m = jnp.zeros((0,), jnp.float32)
    return (dev, vdev, grids, None, None, jnp.float32(3.0), P, m, mean, std)


def _measure_resident(model, args, compute_dtype=None, reps=4):
    """Chip-side rate + achieved FLOP/s of the fused multiscale program."""
    import jax

    from mdir_tpu.parallel.extract import _get_fused

    scales = (1, 1.0 / math.sqrt(2), 0.5)
    variables = model.variables
    if compute_dtype is not None:
        from mdir_tpu.ops.dtypes import cast_f32_tree

        variables = cast_f32_tree(variables, compute_dtype)
    fused = _get_fused(model.module, scales, False, True, compute_dtype)

    try:
        flops, bytes_ = _program_cost(fused.lower(variables, *args))
    except Exception:
        flops = bytes_ = None

    out = fused(variables, *args)
    _sync(out)  # compile + warm
    max_batch = args[0].shape[0]
    start = time.time()
    outs = [fused(variables, *args) for _ in range(reps)]
    # sync the LAST rep only (device execution is serial, so the last
    # output being readable implies every rep finished) — per-rep
    # readbacks serialize a ~35 ms tunnel round trip into every rep and
    # understate the chip rate (see _measure_chain_resident)
    last = np.asarray(outs[-1])
    elapsed = time.time() - start
    rate = reps * max_batch / elapsed
    tflops = (flops * reps / elapsed / 1e12) if flops else None
    roof = _roofline_fields("", flops, bytes_, elapsed / reps)
    return rate, tflops, last, roof


def _measure_chain_resident(model, mean_std, max_batch, shape, scales,
                            compute_dtype=None):
    """Chip-side rate of the fused apply_clahe chain (uint8 RGB resident).

    ``compute_dtype`` runs the chain's trunk at the production dtype (the
    chain's own photometric math keeps its exact integer/f32 pipeline
    either way)."""
    import jax
    import jax.numpy as jnp

    from mdir_tpu.data.transforms import initialize_transforms
    from mdir_tpu.ops.clahe import clahe_bucket_aux, pack_clahe_aux
    from mdir_tpu.ops.preprocess import chain_from_transform
    from mdir_tpu.parallel.extract import _get_fused

    chain = chain_from_transform(initialize_transforms(
        "pil2np | apply_clahe | totensor | normalize", list(mean_std)))
    h, w = shape
    rng = np.random.RandomState(2)
    n_chan = 4 if chain.ships_l else 3  # device-L mode ships plain RGB
    batch = jax.device_put(
        rng.randint(0, 256, (max_batch, h, w, n_chan)).astype(np.uint8))
    args = _resident_args(model, mean_std, max_batch, shape, scales)
    aux = tuple(jnp.asarray(a) for a in pack_clahe_aux(clahe_bucket_aux(
        [(h, w)] * max_batch, (h, w), *chain.clahe_params)))
    variables = model.variables
    if compute_dtype is not None:
        from mdir_tpu.ops.dtypes import cast_f32_tree

        variables = cast_f32_tree(variables, compute_dtype)
    fused = _get_fused(model.module, scales, False, False, compute_dtype,
                       chain=chain)
    # (variables, batch, valid, grids, clahe_aux, boxes, msp, P, m, mean, std)
    zero = jnp.zeros((0,), jnp.float32)
    call = (variables, batch, args[1], args[2], aux, None,
            jnp.float32(3.0), zero, zero, zero, zero)
    out = fused(*call)
    _sync(out)
    # sync the LAST rep only: device execution is serial, so the last
    # output being readable implies every rep finished. Reading each rep's
    # descriptors (128 KB over the tunnel, ~35 ms) serialized a readback
    # into every rep and understated the chip rate by ~17% (77 vs 92
    # img/s measured on the same program).
    reps = 6
    best = float("inf")
    for _ in range(3):
        start = time.time()
        outs = [fused(*call) for _ in range(reps)]
        _sync(outs[-1])
        best = min(best, time.time() - start)
    return reps * max_batch / best


def _measure_train_step(model, compute_dtype="auto", reps=3):
    """Training-step rates at the reference's production tuple geometry:
    5 tuples x (q, p, 5 negatives) at image_size 362 (cirtorch train.py
    defaults), whole-batch contrastive step with size-gated remat.

    Production shape: the tuple loader ships raw uint8 with the normalize
    chain fused on device (epoch_iteration lowers the host transform), so
    the e2e number pays a ~13.8 MB/step u8 ingress (35 images x 362^2 x 3)
    — on this harness that rides the tunnel and IS the limiter. The resident number times the
    same compiled step on device-staged inputs: the chip-side training
    rate (and the MFU denominator). ``compute_dtype`` follows the
    production policy (bf16 + first-step guard) unless overridden.
    Returns (e2e_rate, resident_rate, resident_tflops, dtype).
    """
    import jax

    from mdir_tpu.data.transforms import initialize_transforms
    from mdir_tpu.learning.network import CirNetwork
    from mdir_tpu.learning.train_step import TrainStep, prepare_batch
    from mdir_tpu.optim.criteria import initialize_criterion
    from mdir_tpu.ops.preprocess import chain_from_transform

    mean_std = (model.meta["mean"], model.meta["std"])
    chain = chain_from_transform(initialize_transforms(
        "pil2np | totensor | normalize", list(mean_std)))
    network = CirNetwork(model, CirNetwork.NetworkParams(
        model={}, runtime={"wrappers": ""}))
    criterion = initialize_criterion(
        {"loss": "contrastive", "margin": 0.7, "eps": 1e-6})
    step = TrainStep(network, criterion, batch_average=True,
                     device_chain=chain, compute_dtype=compute_dtype)

    rng = np.random.RandomState(3)
    tuples = [[(rng.rand(362, 362, 3) * 255).astype(np.uint8)
               for _ in range(7)] for _ in range(5)]
    targets = [np.array([-1.0, 1.0] + [0.0] * 5, np.float32)] * 5
    batch, valid, tgt, _ = prepare_batch(tuples, targets)
    params = network.model.params
    key = jax.random.PRNGKey(0)

    (loss, _), grads = step.gradients(params, batch, valid, tgt, key)
    _sync(jax.tree_util.tree_leaves(grads)[0])  # compile + warm (+ guard)

    flops = None
    bytes_ = None
    try:
        net_vars = {k: v for k, v in network.model.variables.items()
                    if k != "params"}
        flops, bytes_ = _program_cost(step._grad_fn.lower(
            params, batch, valid, tgt, key, None, net_vars))
    except Exception:
        pass

    start = time.time()
    for _ in range(reps):
        (loss, _), grads = step.gradients(params, batch, valid, tgt, key)
    _sync(jax.tree_util.tree_leaves(grads)[0])
    e2e_rate = reps * len(tuples) / (time.time() - start)

    # chip-side: same program, inputs staged in HBM
    dev = (jax.device_put(params), jax.device_put(batch),
           jax.device_put(valid), jax.device_put(tgt), key, None,
           jax.device_put({k: v for k, v in network.model.variables.items()
                           if k != "params"}))
    _sync(jax.tree_util.tree_leaves(step._grad_fn(*dev)[1])[0])
    start = time.time()
    for _ in range(reps):
        (loss, _), grads = step._grad_fn(*dev)
    _sync(jax.tree_util.tree_leaves(grads)[0])
    resident_elapsed = time.time() - start
    resident_rate = reps * len(tuples) / resident_elapsed
    tflops = (flops * reps / resident_elapsed / 1e12) if flops else None
    roof = _roofline_fields("train_", flops, bytes_,
                            resident_elapsed / reps)

    # mining->train handoff ceiling: every tuple image warm in the device
    # cache (the guaranteed population — mining just shipped them), so a
    # step pays on-device assembly + grad instead of decode + wire. The
    # real epoch lands between this and the e2e rate per the miss share.
    from mdir_tpu.parallel.device_cache import CachedImageRef, \
        DeviceImageCache

    cache = DeviceImageCache(1024)
    flat = [img for tpl in tuples for img in tpl]
    up64 = lambda v: -(-v // 64) * 64
    refs = []
    for i, img in enumerate(flat):
        h, w = img.shape[:2]
        padded = np.zeros((up64(h), up64(w), 3), np.uint8)
        padded[:h, :w] = img
        cache.put("bench%d" % i, padded, (h, w))
        refs.append(CachedImageRef("bench%d" % i, (h, w)))
    net_vars_dev = jax.device_put(
        {k: v for k, v in network.model.variables.items() if k != "params"})
    params_dev = jax.device_put(params)

    tgt_dev = jax.device_put(tgt)

    def cached_step():
        b, v, _ = cache.assemble_train_batch(refs)
        return step._grad_fn(params_dev, b, v, tgt_dev, key,
                             None, net_vars_dev)[1]

    _sync(jax.tree_util.tree_leaves(cached_step())[0])  # compile + warm
    start = time.time()
    for _ in range(reps):
        grads_c = cached_step()
    _sync(jax.tree_util.tree_leaves(grads_c)[0])
    roof["train_cached_tuples_per_sec"] = round(
        reps * len(tuples) / (time.time() - start), 2)
    return (e2e_rate, resident_rate, tflops,
            step.compute_dtype or "float32", roof)


def _measure_unet_resident(reps=4, batch=8, hw=(512, 768)):
    """Device-resident forward rate of the p2p U-Net translation family
    (the eval_composition.yml workload's first stage — reference
    mdir/components/model/unet.py). One jitted program at a
    composition-typical shape (256-divisible: 8 stride-2 stages)."""
    import jax
    import jax.numpy as jnp

    from mdir_tpu.models import initialize_model

    model = initialize_model({"architecture": "p2p_unet",
                              "in_channels": 3, "out_channels": 3})
    module, variables = model.module, model.variables
    fwd = jax.jit(lambda v, x: module.apply(v, x, train=False))
    x = jnp.asarray(np.random.RandomState(5).rand(batch, *hw, 3),
                    jnp.float32)
    flops, bytes_ = _program_cost(fwd.lower(variables, x))
    _sync(fwd(variables, x))  # compile + warm
    start = time.time()
    outs = [fwd(variables, x) for _ in range(reps)]
    # single-element host read: a full-array read would drag ~38 MB of
    # image egress through the tunnel INTO the timed window
    _sync(outs[-1])
    elapsed = time.time() - start
    rate = reps * batch / elapsed
    tflops = (flops * reps / elapsed / 1e12) if flops else None
    roof = _roofline_fields("unet_", flops, bytes_, elapsed / reps)
    return rate, tflops, roof


def _measure_infer(reps=2, hw=(768, 1024), n_images=None, max_batch=None,
                   t_params=None, wrappers="reflectpad_divisible:256"):
    """infer-stage bulk dataset translation (SURVEY 3.5): uint8 ingress ->
    device normalize -> p2p U-Net at pad-256 full res -> host readback,
    through the PRODUCTION StreamingTranslator (shape-grouped batches,
    depth-2 transfer/compute pipelining) that the rebuilt infer stage uses.
    The reference shape of this workload is a bs=1 per-image loop
    (mdir/stages/infer.py:46-53). e2e + device-resident rates."""
    import jax
    import jax.numpy as jnp

    from mdir_tpu.learning.network import Network, SingleNetwork
    from mdir_tpu.models import initialize_model
    from mdir_tpu.parallel.translate import StreamingTranslator

    n_images = n_images or int(os.environ.get("BENCH_INFER_IMAGES", "8"))
    max_batch = max_batch or int(os.environ.get("BENCH_INFER_BATCH", "4"))
    t_params = t_params or {"architecture": "p2p_unet", "in_channels": 3,
                            "out_channels": 3}
    network = SingleNetwork(
        initialize_model(dict(t_params)),
        SingleNetwork.NetworkParams(model=t_params,
                                    runtime={"wrappers": ""}))
    network.wrappers = Network.initialize_wrappers(wrappers)
    network.eval()

    rng = np.random.RandomState(11)
    arrays = [rng.randint(0, 256, hw + (3,)).astype(np.uint8)
              for _ in range(n_images)]
    nbytes = sum(a.nbytes for a in arrays)
    mean_std = ([0.5] * 3, [0.5] * 3)
    delivered = []

    # ONE translator reused across reps (the production shape: a real infer
    # run streams thousands of images through one translator, so the
    # device-u8 guard's single f32 download and the jit trace amortize out)
    translator = StreamingTranslator(
        network, lambda i, inp, out: delivered.append(i),
        mean_std=mean_std, max_batch=max_batch,
        device_u8=os.environ.get("MDIR_TPU_INFER_DEVICE_U8", "1") != "0")

    def run():
        delivered.clear()
        for i, arr in enumerate(arrays):
            translator.add(i, arr)
        translator.finish()
        assert len(delivered) == n_images

    run()  # compile + warm (one program per shape group)
    probe = np.concatenate([a.reshape(-1) for a in arrays[:max_batch]])
    best, window = float("inf"), 0.0
    for _ in range(reps):
        start = time.time()
        run()
        pass_s = time.time() - start
        pass_tunnel = _measure_tunnel(probe, reps=1)
        if pass_s < best:
            best, window = pass_s, pass_tunnel
    out = {"infer_imgs_per_sec": round(n_images / best, 2)}
    if translator._u8_ok is not None:
        # device-u8 egress guard verdict on THIS chip (downloads drop 4x
        # when True; False = bit-equality cross-check failed, f32 fallback)
        out["infer_device_u8_ok"] = bool(translator._u8_ok)
    rate = nbytes / best / 1e6
    out["infer_ingress_saturation"] = round(rate / max(window, rate), 2)
    out["infer_window_mbps"] = round(window, 1)
    wire_probe = nbytes / window / 1e6 if window else 0.0
    wire_40 = nbytes / 40e6
    out["infer_at_40mbps_imgs_per_sec"] = round(
        n_images / max(best - wire_probe + wire_40, wire_40), 2)

    # chip-side ceiling: the same jitted program on a device-staged batch
    apply = network._jitted_apply()
    variables = network.model.variables
    staged = np.stack(arrays[:max_batch]).astype(np.float32) / 255.0
    staged = (staged - np.asarray(mean_std[0], np.float32)) \
        / np.asarray(mean_std[1], np.float32)
    dev = jax.device_put(staged)
    _sync(apply(variables, dev))
    start = time.time()
    outs = [apply(variables, dev) for _ in range(4)]
    _sync(outs[-1])
    res_elapsed = time.time() - start
    out["infer_resident_imgs_per_sec"] = round(
        4 * max_batch / res_elapsed, 1)
    return out


def _measure_composed(reps=3, batch=None, hw=(768, 1024)):
    """Device-resident rate of the eval_composition.yml workload: p2p U-Net
    night->day translation at pad-divisible resolution -> VGG16-GeM
    multiscale embedding (reference eval_composition.yml:1-11, composed
    forward network.py:227-236). ONE fused program runs all 3 scales per
    chunk (the production shape) with the production composed geometry
    (exact scale-resize + replicate-pad + masked embedder), rate counted
    per IMAGE (all 3 scales included)."""
    import jax
    import jax.numpy as jnp

    from mdir_tpu.models import initialize_model
    from mdir_tpu.ops.dtypes import cast_f32_tree, resolve_compute_dtype
    from mdir_tpu.parallel.extract import (_get_composed, composed_crop_hws,
                                           composed_pack_grids)

    batch = batch or int(os.environ.get("BENCH_COMPOSED_BATCH", "4"))
    t_model = initialize_model({"architecture": "p2p_unet",
                                "in_channels": 3, "out_channels": 3})
    e_model = initialize_model({
        "architecture": "cirnet", "cir_architecture": "vgg16",
        "local_whitening": False, "pooling": "gem", "regional": False,
        "whitening": False, "pretrained": False})
    compute_dtype, _ = resolve_compute_dtype({})
    t_vars, e_vars = t_model.variables, e_model.variables
    if compute_dtype is not None:
        t_vars = cast_f32_tree(t_vars, compute_dtype)
        e_vars = cast_f32_tree(e_vars, compute_dtype)
    fused = _get_composed(t_model, e_model, True, compute_dtype)

    rh, rw = hw
    # p2p U-Net: 8 stride-2 downsamplings (the outer down_0 conv + 7 nested
    # levels), so spatial dims must be divisible by 256 — 128 leaves an odd
    # extent at the bottom level and the skip-concat shape-errors
    divisor = 256
    rng = np.random.RandomState(6)
    dev_batch = jax.device_put(
        rng.randint(0, 256, (batch, rh, rw, 3)).astype(np.uint8))
    mean = jnp.asarray(e_model.meta["mean"], jnp.float32)
    std = jnp.asarray(e_model.meta["std"], jnp.float32)
    msp = jnp.float32(float(e_model.pool_p))

    packs, pads, flops = [], [], 0.0
    scales = (1, 1.0 / math.sqrt(2), 0.5)
    for scale in scales:
        sh = int(math.floor(rh * scale)) if scale != 1 else rh
        sw = int(math.floor(rw * scale)) if scale != 1 else rw
        ph, pw = -(-sh // divisor) * divisor, -(-sw // divisor) * divisor
        pads.append((ph, pw))
        # the production transfer geometry, verbatim (shared helper)
        yrow, xrow, valid_hw = composed_pack_grids(rh, rw, scale, divisor,
                                                   ph, pw)
        ypack = np.tile(yrow[None], (batch, 1, 1))
        xpack = np.tile(xrow[None], (batch, 1, 1))
        valid = jnp.asarray(np.tile(np.array([valid_hw], np.int32),
                                    (batch, 1)))
        packs.append((valid, jnp.asarray(ypack), jnp.asarray(xpack)))

    # all 3 scales run inside ONE program per chunk (the production shape,
    # incl. the 64-aligned embedder crop)
    call = (dev_batch, tuple(packs), mean, std, msp,
            composed_crop_hws((rh, rw), pads, scales))
    bytes_ = None
    try:
        flops, bytes_ = _program_cost(fused.lower(t_vars, e_vars, *call))
        flops = flops or 0.0
    except Exception:
        pass

    _sync(fused(t_vars, e_vars, *call))  # compile + warm
    start = time.time()
    for _rep in range(reps):
        out = fused(t_vars, e_vars, *call)
    _sync(out)
    elapsed = time.time() - start
    rate = reps * batch / elapsed
    tflops = (flops * reps / elapsed / 1e12) if flops else None
    roof = _roofline_fields("composed_", flops, bytes_, elapsed / reps)
    return rate, tflops, compute_dtype or "float32", roof


def _measure_composed_e2e(reps=3, hw=(768, 1024), max_batch=None):
    """e2e streaming rate of the composition workload over the tunnel:
    uint8 ingress -> device normalize -> p2p U-Net translation at
    pad-divisible full res -> VGG16-GeM multiscale embedding, through the
    PRODUCTION ``extract_vectors_composed`` path (the eval_composition.yml
    pipeline; reference eval_composition.yml:1-11, SequentialNetwork fwd
    network.py:227-236). Best of ``reps`` passes, each scored against an
    adjacent tunnel probe; returns the bench fields incl. the best pass's
    budget decomposition."""
    import jax.numpy as jnp

    from mdir_tpu.data.transforms import initialize_transforms
    from mdir_tpu.learning.network import (CirNetwork, Network,
                                           SequentialNetwork, SingleNetwork)
    from mdir_tpu.models import initialize_model
    from mdir_tpu.parallel.extract import extract_vectors_composed

    n_images = int(os.environ.get("BENCH_COMPOSED_E2E_IMAGES", "12"))
    max_batch = max_batch or int(os.environ.get("BENCH_COMPOSED_BATCH", "4"))
    t_params = {"architecture": "p2p_unet", "in_channels": 3,
                "out_channels": 3}
    e_params = {"architecture": "cirnet", "cir_architecture": "vgg16",
                "local_whitening": False, "pooling": "gem", "regional": False,
                "whitening": False, "pretrained": False}
    translator = SingleNetwork(
        initialize_model(dict(t_params)),
        SingleNetwork.NetworkParams(model=t_params,
                                    runtime={"wrappers": ""}))
    # the paper U-Net's eval wrapper: centered reflect-pad to the net's
    # divisor of 256 (8 stride-2 downsamplings: down_0 + 7 nested levels)
    translator.wrappers = Network.initialize_wrappers(
        "reflectpad_divisible:256")
    embedder = CirNetwork(
        initialize_model(dict(e_params)),
        CirNetwork.NetworkParams(
            model=e_params,
            runtime={"wrappers": {"train": None,
                                  "eval": {"0_cirmultiscale":
                                           {"scales": True}}}}))
    network = SequentialNetwork({"translate": translator, "embed": embedder},
                                ["translate", "embed"]).eval()

    mean_std = (embedder.model.meta["mean"], embedder.model.meta["std"])
    transform = initialize_transforms("pil2np | totensor | normalize",
                                      [list(mean_std[0]), list(mean_std[1])])
    rng = np.random.RandomState(7)
    arrays = [rng.randint(0, 256, hw + (3,)).astype(np.uint8)
              for _ in range(n_images)]
    nbytes = sum(a.nbytes for a in arrays)
    probe = np.concatenate([a.reshape(-1) for a in arrays[:max_batch]])

    def run():
        instrument = {}
        vecs = extract_vectors_composed(network, arrays, hw[1], transform,
                                        max_batch=max_batch,
                                        instrument=instrument)
        return vecs, instrument

    run()  # compile + warm (incl. the first-chunk f32 dtype cross-check)
    elapsed, sat, best_budget = float("inf"), 0.0, {}
    for _ in range(reps):
        start = time.time()
        vecs, instrument = run()
        pass_elapsed = time.time() - start
        pass_tunnel = _measure_tunnel(probe, reps=1)
        # shipped bytes from the per-chunk stats, NOT n_images x nbytes:
        # chunk padding (bucket rounding, device-count round-up) makes the
        # wire bytes differ from the raw image bytes, and the accounting
        # must follow the transfer scheme (scales now share one raw-batch
        # transfer; an earlier per-scale scheme shipped 3x and read a
        # saturated link as ~0.33)
        shipped = sum(e["bytes"] for e in instrument["stats"]) or nbytes
        pass_rate = shipped / pass_elapsed / 1e6
        sat = max(sat, pass_rate / max(pass_tunnel, pass_rate))
        if pass_elapsed < elapsed:
            elapsed = pass_elapsed
            best_budget = _pass_budget(start, pass_elapsed,
                                       instrument.get("stats"),
                                       instrument.get("budget"), shipped,
                                       pass_tunnel, n_items=n_images)
    assert np.isfinite(vecs).all()
    out = {"composed_e2e_imgs_per_sec": round(n_images / elapsed, 2),
           "composed_ingress_saturation": round(sat, 2)}
    out.update({"composed_" + k: v for k, v in best_budget.items()})
    return out


def _measure_mining(model, mean_std, compute_dtype, dtype_guard,
                    n_images=None, max_batch=16, probe_mbps=None):
    """Hard-negative-mining cost, decomposed (the reference's dominant
    training cost: cirtorch traindataset.py:178-271 re-embeds ~24k images
    per epoch at image_size 362, single scale, then ranks pool vs queries).

    Returns a dict of fields:
      mining_imgs_per_sec            e2e streaming rate (uint8 over the
                                     link + fused extraction + ranking)
      mining_resident_imgs_per_sec   chip-side rate of the same compiled
                                     bucket programs on device-staged
                                     batches — the non-link-bound ceiling
      mining_rank_s                  on-device ranking (scores matmul +
                                     argsort) for the full pool
      mining_budget_*                pass budget of the best e2e pass
                                     (same partition as the headline pass)
      mining_epoch_projection_s      24k-image epoch at the e2e rate
      mining_epoch_resident_s        24k-image epoch at the resident rate
    """
    import jax
    import jax.numpy as jnp

    from mdir_tpu.ops.ranking import rank_database
    from mdir_tpu.parallel.extract import StreamingExtractor

    n_images = n_images or int(os.environ.get("BENCH_MINING_IMAGES", "1024"))
    rng = np.random.RandomState(4)
    shapes = [(271, 362), (362, 271), (362, 362)]
    arrays = [(rng.rand(*shapes[i % 3], 3) * 255).astype(np.uint8)
              for i in range(n_images)]
    nbytes = sum(a.nbytes for a in arrays)
    n_q = max(n_images // 10, 1)

    def run():
        ext = StreamingExtractor(
            model, scales=[1], msp=1.0, max_batch=max_batch,
            normalize_mean_std=mean_std, compute_dtype=compute_dtype,
            dtype_guard=dtype_guard)
        for i, arr in enumerate(arrays):
            ext.add(i, arr)
        vecs = ext.finish(len(arrays))
        ranks = rank_database(jnp.asarray(vecs, jnp.float32),
                              jnp.asarray(vecs[:, :n_q], jnp.float32))
        return vecs, np.asarray(ranks), list(ext.stats or ()), \
            dict(ext.budget or {})

    run()  # compile + warm every bucket program
    elapsed = float("inf")
    best = None
    probe = np.concatenate([a.reshape(-1) for a in arrays[:max_batch]])
    for _ in range(2 if n_images >= 512 else 3):
        start = time.time()
        vecs, _ranks, stats, budget = run()
        pass_s = time.time() - start
        # adjacent probe: the pass's own window, not the headline pass's
        pass_tunnel = _measure_tunnel(probe, reps=1)
        if pass_s < elapsed:
            elapsed, best = pass_s, (start, pass_s, stats, budget,
                                     pass_tunnel)
    assert np.isfinite(vecs).all()
    out = {"mining_imgs_per_sec": round(n_images / elapsed, 1)}
    out.update({"mining_" + k: v for k, v in _pass_budget(
        best[0], best[1], best[2], best[3], nbytes, best[4],
        n_items=n_images).items()})

    # chip-side ceiling: same fused programs on device-staged batches
    # (what mining would run at behind a non-tunnel host), covering all
    # three aspect buckets the e2e pass compiles
    from mdir_tpu.ops.dtypes import cast_f32_tree
    from mdir_tpu.parallel.extract import _get_fused, _round_up

    variables = model.variables
    if compute_dtype is not None:
        variables = cast_f32_tree(variables, compute_dtype)
    fused = _get_fused(model.module, [1], False, True, compute_dtype)
    mean = jnp.asarray(mean_std[0], jnp.float32)
    std = jnp.asarray(mean_std[1], jnp.float32)
    zero = jnp.zeros((0,), jnp.float32)
    calls = []
    for hw in shapes:
        pad = np.zeros((max_batch, _round_up(hw[0], 64),
                        _round_up(hw[1], 64), 3), np.uint8)
        pad[:, :hw[0], :hw[1]] = rng.randint(
            0, 256, (max_batch,) + hw + (3,)).astype(np.uint8)
        valid = jnp.asarray(np.tile(np.asarray([hw], np.int32),
                                    (max_batch, 1)))
        calls.append((jax.device_put(pad), valid, (None,), None, None,
                      jnp.float32(1.0), zero, zero, mean, std))
    outs = [fused(variables, *c) for c in calls]
    _ = [_sync(o) for o in outs]  # compile + warm
    reps = 4
    start = time.time()
    for _rep in range(reps):
        outs = [fused(variables, *c) for c in calls]
    _ = [_sync(o) for o in outs]
    res_elapsed = time.time() - start
    out["mining_resident_imgs_per_sec"] = round(
        reps * max_batch * len(calls) / res_elapsed, 1)

    # ranking alone (pool x queries scores + argsort), pipelined sync
    db = jnp.asarray(vecs, jnp.float32)
    q = jnp.asarray(vecs[:, :n_q], jnp.float32)
    ranked = jax.jit(rank_database)
    _sync(ranked(db, q))
    start = time.time()
    rank_outs = [ranked(db, q) for _ in range(4)]
    _sync(rank_outs[-1])
    out["mining_rank_s"] = round((time.time() - start) / 4, 4)

    out["mining_epoch_projection_s"] = round(
        24000 / out["mining_imgs_per_sec"], 1)
    out["mining_epoch_resident_s"] = round(
        24000 / out["mining_resident_imgs_per_sec"], 1)

    # device-resident image cache (the same pixels re-ship every epoch —
    # cirtorch traindataset.py:189-204 draws from fixed pools): cold pass
    # fills it over the wire, warm pass is the 100%-hit ceiling. Real-epoch
    # hit rates (fixed qpool + 20k-of-91k negative redraws) sit between;
    # docs/MINING_CACHE.md carries the parametric projection.
    if os.environ.get("BENCH_MINING_CACHE", "1") != "0":
        try:
            from mdir_tpu.parallel.device_cache import DeviceImageCache

            cache = DeviceImageCache(budget_mb=float(
                os.environ.get("BENCH_MINING_CACHE_MB", "2048")))

            def run_cached():
                ext = StreamingExtractor(
                    model, scales=[1], msp=1.0, max_batch=max_batch,
                    normalize_mean_std=mean_std,
                    compute_dtype=compute_dtype, dtype_guard=dtype_guard,
                    cache=cache)
                for i, arr in enumerate(arrays):
                    key = "img%d" % i
                    if cache.matches(key, ext.bucket_multiple):
                        ext.add_cached(i, key)
                    else:
                        ext.add(i, arr, key=key)
                return ext.finish(len(arrays))

            start = time.time()
            cold_vecs = run_cached()
            out["mining_cache_cold_imgs_per_sec"] = round(
                n_images / (time.time() - start), 1)
            warm_elapsed = float("inf")
            for _ in range(2):
                start = time.time()
                warm_vecs = run_cached()
                warm_elapsed = min(warm_elapsed, time.time() - start)
            out["mining_cache_warm_imgs_per_sec"] = round(
                n_images / warm_elapsed, 1)
            out["mining_cache_mb_used"] = round(
                cache.stats()["bytes"] / 1e6, 1)
            out["mining_cache_entries"] = cache.stats()["entries"]
            drift = float(np.abs(np.asarray(warm_vecs)
                                 - np.asarray(cold_vecs)).max())
            out["mining_cache_drift"] = round(drift, 7)  # must be 0.0
            out["mining_epoch_projection_warm_s"] = round(
                24000 / out["mining_cache_warm_imgs_per_sec"], 1)
        except Exception as exc:
            out["mining_cache_error"] = str(exc)[:200]
    return out


def _pass_budget(pass_start, wall, stats, budget, nbytes, probe_mbps,
                 n_items=None):
    """Decompose a streaming pass's wall time on the producer timeline.

    Exact partition (the four ``budget_*`` interval fields sum to
    ``budget_wall_s`` by construction — consecutive intervals on the
    producer thread):

      fill   = first-chunk host fill (pass start -> first _submit)
      stream = producer loop (batch assembly + adds + submit backpressure)
      drain  = waiting for the uplink thread to finish queued chunks
      sync   = host reads of the results. Probe-verified on axon:
               ``jnp.asarray`` puts are ASYNC (a 37 MB payload "puts" in
               ~27 ms while the wire moves ~30-40 MB/s), so the wire and
               device compute drain HERE, not inside put calls. This is
               why r03's put-time "occupancy" (0.54) undershot a
               saturated link — put time is dispatch, not wire time.

    Overlapped uplink-thread components (put/pack/launch/queue-wait) are
    reported for attribution but are NOT part of the partition; the
    structural floor is ``budget_wire_s_at_probe`` = bytes / the
    pass-adjacent probed link rate.
    """
    out = {"budget_wall_s": wall}
    if budget:
        t_first = budget.get("t_first_submit", pass_start)
        t_drain = budget.get("t_drain_start", pass_start + wall)
        out["budget_fill_s"] = t_first - pass_start
        out["budget_stream_s"] = t_drain - t_first
        out["budget_drain_s"] = budget.get("drain_s", 0.0)
        out["budget_sync_s"] = budget.get("sync_s", 0.0)
        out["budget_assembly_s"] = budget.get("assembly_s", 0.0)
        out["budget_submit_block_s"] = budget.get("submit_block_s", 0.0)
        out["budget_queue_wait_s"] = budget.get("queue_wait_s", 0.0)
        # swing-proof limiter signal: fraction of the pass the producer
        # spent waiting on the downstream (uplink thread, wire, device) —
        # ~1 means the host side added nothing to the critical path
        out["downstream_wait_frac"] = min(1.0, (
            out["budget_submit_block_s"] + out["budget_drain_s"]
            + out["budget_sync_s"]) / max(wall, 1e-9))
    if stats:
        out["budget_put_call_s"] = sum(
            s["batch_put_s"] + s["aux_put_s"] for s in stats)
        out["budget_aux_pack_s"] = sum(s.get("aux_pack_s", 0.0)
                                       for s in stats)
        out["budget_launch_s"] = sum(s.get("launch_s", 0.0) for s in stats)
        out["uplink_chunks"] = len(stats)
    if probe_mbps:
        out["budget_wire_s_at_probe"] = nbytes / probe_mbps / 1e6
        # the pass self-describes its tunnel window: the link swings ~3x
        # within a run (docs/bench_captures_r4.jsonl), so every e2e number
        # carries the same-moment probed rate plus its projection onto a
        # normalized 40 MB/s link (swap the measured wire time for the
        # 40 MB/s wire time; floored at pure-wire) — two captures taken in
        # different weather become comparable through this field
        out["window_mbps"] = probe_mbps
        if n_items:
            wire_40 = nbytes / 40e6
            projected_wall = max(wall - out["budget_wire_s_at_probe"]
                                 + wire_40, wire_40)
            out["at_40mbps_imgs_per_sec"] = n_items / projected_wall
    return {k: (round(v, 3) if isinstance(v, float) else v)
            for k, v in out.items()}


def _bench_chain_e2e(model, chain_dsl, mean_std, arrays, scales, msp,
                     max_batch, compute_dtype, result):
    """e2e streaming rate of the device CLAHE chain, best of 3 passes."""
    from mdir_tpu.data.transforms import initialize_transforms
    from mdir_tpu.ops.preprocess import chain_from_transform
    from mdir_tpu.parallel.extract import StreamingExtractor

    cchain = chain_from_transform(initialize_transforms(
        chain_dsl, list(mean_std)))
    craw = [cchain.host_input(a[..., :3]) for a in arrays]

    def run_chain():
        ext = StreamingExtractor(
            model, scales=scales, msp=msp, max_batch=max_batch,
            compute_dtype=compute_dtype, device_chain=cchain)
        for i, arr in enumerate(craw):
            ext.add(i, arr)
        out = ext.finish(len(craw))
        return out, list(ext.stats or ()), dict(ext.budget or {})

    run_chain()  # compile + warm
    # per-pass adjacent tunnel probes: the link swings several-fold within
    # a run, so each pass is scored against the ceiling measured right
    # after it (see the main loop's comment)
    c_bytes = sum(a.nbytes for a in craw)
    c_probe = np.concatenate([a.reshape(-1) for a in craw[:max_batch]])
    c_elapsed, c_sat = float("inf"), 0.0
    c_budget = {}
    for cpass in range(3):
        start = time.time()
        cvecs, c_stats, c_raw_budget = run_chain()
        pass_elapsed = time.time() - start
        pass_tunnel = _measure_tunnel(c_probe, reps=1)
        if os.environ.get("BENCH_DEBUG"):
            print("# chain pass %d: %.2f s (%.1f MB/s), tunnel %.1f"
                  % (cpass, pass_elapsed, c_bytes / pass_elapsed / 1e6,
                     pass_tunnel), file=sys.stderr, flush=True)
        pass_rate = c_bytes / pass_elapsed / 1e6
        c_sat = max(c_sat, pass_rate / max(pass_tunnel, pass_rate))
        if pass_elapsed < c_elapsed:
            c_elapsed = pass_elapsed
            c_budget = _pass_budget(start, pass_elapsed, c_stats,
                                    c_raw_budget, c_bytes, pass_tunnel,
                                    n_items=len(craw))
    assert np.isfinite(cvecs).all()
    result["clahe_chain_e2e_imgs_per_sec"] = round(len(craw) / c_elapsed, 2)
    result["clahe_chain_ingress_saturation"] = round(c_sat, 2)
    result["clahe_chain_ships_l"] = bool(cchain.ships_l)
    result.update({"clahe_chain_" + k: v for k, v in c_budget.items()})


def _chain_e2e_subprocess(chain_dsl, n_images, max_batch, mean_std):
    """Run the CLAHE-chain e2e measurement as a fresh bench process (the
    chain becomes the subprocess's main timed path; BENCH_VARIANTS=0 skips
    everything else) and lift its numbers."""
    import subprocess

    env = dict(os.environ)
    env.update({"BENCH_TRANSFORMS": chain_dsl, "BENCH_VARIANTS": "0",
                "BENCH_RESIDENT": "0", "BENCH_IMAGES": str(n_images),
                "BENCH_MAX_BATCH": str(max_batch),
                "MDIR_TPU_UPLINK_STATS": "1"})
    env.pop("BENCH_DEBUG", None)
    proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                          capture_output=True, text=True, env=env,
                          timeout=1800)
    assert proc.returncode == 0, proc.stderr[-500:]
    # the subprocess prints the full result line then the compact summary
    # tail line — lift from the FULL line (the summary drops budget_*)
    sub = None
    for line in reversed(proc.stdout.strip().splitlines()):
        cand = json.loads(line)
        if "summary_of" not in cand:
            sub = cand
            break
    assert sub is not None, proc.stdout[-500:]

    from mdir_tpu.data.transforms import initialize_transforms
    from mdir_tpu.ops.preprocess import chain_from_transform

    chain = chain_from_transform(
        initialize_transforms(chain_dsl, list(mean_std)))
    lifted = {"clahe_chain_e2e_imgs_per_sec": sub["value"],
              "clahe_chain_ingress_saturation": sub["ingress_saturation"],
              "clahe_chain_ships_l": bool(chain.ships_l)}
    for key in sub:
        # lift the subprocess's own best-pass budget (it describes the
        # chain pass that produced clahe_chain_e2e_imgs_per_sec)
        if key.startswith("budget_") or key in ("downstream_wait_frac",
                                                "uplink_chunks",
                                                "window_mbps",
                                                "at_40mbps_imgs_per_sec"):
            lifted["clahe_chain_" + key] = sub[key]
    return lifted


def _device_alive(deadline_s=120.0):
    """Probe the backend with a hard deadline in a watchdog thread.

    The axon tunnel occasionally goes unresponsive for long stretches
    (observed >1 h): a trivial jitted op then blocks forever and the whole
    bench would hang without ever printing its JSON line. The probe runs
    in a daemon thread; if it misses the deadline the bench emits an
    explicit tunnel-down JSON line and exits nonzero instead.
    """
    import threading

    ok = []

    def probe():
        import jax

        r = jax.jit(lambda x: (x * 2).sum())(
            jax.device_put(np.ones((8, 128), np.float32)))
        np.asarray(r)
        ok.append(True)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(deadline_s)
    return bool(ok)


def main():
    from mdir_tpu.models import initialize_model
    from mdir_tpu.parallel.extract import extract_vectors_batched

    if not _device_alive(float(os.environ.get("BENCH_PROBE_DEADLINE",
                                              "180"))):
        print(json.dumps({
            "metric": "device_resident_imgs_per_sec", "value": 0.0,
            "unit": "imgs/s", "vs_baseline": 0.0,
            "error": "device unresponsive: trivial jitted op missed the "
                     "probe deadline (tunnel outage) — no measurement "
                     "possible this run"}))
        return 1

    arch = os.environ.get("BENCH_ARCH", "resnet101")
    image_size = int(os.environ.get("BENCH_IMAGE_SIZE", "1024"))
    n_images = int(os.environ.get("BENCH_IMAGES", "32"))
    max_batch = int(os.environ.get("BENCH_MAX_BATCH", "16"))

    model = initialize_model({
        "architecture": "cirnet", "cir_architecture": arch,
        "local_whitening": False, "pooling": "gem", "regional": False,
        "whitening": False, "pretrained": False})

    # typical thumbnailed shapes: landscape + portrait aspect at max side 1024
    rng = np.random.RandomState(0)
    shapes = [(int(image_size * 0.75), image_size),
              (image_size, int(image_size * 0.75))]
    arrays = [(rng.rand(*shapes[i % 2], 3) * 255).astype(np.uint8)
              for i in range(n_images)]
    shipped_bytes = sum(a.nbytes for a in arrays)
    scales = [1, 1.0 / np.sqrt(2), 1.0 / 2]
    msp = float(model.pool_p)
    mean_std = (model.meta["mean"], model.meta["std"])
    # production dtype policy: bf16 + first-chunk guard on the chip,
    # MDIR_TPU_COMPUTE_DTYPE still forces either way
    from mdir_tpu.ops.dtypes import resolve_compute_dtype

    compute_dtype, dtype_guard = resolve_compute_dtype({})

    # BENCH_TRANSFORMS="pil2np | apply_clahe | totensor | normalize" runs the
    # e2e pass through the device photometric chain (uint8 + host L plane
    # ingress, CLAHE fused on device) instead of plain normalize
    chain = None
    bench_transforms = os.environ.get("BENCH_TRANSFORMS")
    if bench_transforms:
        from mdir_tpu.data.transforms import initialize_transforms
        from mdir_tpu.ops.preprocess import chain_from_transform

        chain = chain_from_transform(
            initialize_transforms(bench_transforms, list(mean_std)))
        assert chain is not None, bench_transforms
        arrays = [chain.host_input(a) for a in arrays]
        shipped_bytes = sum(a.nbytes for a in arrays)

    # per-chunk uplink timings + a pass-level budget for every timed pass:
    # the tunnel's rate swings several-fold within a run, so the per-pass
    # budget (whose interval fields sum to the pass wall) is the only
    # swing-proof decomposition — see _pass_budget
    os.environ["MDIR_TPU_UPLINK_STATS"] = "1"
    last_stats = []
    last_budget = {}

    def run(imgs):
        from mdir_tpu.parallel.extract import StreamingExtractor

        kwargs = dict(device_chain=chain) if chain is not None \
            else dict(normalize_mean_std=mean_std)
        extractor = StreamingExtractor(
            model, scales=scales, msp=msp, max_batch=max_batch,
            compute_dtype=compute_dtype, dtype_guard=dtype_guard, **kwargs)
        for i, arr in enumerate(imgs):
            extractor.add(i, arr)
        out = extractor.finish(len(imgs))
        if extractor.stats:
            last_stats[:] = extractor.stats
            last_budget.clear()
            last_budget.update(extractor.budget)
        return out

    # warmup: compile every (bucket, batch) program the timed run will hit
    run(arrays[:2 * max_batch])

    # The tunnel's raw bandwidth swings several-fold within a single bench
    # run (measured 6 -> 41 MB/s in 20 minutes), so saturation is only
    # meaningful against a probe taken ADJACENT to each pass: each timed
    # pass gets its own ceiling probe and the best per-pass saturation is
    # reported (a probe minutes away measures a different link).
    probe = np.concatenate([a.reshape(-1) for a in arrays[:max_batch]])
    elapsed = float("inf")
    best_sat, tunnels = 0.0, []
    best_budget = {}
    for mpass in range(3):
        start = time.time()
        vecs = run(arrays)
        pass_elapsed = time.time() - start
        pass_tunnel = _measure_tunnel(probe, reps=1)
        tunnels.append(pass_tunnel)
        if os.environ.get("BENCH_DEBUG"):
            print("# main pass %d: %.2f s (%.1f MB/s), tunnel %.1f"
                  % (mpass, pass_elapsed, shipped_bytes / pass_elapsed / 1e6,
                     pass_tunnel),
                  file=sys.stderr, flush=True)
        # a probe can itself catch a link stall (measured 3 MB/s probes
        # seconds after a 38 MB/s pass) — saturation >1 means the pass
        # outran its probe, i.e. the pipeline was NOT the limiter: cap
        pass_rate = shipped_bytes / pass_elapsed / 1e6
        best_sat = max(best_sat, pass_rate / max(pass_tunnel, pass_rate))
        if pass_elapsed < elapsed:
            # the budget describes the SAME pass as the headline rate
            elapsed = pass_elapsed
            best_budget = _pass_budget(start, pass_elapsed, list(last_stats),
                                       dict(last_budget), shipped_bytes,
                                       pass_tunnel, n_items=n_images)
    assert vecs.shape[1] == n_images
    assert np.isfinite(vecs).all()
    imgs_per_sec = n_images / elapsed
    ingress_mbps = shipped_bytes / elapsed / 1e6
    tunnel_mbps = max(tunnels)

    result = {
        "metric": "multiscale_%s_gem_extraction" % arch,
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / REFERENCE_IMGS_PER_SEC, 2),
        "ingress_mbps": round(ingress_mbps, 1),
        "tunnel_mbps": round(tunnel_mbps, 1),
        "tunnel_mbps_min": round(min(tunnels), 1),
        "ingress_saturation": round(best_sat, 2),
    }
    result.update(best_budget)
    # does the transport multiplex concurrent puts? One e2e pass with two
    # uplink streams answers it in the captured record: a rate materially
    # above the single-stream pass says yes (then 2 streams should become
    # the default); parity-or-below says the link is single-stream-limited
    if os.environ.get("BENCH_STREAMS_VARIANT", "1") != "0":
        os.environ["MDIR_TPU_UPLINK_STREAMS"] = "2"
        try:
            start = time.time()
            run(arrays)
            two_elapsed = time.time() - start
            two_tunnel = _measure_tunnel(probe, reps=1)
            two_rate = shipped_bytes / two_elapsed / 1e6
            result["e2e_2streams_imgs_per_sec"] = round(
                n_images / two_elapsed, 2)
            # the rate comparison vs the single-stream pass is the only
            # sound multiplexing signal: with puts async (and, on a
            # serializing transport, threads blocking concurrently) summed
            # per-thread put time over wall is inconclusive either way
            result["e2e_2streams_saturation"] = round(
                two_rate / max(two_tunnel, two_rate), 2)
        except Exception as exc:
            result["e2e_2streams_error"] = str(exc)[:200]
        finally:
            os.environ.pop("MDIR_TPU_UPLINK_STREAMS", None)

    # headline resident rate runs the PRODUCTION dtype (bf16-guarded on
    # the chip since round 3); f32 stays as the cross-check variant
    headline_vecs = None
    run_resident = os.environ.get("BENCH_RESIDENT", "1") != "0"
    run_variants = os.environ.get("BENCH_VARIANTS", "1") != "0"
    resident_args = _resident_args(model, mean_std, max_batch, shapes[0],
                                   tuple(scales)) \
        if (run_resident or run_variants) else None
    if run_resident:
        resident, tflops, headline_vecs, roof = _measure_resident(
            model, resident_args, compute_dtype=compute_dtype)
        result.update(roof)
        result["device_resident_imgs_per_sec"] = round(resident, 1)
        result["device_resident_vs_baseline"] = round(
            resident / REFERENCE_IMGS_PER_SEC, 2)
        result["device_resident_dtype"] = compute_dtype or "float32"
        if tflops:
            result["device_tflops"] = round(tflops, 1)
            result["mfu_vs_bf16_peak"] = round(
                tflops * 1e12 / V5E_BF16_PEAK_FLOPS, 3)

    if run_variants:
        f32_rate, f32_tflops, f32_vecs, _f32_roof = _measure_resident(
            model, resident_args, compute_dtype=None)
        result["f32_device_resident_imgs_per_sec"] = round(f32_rate, 1)
        if f32_tflops:
            result["f32_device_tflops"] = round(f32_tflops, 1)
        if compute_dtype is not None and headline_vecs is not None:
            cos = (f32_vecs * headline_vecs).sum(axis=1) / (
                np.linalg.norm(f32_vecs, axis=1)
                * np.linalg.norm(headline_vecs, axis=1) + 1e-12)
            result["bf16_cosine_vs_f32"] = round(float(cos.min()), 5)

        os.environ["MDIR_TPU_PALLAS"] = "1"
        try:
            pallas_rate, _, pallas_vecs, _p_roof = _measure_resident(
                model, resident_args)
            drift = float(np.abs(pallas_vecs - f32_vecs).max())
            result["pallas_device_resident_imgs_per_sec"] = round(pallas_rate,
                                                                  1)
            result["pallas_max_abs_drift"] = round(drift, 6)
        except Exception as exc:
            result["pallas_error"] = str(exc)[:200]
        finally:
            os.environ.pop("MDIR_TPU_PALLAS", None)

        # the round-2 flagship: the CLAHE photometric chain fused on device
        try:
            result["clahe_chain_device_resident_imgs_per_sec"] = round(
                _measure_chain_resident(model, mean_std, max_batch,
                                        shapes[0], tuple(scales),
                                        compute_dtype=compute_dtype), 1)
        except Exception as exc:
            result["clahe_chain_error"] = str(exc)[:200]

        # e2e CLAHE-chain rate over the tunnel: with the device-computed L
        # plane the ingress is plain RGB u8 (25% fewer bytes than shipping
        # the cv2 L plane as a 4th channel). Reuses the main timed run's
        # numbers when BENCH_TRANSFORMS already selected this exact chain.
        chain_dsl = "pil2np | apply_clahe | totensor | normalize"
        if bench_transforms == chain_dsl:
            result["clahe_chain_e2e_imgs_per_sec"] = result["value"]
            result["clahe_chain_ingress_saturation"] = \
                result["ingress_saturation"]
            result["clahe_chain_ships_l"] = bool(chain.ships_l)
        else:
            # measured in a FRESH process: after this process's device
            # churn (resident/pallas/bf16 variants) sustained chain
            # transfers degrade several-fold on the remote backend while
            # probes stay fast — the same path in a clean process streams
            # at link rate, which is what a production eval run sees
            try:
                result.update(_chain_e2e_subprocess(chain_dsl, n_images,
                                                    max_batch, mean_std))
            except Exception:
                try:
                    _bench_chain_e2e(model, chain_dsl, mean_std, arrays,
                                     scales, msp, max_batch, compute_dtype,
                                     result)
                except Exception as exc:
                    result["clahe_chain_e2e_error"] = str(exc)[:200]

        try:
            rate, res_rate, train_tflops, train_dtype, train_roof = \
                _measure_train_step(model)
            result["train_tuples_per_sec"] = round(rate, 2)
            result["train_resident_tuples_per_sec"] = round(res_rate, 2)
            result["train_dtype"] = train_dtype
            result.update(train_roof)
            if train_tflops:
                result["train_tflops"] = round(train_tflops, 1)
                result["train_mfu_vs_bf16_peak"] = round(
                    train_tflops * 1e12 / V5E_BF16_PEAK_FLOPS, 3)
        except Exception as exc:
            result["train_step_error"] = str(exc)[:200]

        # the reference's dominant training cost: per-epoch hard-negative
        # mining re-embeds ~24k images at image_size 362 (SURVEY §3.4)
        try:
            result.update(_measure_mining(
                model, mean_std, compute_dtype, dtype_guard,
                max_batch=max_batch,
                probe_mbps=result.get("tunnel_mbps", 0) or None))
        except Exception as exc:
            result["mining_error"] = str(exc)[:200]

        # second model family: the composition scenario's U-Net translator
        if os.environ.get("BENCH_UNET", "1") != "0":
            try:
                unet_rate, unet_tflops, unet_roof = _measure_unet_resident()
                result["unet_resident_imgs_per_sec"] = round(unet_rate, 1)
                result.update(unet_roof)
                if unet_tflops:
                    result["unet_tflops"] = round(unet_tflops, 1)
            except Exception as exc:
                result["unet_error"] = str(exc)[:200]

        # the infer stage's bulk dataset-translation workload (streaming
        # batched translator; e2e over the tunnel + chip-side ceiling)
        if os.environ.get("BENCH_INFER", "1") != "0":
            try:
                result.update(_measure_infer())
            except Exception as exc:
                result["infer_error"] = str(exc)[:200]

        # the full composition workload (eval_composition.yml): U-Net
        # translation -> VGG16-GeM multiscale embedding, per-image rate
        if os.environ.get("BENCH_COMPOSED", "1") != "0":
            try:
                comp_rate, comp_tflops, comp_dtype, comp_roof = \
                    _measure_composed()
                result["composed_resident_imgs_per_sec"] = round(comp_rate, 1)
                result["composed_dtype"] = comp_dtype
                result.update(comp_roof)
                if comp_tflops:
                    result["composed_tflops"] = round(comp_tflops, 1)
                    result["composed_mfu_vs_bf16_peak"] = round(
                        comp_tflops * 1e12 / V5E_BF16_PEAK_FLOPS, 3)
            except Exception as exc:
                result["composed_error"] = str(exc)[:200]

            # e2e variant: the same workload streamed over the tunnel
            # through the production extract_vectors_composed path
            try:
                result.update(_measure_composed_e2e())
            except Exception as exc:
                result["composed_e2e_error"] = str(exc)[:200]

    print(json.dumps(result))
    print(json.dumps(_headline_summary(result)))
    return 0


# every headline claim, in the order a reader scans them; the driver's
# record keeps only the LAST ~2k chars of stdout, and the full result line
# outgrew that window in r04 (its tail started mid clahe_chain_budget_* —
# the actual value/resident/mfu fields were truncated out of BENCH_r04.json)
_SUMMARY_KEYS = (
    "metric", "value", "unit", "vs_baseline",
    "tunnel_mbps", "tunnel_mbps_min", "ingress_saturation",
    "window_mbps", "at_40mbps_imgs_per_sec", "downstream_wait_frac",
    "device_resident_imgs_per_sec", "device_resident_dtype",
    "mfu_vs_bf16_peak", "bf16_cosine_vs_f32",
    "clahe_chain_device_resident_imgs_per_sec",
    "clahe_chain_e2e_imgs_per_sec", "clahe_chain_ingress_saturation",
    "clahe_chain_window_mbps", "clahe_chain_at_40mbps_imgs_per_sec",
    "infer_imgs_per_sec", "infer_resident_imgs_per_sec",
    "infer_window_mbps", "infer_at_40mbps_imgs_per_sec",
    "infer_device_u8_ok",
    "train_tuples_per_sec", "train_resident_tuples_per_sec",
    "train_cached_tuples_per_sec", "train_mfu_vs_bf16_peak",
    "mining_imgs_per_sec", "mining_resident_imgs_per_sec",
    "mining_epoch_projection_s", "mining_epoch_resident_s",
    "mining_window_mbps", "mining_at_40mbps_imgs_per_sec",
    "mining_cache_warm_imgs_per_sec", "mining_epoch_projection_warm_s",
    "mining_cache_drift",
    "train_roofline_frac", "composed_roofline_frac", "roofline_frac",
    "unet_resident_imgs_per_sec",
    "composed_resident_imgs_per_sec", "composed_mfu_vs_bf16_peak",
    "composed_e2e_imgs_per_sec", "composed_ingress_saturation",
    "composed_window_mbps", "composed_at_40mbps_imgs_per_sec",
)


def _headline_summary(result):
    """Compact (<1.5 kB) summary repeated as the LAST stdout line so the
    driver's truncated tail always contains every headline number; the full
    result line directly above carries the complete budget decompositions."""
    summary = {"summary_of": "previous line"}
    for key, val in result.items():
        if key.endswith("_error"):
            summary[key] = str(val)[:60]
    detail = [k for k in _SUMMARY_KEYS if k in result]
    summary.update((k, result[k]) for k in detail)
    # hard cap: drop trailing detail fields first, never the error fields
    while len(json.dumps(summary)) > 1500 and detail:
        summary.pop(detail.pop())
    return summary


if __name__ == "__main__":
    sys.exit(main())
