"""Fused batched extraction == per-image wrapper path (multiscale + whiten)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mdir_tpu.learning.network import CirNetwork, SingleNetwork
from mdir_tpu.learning.wrappers import (CirMultiscaleAggregation,
                                        initialize_wrappers)
from mdir_tpu.models import Model, initialize_model
from mdir_tpu.parallel.extract import extract_vectors_batched, batched_resize
from mdir_tpu.ops.resize import torch_resize_grid


@pytest.fixture(scope="module")
def alexnet_model():
    return initialize_model({
        "architecture": "cirnet", "cir_architecture": "alexnet",
        "local_whitening": False, "pooling": "gem", "regional": False,
        "whitening": False, "pretrained": False})


def test_torch_resize_grid_matches_torch(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    img = rng.rand(1, 3, 37, 53).astype(np.float32)
    for scale in (1 / np.sqrt(2), 0.5):
        ref = F.interpolate(torch.tensor(img), scale_factor=scale,
                            mode="bilinear", align_corners=False)
        ref = ref.numpy().transpose(0, 2, 3, 1)
        oh, ow = ref.shape[1], ref.shape[2]
        y0, y1, wy = torch_resize_grid(37, oh, scale)
        x0, x1, wx = torch_resize_grid(53, ow, scale)
        ours = batched_resize(
            jnp.asarray(img.transpose(0, 2, 3, 1)),
            y0[None], y1[None], wy[None].astype(np.float32),
            x0[None], x1[None], wx[None].astype(np.float32))
        np.testing.assert_allclose(ref, np.asarray(ours), rtol=1e-5, atol=1e-6)


def test_batched_multiscale_equals_wrapper_path(rng, alexnet_model):
    model = alexnet_model
    network = CirNetwork(
        model, CirNetwork.NetworkParams(
            model={}, runtime={"wrappers": {
                "train": None,
                "eval": {"0_cirmultiscale": {"scales": True}},
            }}),
        frozen=True)

    arrays = [rng.rand(80, 100, 3).astype(np.float32),
              rng.rand(100, 70, 3).astype(np.float32),
              rng.rand(80, 100, 3).astype(np.float32)]

    # reference-path: per-image through wrappers
    ref = np.stack([np.asarray(network(a)).reshape(-1) for a in arrays], axis=1)

    # fused path
    msp = float(model.pool_p)
    ours = extract_vectors_batched(
        model, arrays, scales=[1, 1 / np.sqrt(2), 0.5], msp=msp,
        bucket_multiple=32, max_batch=2)

    np.testing.assert_allclose(ref, ours, rtol=1e-4, atol=1e-5)


def test_batched_single_scale_equals_direct(rng, alexnet_model):
    model = alexnet_model
    arrays = [rng.rand(70, 90, 3).astype(np.float32)]
    direct = model.apply(jnp.asarray(arrays[0])[None])
    direct = np.asarray(direct).reshape(-1)
    ours = extract_vectors_batched(model, arrays, scales=[1], msp=1.0)
    # single scale with msp=1: aggregation == plain L2-normalized descriptor
    np.testing.assert_allclose(direct / np.linalg.norm(direct), ours[:, 0],
                               rtol=1e-5, atol=1e-6)


def test_uint8_device_normalize_path(rng, alexnet_model, tmp_path):
    """uint8 transfer + device normalize == host f32 normalize path."""
    from PIL import Image

    from mdir_tpu.data.transforms import initialize_transforms
    from mdir_tpu.learning.network import CirNetwork
    from mdir_tpu.parallel.extract import extract_vectors_network

    model = alexnet_model
    mean_std = [model.meta["mean"], model.meta["std"]]
    paths = []
    for i in range(3):
        arr = (rng.rand(70 + 10 * i, 90, 3) * 255).astype(np.uint8)
        p = tmp_path / ("img%d.jpg" % i)
        Image.fromarray(arr).save(p, quality=95)
        paths.append(str(p))

    transform = initialize_transforms("pil2np | totensor | normalize", mean_std)
    network = CirNetwork(
        model, CirNetwork.NetworkParams(
            model={}, runtime={"wrappers": {
                "train": None,
                "eval": {"0_cirmultiscale": {"scales": True}}}}),
        frozen=True)

    # fused path (auto-detects the plain chain -> uint8 + device normalize)
    fast = extract_vectors_network(network, paths, 96, transform)

    # reference path: per-image wrappers on host-normalized f32
    from mdir_tpu.parallel.extract import _load_images

    arrays = _load_images(paths, 96, transform)
    ref = np.stack([np.asarray(network(a)).reshape(-1) for a in arrays], axis=1)

    np.testing.assert_allclose(ref, fast, rtol=1e-4, atol=1e-5)


def test_mesh_sharded_extraction(rng, alexnet_model):
    """8-device CPU mesh DP extraction == single-device extraction."""
    from mdir_tpu.parallel.extract import extract_vectors_batched
    from mdir_tpu.parallel.mesh import make_mesh

    model = alexnet_model
    arrays = [rng.rand(64, 80, 3).astype(np.float32) for _ in range(16)]
    single = extract_vectors_batched(model, arrays, scales=[1, 0.5], msp=3.0,
                                     max_batch=8)
    mesh = make_mesh(8)
    sharded = extract_vectors_batched(model, arrays, scales=[1, 0.5], msp=3.0,
                                      max_batch=8, mesh=mesh)
    np.testing.assert_allclose(single, sharded, rtol=1e-4, atol=1e-6)


def test_bf16_extraction_close(rng, alexnet_model):
    from mdir_tpu.parallel.extract import extract_vectors_batched

    model = alexnet_model
    arrays = [rng.rand(64, 80, 3).astype(np.float32) for _ in range(3)]
    f32 = extract_vectors_batched(model, arrays, scales=[1], msp=3.0)
    bf16 = extract_vectors_batched(model, arrays, scales=[1], msp=3.0,
                                   compute_dtype="bfloat16")
    # bf16 trunk compute: descriptors stay close after L2 normalization
    cos = (f32 * bf16).sum(axis=0)
    assert (cos > 0.995).all(), cos


def test_bf16_multiscale_convs_stay_bf16(rng, alexnet_model):
    """Every conv in the bf16 multiscale fused program must run bf16.

    Regression: the f32 interp weights of the non-unit scales' resize used
    to silently promote the pre-cast bf16 batch back to f32 (JAX type
    promotion), so flax convs ran those scales full-precision — invisible
    on CPU, a straight perf loss on the MXU. The cast now happens at the
    conv boundary, after the f32-exact resize."""
    from mdir_tpu.ops import dtypes as dtype_policy
    from mdir_tpu.parallel.extract import _fused_extract_fn

    model = alexnet_model
    fn = _fused_extract_fn(model.module, (1, 0.5), False, False, "bfloat16")
    variables = dtype_policy.cast_f32_tree(model.variables, "bfloat16")
    batch = jnp.zeros((2, 64, 80, 3), jnp.float32)
    valid = jnp.asarray([[64, 80], [48, 72]], jnp.int32)
    grids = (None,
             (jnp.zeros((2, 32, 3), jnp.float32),
              jnp.zeros((2, 40, 3), jnp.float32),
              jnp.asarray([[32, 40], [24, 36]], jnp.int32)))
    zero = jnp.zeros((), jnp.float32)
    jaxpr = str(jax.make_jaxpr(
        lambda v, b, vh, g: fn(v, b, vh, g, None, None, jnp.float32(3.0),
                               zero, zero, zero, zero))(
        variables, batch, valid, grids))
    f32_convs = [ln for ln in jaxpr.splitlines()
                 if "conv_general_dilated" in ln and " f32[" in ln.split("=")[0]]
    assert not f32_convs, f32_convs[:3]
    assert "conv_general_dilated" in jaxpr  # the probe saw the convs at all


def test_device_clahe_chain_path(rng, alexnet_model, tmp_path):
    """Production wiring of the device photometric chain: a CLAHE transform
    chain extracts from raw uint8 ingress with CLAHE fused on device
    (cv2-exact tile geometry per image inside the padded bucket) and matches
    the host-chain wrapper path (reference semantics:
    mdir/components/data/transform/photometric_transforms.py:28-36)."""
    from PIL import Image

    from mdir_tpu.data.transforms import initialize_transforms
    from mdir_tpu.learning.network import CirNetwork
    from mdir_tpu.parallel.extract import (StreamingExtractor,
                                           extract_vectors_network,
                                           _load_images)

    model = alexnet_model
    mean_std = [model.meta["mean"], model.meta["std"]]
    paths = []
    for i in range(4):
        # min side >= 64: at scale 0.5 the alexnet trunk needs >= 32 px
        arr = (rng.rand(64 + 17 * i, 88 + 5 * i, 3) * 255).astype(np.uint8)
        p = tmp_path / ("img%d.png" % i)
        Image.fromarray(arr).save(p)
        paths.append(str(p))

    transform = initialize_transforms(
        "pil2np | apply_clahe | totensor | normalize", mean_std)
    network = CirNetwork(
        model, CirNetwork.NetworkParams(
            model={}, runtime={"wrappers": {
                "train": None,
                "eval": {"0_cirmultiscale": {"scales": True}}}}),
        frozen=True)

    fast = extract_vectors_network(network, paths, 96, transform)

    # reference path: per-image wrappers on the host cv2-exact chain
    arrays = _load_images(paths, 96, transform)
    ref = np.stack([np.asarray(network(a)).reshape(-1) for a in arrays], axis=1)

    cos = (ref * fast).sum(axis=0) / (
        np.linalg.norm(ref, axis=0) * np.linalg.norm(fast, axis=0))
    assert (cos > 0.999).all(), cos
    np.testing.assert_allclose(ref, fast, rtol=1e-2, atol=5e-3)


def test_pallas_pool_extraction_wiring(rng, alexnet_model, monkeypatch):
    """MDIR_TPU_PALLAS=1 swaps the fused GeM+L2N pooling into the extraction
    program (Pallas on TPU; identical jnp composition off-TPU) — results
    match the default path."""
    from mdir_tpu.parallel.extract import extract_vectors_batched

    arrays = [rng.rand(64, 80, 3).astype(np.float32) for _ in range(3)]
    base = extract_vectors_batched(alexnet_model, arrays, scales=[1, 0.5],
                                   msp=3.0)
    monkeypatch.setenv("MDIR_TPU_PALLAS", "1")
    fused = extract_vectors_batched(alexnet_model, arrays, scales=[1, 0.5],
                                    msp=3.0)
    np.testing.assert_allclose(base, fused, rtol=1e-5, atol=1e-6)


def test_pallas_pool_yaml_runtime_key(rng, alexnet_model, monkeypatch):
    """``network: runtime: pallas: true`` selects the Pallas pooling program
    from the scenario surface (no env var), with identical descriptors; a
    set MDIR_TPU_PALLAS is forced over the yaml key either way."""
    from mdir_tpu.data.transforms import initialize_transforms
    from mdir_tpu.learning.network import CirNetwork
    from mdir_tpu.parallel import extract as extract_mod
    from PIL import Image

    monkeypatch.delenv("MDIR_TPU_PALLAS", raising=False)
    model = alexnet_model
    mean_std = [model.meta["mean"], model.meta["std"]]
    transform = initialize_transforms("pil2np | totensor | normalize",
                                      mean_std)
    paths = []
    for i in range(2):
        arr = (rng.rand(64, 88, 3) * 255).astype(np.uint8)
        import tempfile, os
        fd, p = tempfile.mkstemp(suffix=".png")
        os.close(fd)
        Image.fromarray(arr).save(p)
        paths.append(p)

    def net(runtime_extra):
        runtime = {"wrappers": {"train": None,
                                "eval": {"0_cirmultiscale": {"scales": True}}}}
        runtime.update(runtime_extra)
        return CirNetwork(model, CirNetwork.NetworkParams(
            model={}, runtime=runtime), frozen=True)

    base = extract_mod.extract_vectors_network(net({}), paths, 96, transform)
    extract_mod._FUSED_CACHE.clear()
    fused = extract_mod.extract_vectors_network(net({"pallas": True}), paths,
                                                96, transform)
    np.testing.assert_allclose(base, fused, rtol=1e-5, atol=1e-6)
    pallas_keys = [k for k in extract_mod._FUSED_CACHE
                   if k[0] == id(model.module) and k[6] is True]
    assert pallas_keys, "yaml pallas key did not reach program selection"

    # env var forces OFF over the yaml key
    extract_mod._FUSED_CACHE.clear()
    monkeypatch.setenv("MDIR_TPU_PALLAS", "0")
    extract_mod.extract_vectors_network(net({"pallas": True}), paths, 96,
                                        transform)
    assert not [k for k in extract_mod._FUSED_CACHE if k[6] is True]
    for p in paths:
        os.unlink(p)


def _wrapped(model, wrappers):
    return CirNetwork(
        model, CirNetwork.NetworkParams(model={}, runtime={"wrappers": {
            "train": None, "eval": wrappers}}), frozen=True)


def test_batched_rmac_equals_wrapper_path(rng):
    """RMAC nets ride the fused bucketed path (host-computed region grids
    over valid feature extents) and match the per-image static-shape path
    (reference cirtorch functional.py:26-75)."""
    from mdir_tpu.parallel.extract import extract_vectors_network, _load_images
    from mdir_tpu.data.transforms import initialize_transforms

    model = initialize_model({
        "architecture": "cirnet", "cir_architecture": "alexnet",
        "local_whitening": False, "pooling": "rmac", "regional": False,
        "whitening": False, "pretrained": False})
    mean_std = [model.meta["mean"], model.meta["std"]]
    network = _wrapped(model, {"0_cirmultiscale": {"scales": True}})

    from PIL import Image
    import tempfile, os as _os

    tmp = tempfile.mkdtemp()
    paths = []
    for i in range(3):
        arr = (rng.rand(80 + 11 * i, 100 + 7 * i, 3) * 255).astype(np.uint8)
        p = _os.path.join(tmp, "img%d.png" % i)
        Image.fromarray(arr).save(p)
        paths.append(p)
    transform = initialize_transforms("pil2np | totensor | normalize",
                                      mean_std)

    fast = extract_vectors_network(network, paths, 112, transform)

    arrays = _load_images(paths, 112, transform)
    ref = np.stack([np.asarray(network(a)).reshape(-1) for a in arrays],
                   axis=1)
    np.testing.assert_allclose(ref, fast, rtol=1e-4, atol=1e-5)


def test_batched_regional_equals_wrapper_path(rng):
    """Regional (Rpool) GeM nets on the fused bucketed path == per-image
    (reference cirtorch pooling.py:64-100 incl. per-region whitening)."""
    from mdir_tpu.parallel.extract import extract_vectors_network, _load_images
    from mdir_tpu.data.transforms import initialize_transforms

    model = initialize_model({
        "architecture": "cirnet", "cir_architecture": "alexnet",
        "local_whitening": False, "pooling": "gem", "regional": True,
        "whitening": False, "pretrained": False})
    mean_std = [model.meta["mean"], model.meta["std"]]
    network = _wrapped(model, {"0_cirmultiscale": {"scales": True}})

    from PIL import Image
    import tempfile, os as _os

    tmp = tempfile.mkdtemp()
    paths = []
    for i in range(3):
        arr = (rng.rand(96 + 13 * i, 88 + 9 * i, 3) * 255).astype(np.uint8)
        p = _os.path.join(tmp, "img%d.png" % i)
        Image.fromarray(arr).save(p)
        paths.append(p)
    transform = initialize_transforms("pil2np | totensor | normalize",
                                      mean_std)

    fast = extract_vectors_network(network, paths, 112, transform)

    arrays = _load_images(paths, 112, transform)
    ref = np.stack([np.asarray(network(a)).reshape(-1) for a in arrays],
                   axis=1)
    np.testing.assert_allclose(ref, fast, rtol=1e-4, atol=1e-5)


def test_uplink_surfaces_worker_errors(rng, alexnet_model):
    """Exceptions raised on the transfer/dispatch thread surface to the
    caller at finish() instead of being lost with the thread."""
    from mdir_tpu.parallel.extract import StreamingExtractor

    extractor = StreamingExtractor(alexnet_model, scales=[1], msp=1.0,
                                   max_batch=2)

    def boom(*args, **kwargs):
        raise RuntimeError("uplink boom")

    extractor._transfer_and_launch = boom
    extractor.add(0, rng.rand(64, 64, 3).astype(np.float32))
    extractor.add(1, rng.rand(64, 64, 3).astype(np.float32))  # full chunk
    with pytest.raises(RuntimeError, match="uplink boom"):
        extractor.add(2, rng.rand(64, 64, 3).astype(np.float32))
        extractor.add(3, rng.rand(64, 64, 3).astype(np.float32))
        extractor.finish(4)


def test_multi_stream_uplink_matches_single(rng, alexnet_model, monkeypatch):
    """MDIR_TPU_UPLINK_STREAMS=2 runs concurrent transfer threads; chunk
    completion order is irrelevant (results keyed by image index) and the
    first-chunk dtype guard resolves synchronously before any concurrency
    (barrier_first)."""
    from mdir_tpu.ops import dtypes as dtype_policy
    from mdir_tpu.parallel.extract import extract_vectors_batched

    arrays = [rng.rand(64 + 8 * (i % 3), 80, 3).astype(np.float32)
              for i in range(12)]
    single = extract_vectors_batched(alexnet_model, arrays, scales=[1, 0.5],
                                     msp=3.0, max_batch=4)
    monkeypatch.setenv("MDIR_TPU_UPLINK_STREAMS", "2")
    multi = extract_vectors_batched(alexnet_model, arrays, scales=[1, 0.5],
                                    msp=3.0, max_batch=4)
    np.testing.assert_allclose(single, multi, rtol=1e-6, atol=1e-7)

    # guard + 2 streams: the rejected first chunk still ships f32 and the
    # verdict lands before concurrent launches
    dtype_policy._GUARD_DECISIONS.pop(("extract", id(alexnet_model.module)),
                                      None)
    monkeypatch.setattr(dtype_policy, "cosine_rows_ok", lambda *a, **k: False)
    guarded = extract_vectors_batched(alexnet_model, arrays,
                                      scales=[1, 0.5], msp=3.0, max_batch=4,
                                      compute_dtype="bfloat16",
                                      dtype_guard=True)
    assert dtype_policy.guard_decision(alexnet_model.module) is False
    np.testing.assert_allclose(single, guarded, rtol=1e-6, atol=1e-7)
    dtype_policy._GUARD_DECISIONS.pop(("extract", id(alexnet_model.module)),
                                      None)


def test_regional_and_local_vectors_api(rng, alexnet_model, tmp_path):
    """cirtorch parity APIs: per-image regional (R, D) roipool descriptors
    and local (D, H*W) channel-normalized cells."""
    from PIL import Image

    from mdir_tpu.data.transforms import initialize_transforms
    from mdir_tpu.parallel.extract import (extract_local_vectors,
                                           extract_regional_vectors)

    model = alexnet_model
    network = CirNetwork(
        model, CirNetwork.NetworkParams(model={}, runtime={"wrappers": ""}),
        frozen=True)
    mean_std = [model.meta["mean"], model.meta["std"]]
    transform = initialize_transforms("pil2np | totensor | normalize",
                                      mean_std)
    paths = []
    for i in range(2):
        p = tmp_path / ("r%d.jpg" % i)
        Image.fromarray((rng.rand(96, 96 + 8 * i, 3) * 255).astype(
            np.uint8)).save(p, quality=95)
        paths.append(str(p))

    regional = extract_regional_vectors(network, paths, 96, transform)
    assert len(regional) == 2
    for vecs in regional:
        assert vecs.ndim == 2 and vecs.shape[1] == 256
        np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0,
                                   rtol=1e-4)

    local = extract_local_vectors(network, paths, 96, transform)
    for cells in local:
        assert cells.shape[0] == 256
        np.testing.assert_allclose(np.linalg.norm(cells, axis=0), 1.0,
                                   rtol=1e-4)


def test_mesh_placement_helpers():
    """shard_batch splits the leading dim across the mesh; replicate places
    a full copy on every device."""
    from mdir_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    mesh = make_mesh(8)
    batch = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    sharded = shard_batch(mesh, batch)
    assert len(sharded.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(sharded), batch)

    tree = {"w": np.ones((4,), np.float32)}
    rep = replicate(mesh, tree)
    assert rep["w"].sharding.is_fully_replicated


def test_uplink_error_does_not_deadlock():
    """A worker that dies on an error keeps draining the bounded queue, so
    a producer mid-submit never blocks forever; the error surfaces on the
    next submit() or drain()."""
    import time

    from mdir_tpu.parallel.extract import _Uplink

    def boom(payload):
        raise RuntimeError("transport died")

    uplink = _Uplink(boom, depth=2)
    uplink.submit(("a",))
    with pytest.raises(RuntimeError, match="transport died"):
        # keep submitting: the queue must never block indefinitely
        deadline = time.time() + 30
        while time.time() < deadline:
            uplink.submit(("b",))
        raise AssertionError("error never surfaced")
    with pytest.raises(RuntimeError):
        uplink.drain()


def test_resize_helper_utilities(rng):
    """ops.resize host helpers: bucket rounding, zero-pad + valid mask, and
    the PIL max-side thumbnail used by host loaders."""
    from PIL import Image

    from mdir_tpu.ops.resize import (bucket_shape, max_side_resize_pil,
                                     pad_to_shape)

    assert bucket_shape(65, 70, 64) == (128, 128)
    assert bucket_shape(300, 80, 64, max_side=256) == (256, 128)

    x = jnp.asarray(rng.rand(10, 12, 3).astype(np.float32))
    padded, mask = pad_to_shape(x, (16, 16))
    assert padded.shape == (16, 16, 3) and mask.shape == (16, 16)
    np.testing.assert_array_equal(np.asarray(padded[:10, :12]), np.asarray(x))
    assert float(mask[:10, :12].min()) == 1.0 and float(mask[10:].max()) == 0.0

    img = Image.fromarray((rng.rand(40, 80, 3) * 255).astype(np.uint8))
    small = max_side_resize_pil(img, 32)
    assert max(small.size) == 32


def test_make_mesh_rejects_oversized_request():
    """A yaml ``parallel: {data: N}`` larger than the available devices must
    fail loudly instead of silently truncating to fewer chips."""
    from mdir_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="9 devices but only 8"):
        make_mesh(9)
    assert make_mesh(8).devices.size == 8
