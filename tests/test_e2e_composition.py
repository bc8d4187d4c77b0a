"""SequentialNetwork (U-Net -> embedder) composition, infer stage, and
cirtorch-format conversion end-to-end."""
import copy
import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def composed_checkpoint(tmp_path_factory):
    """Build a translator+embedder SequentialNetwork checkpoint on disk."""
    root = tmp_path_factory.mktemp("composition")

    from mdir_tpu.learning.checkpoints import Checkpoints, save_state
    from mdir_tpu.learning.network import (CirNetwork, SequentialNetwork,
                                           SingleNetwork)
    from mdir_tpu.models import initialize_model

    translator_model = initialize_model({
        "architecture": "pixelconv_regr", "in_channels": 3,
        "out_channels": 3, "hidden": [8]})
    translator = SingleNetwork(
        translator_model,
        SingleNetwork.NetworkParams(
            model={"architecture": "pixelconv_regr", "in_channels": 3,
                   "out_channels": 3, "hidden": [8]},
            runtime={"wrappers": "",
                     "data": {"mean_std": [[0.5] * 3, [0.5] * 3],
                              "transforms": "pil2np | totensor | normalize"}}))

    embedder_model = initialize_model({
        "architecture": "cirnet", "cir_architecture": "alexnet",
        "local_whitening": False, "pooling": "gem", "regional": False,
        "whitening": False, "pretrained": False})
    embedder = CirNetwork(
        embedder_model,
        CirNetwork.NetworkParams(
            model={"architecture": "cirnet", "cir_architecture": "alexnet",
                   "local_whitening": False, "pooling": "gem",
                   "regional": False, "whitening": False, "pretrained": False},
            runtime={"wrappers": {"train": None,
                                  "eval": {"0_cirmultiscale": {"scales": False}}}}))

    net = SequentialNetwork({"translate": translator, "embed": embedder},
                            ["translate", "embed"])

    state = net.state_dict()
    ckpt_dir = root / "epochs"
    ckpt_dir.mkdir()
    names = state["net"].get("network_hierarchy", {})
    for key, sub in state.items():
        pass
    # persist via the Checkpoints layout: one file per network + names
    state["net"]["_network_names"] = [k for k in state if k != "net"]
    for key, sub in state.items():
        save_state(sub, ckpt_dir / (key + "_best.ckpt"))
    return root, ckpt_dir


def test_sequential_network_forward_and_reload(composed_checkpoint, rng):
    from mdir_tpu.learning import load_network

    root, ckpt_dir = composed_checkpoint
    network = load_network({"path": str(ckpt_dir), "runtime": None}).eval()

    img = rng.rand(64, 64, 3).astype(np.float32)
    out = network(img)
    assert np.asarray(out).shape[0] == 256  # alexnet descriptor (D x 1 conv)
    assert np.isfinite(np.asarray(out)).all()

    # composition metadata: channels flow translator -> embedder
    assert network.meta["in_channels"] == 3
    assert network.meta["out_channels"] == 256


def test_sequential_overlay_and_wrappers(composed_checkpoint, rng):
    from mdir_tpu.learning import load_network

    root, ckpt_dir = composed_checkpoint
    network = load_network(
        {"path": str(ckpt_dir),
         "runtime": {"wrappers": {"train": None,
                                  "eval": {"0_cirmultiscale": {"scales": True}}}}}
    ).eval()
    img = rng.rand(64, 64, 3).astype(np.float32)
    out = np.asarray(network(img))
    assert out.shape == (256,)  # multiscale aggregation returns a vector
    np.testing.assert_allclose(np.linalg.norm(out), 1.0, rtol=1e-4)


def test_infer_stage_with_rgb_output(tmp_path, rng):
    """infer stage: translate images with a U-Net and save RGB outputs."""
    from PIL import Image

    from mdir_tpu.learning.checkpoints import save_state
    from mdir_tpu.learning.network import SingleNetwork
    from mdir_tpu.models import initialize_model
    from mdir_tpu.stages.infer import infer

    img_dir = tmp_path / "in"
    img_dir.mkdir()
    names = []
    for i in range(3):
        name = "img%d.jpg" % i
        Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8)).save(
            img_dir / name)
        names.append(name)

    model = initialize_model({"architecture": "pixelconv_regr",
                              "in_channels": 3, "out_channels": 3,
                              "hidden": [8]})
    network = SingleNetwork(
        model, SingleNetwork.NetworkParams(
            model={"architecture": "pixelconv_regr", "in_channels": 3,
                   "out_channels": 3, "hidden": [8]},
            runtime={"wrappers": "",
                     "data": {"mean_std": [[0.5] * 3, [0.5] * 3],
                              "transforms": "pil2np | totensor | normalize"}}))
    ckpt = tmp_path / "net.ckpt"
    save_state(network.state_dict()["net"], ckpt)

    out_dir = tmp_path / "out"
    out_dir.mkdir()
    params = {
        "network": {"path": str(ckpt), "runtime": None},
        "output": {"inference": {"name": "rgb", "image_dir": str(out_dir),
                                 "async": True},
                   "debug": False},
        "data": {"test": {
            "mean_std": [[0.5] * 3, [0.5] * 3],
            "transforms": "pil2np | totensor | normalize",
            "dataset": {"name": "CirImageList", "image_dir": str(img_dir),
                        "image_size": 32},
            "loader": {"num_workers": 0},
        }},
    }
    metadata, fnames = infer(copy.deepcopy(params), (names,))
    assert sorted(fnames) == sorted(names)
    for name in names:
        assert (out_dir / name).exists()

    # resumable: append mode skips everything already written
    params["output"]["inference"]["append"] = True
    metadata2, fnames2 = infer(copy.deepcopy(params), (names,))
    assert metadata2 == {"status": "skipped"}


def test_cirtorch_format_convert(tmp_path):
    """Official cirtorch .pth -> our checkpoint -> loads and runs."""
    torch = pytest.importorskip("torch")

    from mdir_tpu.learning import load_network
    from mdir_tpu.models import initialize_model
    from mdir_tpu.stages.cirtorch_format import convert_contained_net

    # synthesize an "official" checkpoint: torch state dict of an alexnet-gem
    import torch.nn as tnn

    torch_feats = tnn.Sequential(
        tnn.Conv2d(3, 64, 11, 4, 2), tnn.ReLU(), tnn.MaxPool2d(3, 2),
        tnn.Conv2d(64, 192, 5, 1, 2), tnn.ReLU(), tnn.MaxPool2d(3, 2),
        tnn.Conv2d(192, 384, 3, 1, 1), tnn.ReLU(),
        tnn.Conv2d(384, 256, 3, 1, 1), tnn.ReLU(),
        tnn.Conv2d(256, 256, 3, 1, 1), tnn.ReLU(),
    )
    state_dict = {"features." + k: v for k, v in
                  torch_feats.state_dict().items()}
    state_dict["pool.p"] = torch.tensor([2.5])
    official = {
        "state_dict": state_dict,
        "meta": {"architecture": "alexnet", "local_whitening": False,
                 "pooling": "gem", "regional": False, "whitening": False,
                 "mean": [0.485, 0.456, 0.406], "std": [0.229, 0.224, 0.225],
                 "outputdim": 256, "Lw": None},
    }
    src = tmp_path / "official.pth"
    torch.save(official, src)

    dst = tmp_path / "converted.ckpt"
    convert_contained_net({"source": str(src), "net": str(dst)}, ())

    network = load_network({"path": str(dst), "runtime": None})
    assert abs(network.model.pool_p - 2.5) < 1e-6
    out = network.eval()(np.random.RandomState(0).rand(64, 64, 3).astype(np.float32))
    assert np.asarray(out).shape[0] == 256


def test_composed_fused_extraction_equals_wrapper_path(composed_checkpoint, rng,
                                                       tmp_path):
    """The bucketed composed (translator -> embedder) extractor must equal the
    per-image wrapper path exactly (incl. multiscale + reflectpad)."""
    from PIL import Image

    from mdir_tpu.data.transforms import initialize_transforms
    from mdir_tpu.learning import load_network
    from mdir_tpu.parallel.extract import (_load_images,
                                           extract_vectors_composed)

    root, ckpt_dir = composed_checkpoint
    network = load_network(
        {"path": str(ckpt_dir),
         "runtime": {"wrappers": {"train": None,
                                  "eval": {"0_cirmultiscale": {"scales": True}}}}}
    ).eval()
    # give the translator a reflectpad wrapper (like the paper's U-Net)
    from mdir_tpu.learning.network import Network

    network.networks["translate"].wrappers = Network.initialize_wrappers(
        "reflectpad_divisible:32")

    mean_std = [[0.5] * 3, [0.5] * 3]
    transform = initialize_transforms("pil2np | totensor | normalize", mean_std)

    paths = []
    for i, (h, w) in enumerate([(96, 128), (128, 96), (100, 90), (96, 128)]):
        p = tmp_path / ("c%d.jpg" % i)
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(
            p, quality=95)
        paths.append(str(p))

    # reference path: per-image wrappers
    arrays = _load_images(paths, 128, transform)
    ref = np.stack([np.asarray(network(a)).reshape(-1) for a in arrays], axis=1)

    fast = extract_vectors_composed(network, paths, 128, transform,
                                    max_batch=2)
    np.testing.assert_allclose(ref, fast, rtol=1e-4, atol=1e-5)


def test_composed_bf16_policy_and_guard(composed_checkpoint, rng, tmp_path,
                                        monkeypatch):
    """The composed (translator -> embedder) extractor honors the compute
    dtype policy: forced bf16 stays descriptor-close to f32, and a guard
    rejection falls back to the exact f32 program (verdict cached under the
    'composed' kind)."""
    from PIL import Image

    from mdir_tpu.data.transforms import initialize_transforms
    from mdir_tpu.learning import load_network
    from mdir_tpu.ops import dtypes as dtype_policy
    from mdir_tpu.parallel.extract import extract_vectors_composed

    root, ckpt_dir = composed_checkpoint
    network = load_network(
        {"path": str(ckpt_dir),
         "runtime": {"wrappers": {
             "train": None,
             "eval": {"0_cirmultiscale": {"scales": False}}}}}).eval()

    mean_std = [[0.5] * 3, [0.5] * 3]
    transform = initialize_transforms("pil2np | totensor | normalize",
                                      mean_std)
    paths = []
    for i in range(2):
        p = tmp_path / ("b%d.jpg" % i)
        Image.fromarray((rng.rand(96, 96, 3) * 255).astype(np.uint8)).save(
            p, quality=95)
        paths.append(str(p))

    f32 = extract_vectors_composed(network, paths, 96, transform, max_batch=2)

    # forced bf16 (no guard): descriptors stay close after L2 normalization
    monkeypatch.setenv("MDIR_TPU_COMPUTE_DTYPE", "bfloat16")
    bf16 = extract_vectors_composed(network, paths, 96, transform,
                                    max_batch=2)
    cos = (f32 * bf16).sum(axis=0) / (
        np.linalg.norm(f32, axis=0) * np.linalg.norm(bf16, axis=0))
    assert (cos > 0.99).all(), cos
    monkeypatch.delenv("MDIR_TPU_COMPUTE_DTYPE")

    # auto policy + faked accelerator + failing guard: ships exact f32 and
    # caches the rejection under the composed kind
    module = network.model.module
    dtype_policy._GUARD_DECISIONS.pop(("composed", id(module)), None)
    monkeypatch.setattr(dtype_policy, "on_accelerator", lambda: True)
    monkeypatch.setattr(dtype_policy, "cosine_rows_ok",
                        lambda *a, **k: False)
    guarded = extract_vectors_composed(network, paths, 96, transform,
                                       max_batch=2)
    assert dtype_policy.guard_decision(module, kind="composed") is False
    np.testing.assert_array_equal(f32, guarded)
    dtype_policy._GUARD_DECISIONS.pop(("composed", id(module)), None)


def test_sequential_runtime_routes_fast_path_keys(composed_checkpoint):
    """Scenario-level compute_dtype/pallas on a composition route to the
    tail (embedder) subnet's runtime, where the composed extractor reads
    its dtype policy."""
    from mdir_tpu.learning import load_network

    root, ckpt_dir = composed_checkpoint
    network = load_network(
        {"path": str(ckpt_dir),
         "runtime": {"wrappers": {"train": None, "eval": ""},
                     "compute_dtype": "float32", "pallas": True}}).eval()
    tail = network.networks[network.sequence[-1]]
    assert tail.network_params.runtime["compute_dtype"] == "float32"
    assert tail.network_params.runtime["pallas"] is True

    # and the composed extractor actually consults it: the fused program
    # for this composition is built with pallas pooling selected
    import numpy as np
    from PIL import Image

    from mdir_tpu.data.transforms import initialize_transforms
    from mdir_tpu.parallel import extract as extract_mod

    network.wrappers["eval"] = __import__(
        "mdir_tpu.learning.wrappers", fromlist=["Compose"]).Compose([])
    mean_std = [[0.5] * 3, [0.5] * 3]
    transform = initialize_transforms("pil2np | totensor | normalize",
                                      mean_std)
    import tempfile, os
    fd, p = tempfile.mkstemp(suffix=".jpg")
    os.close(fd)
    rng = np.random.RandomState(0)
    Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(p)
    extract_mod._COMPOSED_CACHE.clear()
    extract_mod.extract_vectors_composed(network, [p], 64, transform,
                                         max_batch=1)
    assert any(k[4] is True for k in extract_mod._COMPOSED_CACHE), \
        "composed extractor ignored the routed pallas key"
    os.unlink(p)


def test_infer_embedding_output_with_nan_sentinel(tmp_path, rng):
    """infer stage with the embedding output: descriptors accumulate into an
    (N, D) matrix and a missing image (the `{}` dataset sentinel with
    ignore_errors) becomes a NaN row (reference output.py:128-131)."""
    from PIL import Image

    from mdir_tpu.learning.checkpoints import save_state
    from mdir_tpu.learning.network import CirNetwork
    from mdir_tpu.models import initialize_model
    from mdir_tpu.stages.infer import infer

    img_dir = tmp_path / "in"
    img_dir.mkdir()
    names = []
    for i in range(3):
        name = "img%d.jpg" % i
        Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(
            img_dir / name)
        names.append(name)
    names.insert(1, "missing.jpg")  # never written to disk

    model_params = {"architecture": "cirnet", "cir_architecture": "alexnet",
                    "local_whitening": False, "pooling": "gem",
                    "regional": False, "whitening": False,
                    "pretrained": False}
    model = initialize_model(dict(model_params))
    network = CirNetwork(model, CirNetwork.NetworkParams(
        model=dict(model_params),
        runtime={"wrappers": "",
                 "data": {"mean_std": [model.meta["mean"], model.meta["std"]],
                          "transforms": "pil2np | totensor | normalize"}}))
    ckpt = tmp_path / "net.ckpt"
    save_state(network.state_dict()["net"], ckpt)

    params = {
        "network": {"path": str(ckpt), "runtime": None},
        "output": {"inference": {"name": "embedding"}, "debug": False},
        "data": {"test": {
            "mean_std": [model.meta["mean"], model.meta["std"]],
            "transforms": "pil2np | totensor | normalize",
            "dataset": {"name": "CirImageList", "image_dir": str(img_dir),
                        "image_size": 64, "ignore_errors": True},
            "loader": {"num_workers": 0}}},
    }
    metadata, out_names, vecs = infer(copy.deepcopy(params), (names,))
    assert list(out_names) == names
    assert vecs.shape == (4, 256)  # (N, D): alexnet descriptor dim
    assert np.isnan(vecs[1]).all()  # the missing image's row
    good = np.delete(vecs, 1, axis=0)
    assert np.isfinite(good).all()
    np.testing.assert_allclose(np.linalg.norm(good, axis=1), 1.0, rtol=1e-5)


def test_composed_extraction_with_whitening(composed_checkpoint, rng,
                                            tmp_path):
    """The composed fused extractor applies a cirwhiten wrapper's learned
    projection at the end (CirtorchWhiten.postprocess), matching the
    per-image wrapper path."""
    import pickle

    from PIL import Image

    from mdir_tpu.data.transforms import initialize_transforms
    from mdir_tpu.learning import load_network
    from mdir_tpu.parallel.extract import (_load_images,
                                           extract_vectors_composed)

    root, ckpt_dir = composed_checkpoint
    dim = 256
    P = np.eye(dim) + 0.01 * np.random.RandomState(0).randn(dim, dim)
    m = 0.01 * np.random.RandomState(1).randn(dim, 1)
    whit_path = tmp_path / "whit.pkl"
    with open(whit_path, "wb") as handle:
        pickle.dump({"P": P, "m": m}, handle)

    network = load_network(
        {"path": str(ckpt_dir),
         "runtime": {"wrappers": {
             "train": None,
             "eval": {"0_cirwhiten": {"whitening": str(whit_path),
                                      "dimensions": 64},
                      "1_cirmultiscale": {"scales": True}}}}}).eval()

    mean_std = [[0.5] * 3, [0.5] * 3]
    transform = initialize_transforms("pil2np | totensor | normalize",
                                      mean_std)
    paths = []
    for i in range(2):
        p = tmp_path / ("w%d.jpg" % i)
        Image.fromarray((rng.rand(96, 104, 3) * 255).astype(np.uint8)).save(
            p, quality=95)
        paths.append(str(p))

    arrays = _load_images(paths, 96, transform)
    ref = np.stack([np.asarray(network(a)).reshape(-1) for a in arrays],
                   axis=1)
    fast = extract_vectors_composed(network, paths, 96, transform,
                                    max_batch=2)
    assert fast.shape == (64, 2)
    np.testing.assert_allclose(ref, fast, rtol=1e-4, atol=1e-5)


def test_sequential_overlay_params(composed_checkpoint):
    """network_overlay on a composition: per-subnet runtime overlays yield a
    FROZEN copy with new wrappers; the original network is untouched."""
    from mdir_tpu.learning import load_network

    root, ckpt_dir = composed_checkpoint
    network = load_network({"path": str(ckpt_dir), "runtime": None}).eval()
    base_tail_wrappers = network["embed"]
    assert base_tail_wrappers is network.networks["embed"]  # __getitem__

    overlay = network.overlay_params({
        "translate": None,
        "embed": {"runtime": {"wrappers": {
            "train": None, "eval": {"0_cirmultiscale": {"scales": True}}}}},
    })
    assert overlay is not network and overlay.frozen
    assert not network.frozen
    img = np.zeros((64, 64, 3), np.float32)
    out = np.asarray(overlay(img))
    assert out.shape[0] == 256 and np.isfinite(out).all()


def test_composed_bf16_p2p_unet_conv_transpose(rng, tmp_path, monkeypatch):
    """bf16 composition with a REAL p2p U-Net translator must run.

    Regression for a chip-only failure: the composed fused fn cast the
    batch to bf16 before the f32-weight resize, which promoted it back to
    f32, and the U-Net's raw lax.conv_transpose (unlike flax convs, which
    silently de-optimize) hard-errors on f32 input x bf16 kernel. The CPU
    fixtures only used flax-conv translators, so this never fired off-chip
    (BENCH r4 capture: composed_error 'lax.conv_general_dilated requires
    arguments to have the same dtypes')."""
    from mdir_tpu.data.transforms import initialize_transforms
    from mdir_tpu.learning.network import (CirNetwork, Network,
                                           SequentialNetwork, SingleNetwork)
    from mdir_tpu.models import initialize_model
    from mdir_tpu.parallel.extract import extract_vectors_composed

    t_params = {"architecture": "p2p_unet", "in_channels": 3,
                "out_channels": 3, "nested_levels": 2}
    translator = SingleNetwork(
        initialize_model(dict(t_params)),
        SingleNetwork.NetworkParams(model=t_params,
                                    runtime={"wrappers": ""}))
    translator.wrappers = Network.initialize_wrappers(
        "reflectpad_divisible:8")
    e_params = {"architecture": "cirnet", "cir_architecture": "alexnet",
                "local_whitening": False, "pooling": "gem", "regional": False,
                "whitening": False, "pretrained": False}
    embedder = CirNetwork(
        initialize_model(dict(e_params)),
        CirNetwork.NetworkParams(
            model=e_params,
            runtime={"wrappers": {"train": None,
                                  "eval": {"0_cirmultiscale":
                                           {"scales": False}}}}))
    network = SequentialNetwork({"translate": translator, "embed": embedder},
                                ["translate", "embed"]).eval()

    transform = initialize_transforms("pil2np | totensor | normalize",
                                      [[0.5] * 3, [0.5] * 3])
    arrays = [(rng.rand(64, 80, 3) * 255).astype(np.uint8) for _ in range(2)]

    f32 = extract_vectors_composed(network, arrays, 80, transform,
                                   max_batch=2)
    monkeypatch.setenv("MDIR_TPU_COMPUTE_DTYPE", "bfloat16")
    bf16 = extract_vectors_composed(network, arrays, 80, transform,
                                    max_batch=2)
    cos = (f32 * bf16).sum(axis=0) / (
        np.linalg.norm(f32, axis=0) * np.linalg.norm(bf16, axis=0))
    assert (cos > 0.99).all(), cos


def test_composed_array_inputs_and_instrumentation(composed_checkpoint, rng,
                                                   tmp_path):
    """Pre-decoded uint8 array inputs (the bench e2e contract) must equal
    the path-loaded run exactly, and the ``instrument`` dict must carry the
    StreamingExtractor-shaped per-chunk stats + pass budget."""
    from PIL import Image

    from mdir_tpu.data.transforms import initialize_transforms
    from mdir_tpu.learning import load_network
    from mdir_tpu.learning.network import Network
    from mdir_tpu.parallel.extract import extract_vectors_composed

    root, ckpt_dir = composed_checkpoint
    network = load_network(
        {"path": str(ckpt_dir),
         "runtime": {"wrappers": {
             "train": None,
             "eval": {"0_cirmultiscale": {"scales": True}}}}}).eval()
    network.networks["translate"].wrappers = Network.initialize_wrappers(
        "reflectpad_divisible:32")

    mean_std = [[0.5] * 3, [0.5] * 3]
    transform = initialize_transforms("pil2np | totensor | normalize",
                                      mean_std)

    # max side == image_size and lossless PNG: the loader path passes the
    # pixels through untouched, so both runs see identical inputs
    arrays, paths = [], []
    for i, (h, w) in enumerate([(96, 128), (128, 96), (100, 90), (96, 128)]):
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        p = tmp_path / ("arr%d.png" % i)
        Image.fromarray(arr).save(p)
        arrays.append(arr)
        paths.append(str(p))

    from_paths = extract_vectors_composed(network, paths, 128, transform,
                                          max_batch=2)
    instrument = {}
    from_arrays = extract_vectors_composed(network, arrays, 128, transform,
                                           max_batch=2,
                                           instrument=instrument)
    np.testing.assert_array_equal(from_paths, from_arrays)

    stats, budget = instrument["stats"], instrument["budget"]
    assert stats, "instrumented run recorded no chunks"
    for key in ("bytes", "batch_put_s", "aux_put_s", "launch_s", "t_done"):
        assert key in stats[0], key
    # producer-timeline ordering + non-negative intervals (same contract as
    # StreamingExtractor's budget, consumed by bench._pass_budget)
    assert budget["t_first_submit"] <= budget["t_drain_start"] \
        <= budget["t_end"]
    for key in ("assembly_s", "drain_s", "sync_s"):
        assert budget[key] >= 0.0

    # array inputs require the device-normalize chain
    with pytest.raises(ValueError):
        extract_vectors_composed(
            network, arrays, 128,
            initialize_transforms("pil2np | totensor", mean_std))


def test_bench_composed_e2e_smoke(monkeypatch):
    """bench._measure_composed_e2e runs end-to-end on CPU at tiny shapes
    (network construction, array streaming, budget fields)."""
    import bench

    monkeypatch.setenv("BENCH_COMPOSED_E2E_IMAGES", "2")
    out = bench._measure_composed_e2e(reps=1, hw=(128, 128), max_batch=2)
    assert out["composed_e2e_imgs_per_sec"] > 0
    assert 0.0 <= out["composed_ingress_saturation"] <= 1.0
    assert out["composed_budget_wall_s"] > 0
    assert "composed_downstream_wait_frac" in out


def test_composed_extraction_sharded_mesh_parity(composed_checkpoint, rng,
                                                 tmp_path):
    """Composed (translator -> embedder) extraction batch-sharded over an
    8-device CPU mesh must match the single-device run (DP scale-out parity
    for the composition workload, SURVEY 2.12)."""
    from PIL import Image

    from mdir_tpu.data.transforms import initialize_transforms
    from mdir_tpu.learning import load_network
    from mdir_tpu.learning.network import Network
    from mdir_tpu.parallel.extract import extract_vectors_composed
    from mdir_tpu.parallel.mesh import make_mesh

    root, ckpt_dir = composed_checkpoint
    network = load_network(
        {"path": str(ckpt_dir),
         "runtime": {"wrappers": {
             "train": None,
             "eval": {"0_cirmultiscale": {"scales": True}}}}}).eval()
    network.networks["translate"].wrappers = Network.initialize_wrappers(
        "reflectpad_divisible:32")

    mean_std = [[0.5] * 3, [0.5] * 3]
    transform = initialize_transforms("pil2np | totensor | normalize",
                                      mean_std)
    paths = []
    for i, (h, w) in enumerate([(96, 128), (96, 128), (128, 96)]):
        p = tmp_path / ("m%d.jpg" % i)
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(
            p, quality=95)
        paths.append(str(p))

    single = extract_vectors_composed(network, paths, 128, transform,
                                      max_batch=2)
    sharded = extract_vectors_composed(network, paths, 128, transform,
                                       max_batch=2, mesh=make_mesh(8))
    assert np.isfinite(sharded).all()
    np.testing.assert_allclose(single, sharded, rtol=1e-5, atol=1e-6)


def test_sequential_overlay_falsy_tail_keeps_wrappers(composed_checkpoint,
                                                      rng):
    """An overlay that changes only the head (tail entry falsy) must keep
    the tail's eval wrappers on the overlaid composition.

    Regression (confirmed by repro): __init__ steals the tail's wrappers
    into the composition and leaves the shared subnet an empty set, so a
    falsy tail overlay re-stole the EMPTY set — validation then scored
    descriptors without multiscale/whitening, silently wrong mAP."""
    from mdir_tpu.learning import load_network

    root, ckpt_dir = composed_checkpoint
    network = load_network(
        {"path": str(ckpt_dir),
         "runtime": {"wrappers": {
             "train": None,
             "eval": {"0_cirmultiscale": {"scales": True}}}}}).eval()

    overlay = network.overlay_params(
        {"translate": None, "embed": None}, None).eval()
    img = rng.rand(64, 64, 3).astype(np.float32)
    base_out = np.asarray(network(img))
    over_out = np.asarray(overlay(img))
    # multiscale aggregation returns an L2-normalized (D,) vector; without
    # the wrappers the raw forward returns (D, 1) unnormalized columns
    assert over_out.shape == base_out.shape == (256,)
    np.testing.assert_allclose(over_out, base_out, rtol=1e-6)
    # and the ORIGINAL composition still works after overlaying
    np.testing.assert_allclose(np.asarray(network(img)), base_out, rtol=1e-6)


def test_sequential_resume_with_declared_params(composed_checkpoint):
    """initialize_from_state with the full training-yaml params (subnet
    specs carrying "type", pathless) must pass the resume consistency
    check, not AssertionError on the unconsumed "type" key (confirmed by
    repro; the reference crashes identically)."""
    from mdir_tpu.learning.checkpoints import Checkpoints
    from mdir_tpu.learning.network import SequentialNetwork, initialize_network

    root, ckpt_dir = composed_checkpoint
    state = Checkpoints.load_network(str(ckpt_dir))

    t_spec = {"type": "SingleNetwork",
              "model": {"architecture": "pixelconv_regr", "in_channels": 3,
                        "out_channels": 3, "hidden": [8]},
              "initialize": {"weights": "default", "seed": 0},
              "runtime": {"wrappers": "",
                          "data": {"mean_std": [[0.5] * 3, [0.5] * 3],
                                   "transforms":
                                       "pil2np | totensor | normalize"}}}
    e_spec = {"type": "CirNetwork",
              "model": {"architecture": "cirnet",
                        "cir_architecture": "alexnet",
                        "local_whitening": False, "pooling": "gem",
                        "regional": False, "whitening": False,
                        "pretrained": False},
              "initialize": {"weights": "default", "seed": 0},
              "runtime": {"wrappers": {
                  "train": None,
                  "eval": {"0_cirmultiscale": {"scales": False}}}}}
    params = {"type": "SequentialNetwork", "sequence": "translate,embed",
              "translate": t_spec, "embed": e_spec}
    network = initialize_network(params, state=state)
    assert isinstance(network, SequentialNetwork)


def test_frozen_composition_train_is_noop(composed_checkpoint):
    """freeze() must leave the composition in EVAL stage and train() must
    not flip a frozen composition back to TRAIN-stage wrappers (base-class
    Network semantics)."""
    from mdir_tpu.learning import load_network
    from mdir_tpu.learning.network import EVAL

    root, ckpt_dir = composed_checkpoint
    network = load_network({"path": str(ckpt_dir), "runtime": None})
    network.train()
    network.freeze()
    assert network.stage == EVAL
    network.train()
    assert network.stage == EVAL


def test_composed_embedder_crop_equals_uncropped(rng):
    """The 64-aligned embedder crop (composed_crop_hws, static argnum of the
    fused program) is exact: the masked embedder makes any covering shape
    equal, so cropping the translator's 256-aligned pad down to the bucket's
    scaled extent must not move descriptors."""
    import math

    from mdir_tpu.models import initialize_model
    from mdir_tpu.parallel.extract import (_get_composed, composed_crop_hws,
                                           composed_pack_grids)

    t_model = initialize_model({"architecture": "p2p_unet",
                                "in_channels": 3, "out_channels": 3})
    e_model = initialize_model({
        "architecture": "cirnet", "cir_architecture": "alexnet",
        "local_whitening": False, "pooling": "gem", "regional": False,
        "whitening": False, "pretrained": False})
    fused = _get_composed(t_model, e_model, True, None)

    rh, rw, div, batch = 96, 160, 256, 2
    scales = (1, 0.5)
    batch_u8 = jnp.asarray(
        (rng.rand(batch, rh, rw, 3) * 255).astype(np.uint8))
    mean = jnp.asarray(e_model.meta["mean"], jnp.float32)
    std = jnp.asarray(e_model.meta["std"], jnp.float32)

    packs, pads = [], []
    for scale in scales:
        sh = int(math.floor(rh * scale)) if scale != 1 else rh
        sw = int(math.floor(rw * scale)) if scale != 1 else rw
        ph, pw = -(-sh // div) * div, -(-sw // div) * div
        pads.append((ph, pw))
        yrow, xrow, valid_hw = composed_pack_grids(rh, rw, scale, div,
                                                   ph, pw)
        packs.append((
            jnp.asarray(np.tile(np.array([valid_hw], np.int32), (batch, 1))),
            jnp.asarray(np.tile(yrow[None], (batch, 1, 1))),
            jnp.asarray(np.tile(xrow[None], (batch, 1, 1)))))

    crops = composed_crop_hws((rh, rw), pads, scales)
    # the crop must actually bite at this geometry (96x160 inside 256x256)
    assert crops == ((128, 192), (64, 128)), crops
    args = (t_model.variables, e_model.variables, batch_u8, tuple(packs),
            mean, std, jnp.float32(3.0))
    uncropped = np.asarray(fused(*args))
    cropped = np.asarray(fused(*args, crops))
    assert cropped.shape == uncropped.shape
    np.testing.assert_allclose(cropped, uncropped, rtol=1e-5, atol=1e-6)
