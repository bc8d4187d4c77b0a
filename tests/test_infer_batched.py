"""Batched infer == per-item infer, bit-identical.

The infer stage routes embedding outputs through the fused bucketed
extractor and rgb outputs through the streaming batched translator
(VERDICT r4 #3: the reference-shaped bs=1 loop is pathological on this
backend). These tests pin the batched routes against the exact per-item
loader loop on the composition fixtures: saved image files byte-identical,
descriptor matrices element-identical.
"""
import copy
import filecmp
import os

import numpy as np
import pytest

from mdir_tpu.learning.checkpoints import save_state
from mdir_tpu.learning.network import SingleNetwork
from mdir_tpu.models import initialize_model
from mdir_tpu.stages import infer as infer_mod


@pytest.fixture()
def rng():
    return np.random.RandomState(3)


def _save_images(img_dir, rng, shapes):
    from PIL import Image

    os.makedirs(img_dir)
    names = []
    for i, (h, w) in enumerate(shapes):
        name = "img%02d.jpg" % i
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, name), quality=95)
        names.append(name)
    return names


def _unet_checkpoint(tmp_path):
    model_params = {"architecture": "pixelconv_regr", "in_channels": 3,
                    "out_channels": 3, "hidden": [8]}
    network = SingleNetwork(
        initialize_model(dict(model_params)),
        SingleNetwork.NetworkParams(
            model=model_params,
            runtime={"wrappers": "reflectpad_divisible:32",
                     "data": {"mean_std": [[0.5] * 3, [0.5] * 3],
                              "transforms":
                                  "pil2np | totensor | normalize"}}))
    ckpt = tmp_path / "net.ckpt"
    save_state(network.state_dict()["net"], ckpt)
    return ckpt


def _rgb_params(ckpt, img_dir, out_dir, image_size=48):
    return {
        "network": {"path": str(ckpt),
                    "runtime": {"wrappers": "reflectpad_divisible:32"}},
        "output": {"inference": {"name": "rgb", "image_dir": str(out_dir)},
                   "debug": False},
        "data": {"test": {
            "mean_std": [[0.5] * 3, [0.5] * 3],
            "transforms": "pil2np | totensor | normalize",
            "dataset": {"name": "CirImageList", "image_dir": str(img_dir),
                        "image_size": image_size},
            "loader": {"num_workers": 0},
        }},
    }


def _force_per_item(monkeypatch):
    monkeypatch.setattr(infer_mod, "_run_batched",
                        lambda *a, **k: None)


def test_rgb_translation_batched_equals_per_item(tmp_path, rng, monkeypatch):
    """Mixed aspect shapes (several pad groups, partial batches) produce
    byte-identical files through both routes."""
    shapes = [(40, 56), (56, 40), (40, 56), (48, 48), (33, 47)]
    names = _save_images(str(tmp_path / "in"), rng, shapes)
    ckpt = _unet_checkpoint(tmp_path)

    params = _rgb_params(ckpt, tmp_path / "in", tmp_path / "out_batched")
    meta, fnames = infer_mod.infer(copy.deepcopy(params), (names,))
    assert sorted(fnames) == sorted(names)
    assert "stats" in meta

    params_ref = _rgb_params(ckpt, tmp_path / "in", tmp_path / "out_ref")
    _force_per_item(monkeypatch)
    meta_ref, fnames_ref = infer_mod.infer(copy.deepcopy(params_ref),
                                           (names,))
    assert sorted(fnames_ref) == sorted(names)

    for name in names:
        a = tmp_path / "out_batched" / name
        b = tmp_path / "out_ref" / name
        assert filecmp.cmp(a, b, shallow=False), name


def test_rgb_translation_append_resume(tmp_path, rng):
    shapes = [(40, 40)] * 3
    names = _save_images(str(tmp_path / "in"), rng, shapes)
    ckpt = _unet_checkpoint(tmp_path)
    params = _rgb_params(ckpt, tmp_path / "in", tmp_path / "out")
    params["output"]["inference"]["append"] = True
    meta, _ = infer_mod.infer(copy.deepcopy(params), (names,))
    assert "stats" in meta
    meta2, _ = infer_mod.infer(copy.deepcopy(params), (names,))
    assert meta2 == {"status": "skipped"}


def test_rgb_host_transform_fallback_chain(tmp_path, rng, monkeypatch):
    """A non-plain chain (extra channel op) still batches, via the host
    transform loader, and matches per-item byte-for-byte."""
    shapes = [(40, 56), (56, 40), (40, 56)]
    names = _save_images(str(tmp_path / "in"), rng, shapes)

    model_params = {"architecture": "pixelconv_regr", "in_channels": 3,
                    "out_channels": 3, "hidden": [8]}
    network = SingleNetwork(
        initialize_model(dict(model_params)),
        SingleNetwork.NetworkParams(
            model=model_params,
            runtime={"wrappers": "",
                     "data": {"mean_std": [[0.5] * 3, [0.5] * 3]}}))
    ckpt = tmp_path / "net.ckpt"
    save_state(network.state_dict()["net"], ckpt)

    def build(out_dir):
        params = _rgb_params(ckpt, tmp_path / "in", out_dir)
        params["network"]["runtime"] = {"wrappers": ""}
        chain = "pil2np | np_invert_chan:0 | totensor | normalize"
        params["data"]["test"]["transforms"] = chain
        return params

    infer_mod.infer(build(tmp_path / "out_batched"), (names,))
    _force_per_item(monkeypatch)
    infer_mod.infer(build(tmp_path / "out_ref"), (names,))
    for name in names:
        assert filecmp.cmp(tmp_path / "out_batched" / name,
                           tmp_path / "out_ref" / name, shallow=False), name


def test_embedding_batched_equals_per_item(tmp_path, rng, monkeypatch):
    from mdir_tpu.learning.network import CirNetwork

    shapes = [(48, 64), (64, 48), (48, 48), (48, 64)]
    names = _save_images(str(tmp_path / "in"), rng, shapes)
    names.insert(2, "missing.jpg")

    model_params = {"architecture": "cirnet", "cir_architecture": "alexnet",
                    "local_whitening": False, "pooling": "gem",
                    "regional": False, "whitening": False,
                    "pretrained": False}
    model = initialize_model(dict(model_params))
    network = CirNetwork(model, CirNetwork.NetworkParams(
        model=dict(model_params),
        runtime={"wrappers": "",
                 "data": {"mean_std": [model.meta["mean"],
                                       model.meta["std"]],
                          "transforms":
                              "pil2np | totensor | normalize"}}))
    ckpt = tmp_path / "net.ckpt"
    save_state(network.state_dict()["net"], ckpt)

    def build():
        return {
            "network": {"path": str(ckpt), "runtime": None},
            "output": {"inference": {"name": "embedding"}, "debug": False},
            "data": {"test": {
                "mean_std": [model.meta["mean"], model.meta["std"]],
                "transforms": "pil2np | totensor | normalize",
                "dataset": {"name": "CirImageList",
                            "image_dir": str(tmp_path / "in"),
                            "image_size": 64, "ignore_errors": True},
                "loader": {"num_workers": 0}}},
        }

    _, out_names, vecs = infer_mod.infer(build(), (names,))
    assert list(out_names) == names
    assert np.isnan(vecs[2]).all()

    _force_per_item(monkeypatch)
    _, _, vecs_ref = infer_mod.infer(build(), (names,))
    assert np.isnan(vecs_ref[2]).all()
    good = [0, 1, 3, 4]
    np.testing.assert_allclose(vecs[good], vecs_ref[good], atol=1e-6)
    # cosine ~1: the bucket path and wrapper path are the pinned-equal pair
    cos = (vecs[good] * vecs_ref[good]).sum(axis=1)
    assert (cos > 1 - 1e-6).all()


def test_bench_infer_smoke(monkeypatch):
    """bench._measure_infer runs end-to-end on CPU at tiny shapes."""
    import bench

    out = bench._measure_infer(
        reps=1, hw=(40, 56), n_images=3, max_batch=2,
        t_params={"architecture": "pixelconv_regr", "in_channels": 3,
                  "out_channels": 3, "hidden": [8]},
        wrappers="reflectpad_divisible:32")
    assert out["infer_imgs_per_sec"] > 0
    assert out["infer_resident_imgs_per_sec"] > 0
    assert 0.0 <= out["infer_ingress_saturation"] <= 1.0
    assert "infer_at_40mbps_imgs_per_sec" in out


def test_device_u8_egress_guard_and_bytes(tmp_path, rng):
    """StreamingTranslator(device_u8): the first-batch guard verifies the
    device denormalize->u8 equals the host conversion bit-for-bit (the
    optimization_barrier'd op chain), the fast path stays on, and sinks
    receive uint8 outputs identical to converting the f32 path on host."""
    from mdir_tpu.parallel.translate import (StreamingTranslator,
                                             host_u8_image)

    ckpt = _unet_checkpoint(tmp_path)
    from mdir_tpu.learning import load_network

    network = load_network({"path": str(ckpt),
                            "runtime": {"wrappers": "reflectpad_divisible:32"}})
    network.eval()
    mean_std = ([0.5] * 3, [0.5] * 3)

    shapes = [(40, 56), (40, 56), (33, 47), (56, 40), (40, 56)]
    arrays = [(rng.rand(h, w, 3) * 255).astype(np.uint8) for h, w in shapes]

    got_u8 = {}
    tr = StreamingTranslator(network, lambda i, inp, out:
                             got_u8.__setitem__(i, np.asarray(out[0])),
                             mean_std=mean_std, max_batch=2, device_u8=True)
    for i, arr in enumerate(arrays):
        tr.add(i, arr)
    tr.finish()
    assert tr._u8_ok is True
    assert all(v.dtype == np.uint8 for v in got_u8.values())

    got_f32 = {}
    tr2 = StreamingTranslator(network, lambda i, inp, out:
                              got_f32.__setitem__(i, np.asarray(out[0])),
                              mean_std=mean_std, max_batch=2)
    for i, arr in enumerate(arrays):
        tr2.add(i, arr)
    tr2.finish()
    for i in got_u8:
        ref = host_u8_image(got_f32[i], np.asarray(mean_std[0], np.float32),
                            np.asarray(mean_std[1], np.float32))
        np.testing.assert_array_equal(got_u8[i], ref)


def test_device_u8_guard_falls_back_on_mismatch(tmp_path, rng, monkeypatch):
    """A conversion mismatch (simulated) must flip the run to f32 downloads
    — sinks then receive float outputs, never silently-wrong u8."""
    from mdir_tpu.parallel import translate as tr_mod

    ckpt = _unet_checkpoint(tmp_path)
    from mdir_tpu.learning import load_network

    network = load_network({"path": str(ckpt),
                            "runtime": {"wrappers": "reflectpad_divisible:32"}})
    network.eval()
    monkeypatch.setattr(tr_mod, "host_u8_image",
                        lambda out, m, s: np.zeros_like(
                            out, np.uint8))  # never matches
    got = {}
    tr = tr_mod.StreamingTranslator(
        network, lambda i, inp, out: got.__setitem__(i, np.asarray(out[0])),
        mean_std=([0.5] * 3, [0.5] * 3), max_batch=2, device_u8=True)
    for i in range(4):
        tr.add(i, (rng.rand(40, 56, 3) * 255).astype(np.uint8))
    tr.finish()
    assert tr._u8_ok is False
    assert all(v.dtype == np.float32 for v in got.values())
