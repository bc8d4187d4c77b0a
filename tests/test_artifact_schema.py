"""The published-artifact format end-to-end: a torch-saved checkpoint in the
reference's exact schema (``mdir/learning/network.py:142-150`` —
``{"net": {type, frozen, network_params, model_state}}`` with torch OIHW
tensors and cirtorch param naming) must load through ``load_network`` and
produce torch-identical descriptors. This is the file shape of
``alex_clahe_sfmnd0.25-4142b192.pth`` (eval_test.yml's network.path), so the
staged-artifact acceptance run only swaps in the real bytes.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")


MODEL_PARAMS = {"architecture": "cirnet", "cir_architecture": "alexnet",
                "local_whitening": False, "pooling": "gem",
                "regional": False, "whitening": False, "pretrained": False}
MEAN_STD = [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]]


def _torch_alexnet_features():
    from tests.test_parity_pipeline import _torch_alexnet_features as f

    return f()


def test_reference_schema_pth_roundtrip(tmp_path, rng):
    import torch.nn as tnn

    from mdir_tpu.learning import load_network
    from tests.test_parity_pipeline import _torch_forward

    torch.manual_seed(0)
    feats = _torch_alexnet_features().eval()
    p_value = 2.8

    # cirtorch ImageRetrievalNet state naming: features.<i>.*, pool.p
    model_state = {"features.%s" % k: v for k, v in feats.state_dict().items()}
    model_state["pool.p"] = torch.tensor([p_value])
    # the on-disk artifact holds the INNER dict; Checkpoints.load_network
    # re-wraps it under "net" (reference checkpoints.py:145-155)
    checkpoint = {
        "type": "CirNetwork",
        "frozen": True,
        "network_params": {
            "model": dict(MODEL_PARAMS),
            "runtime": {
                "wrappers": "",
                "data": {"mean_std": MEAN_STD,
                         "transforms":
                             "pil2np | apply_clahe | totensor | normalize"},
            },
        },
        "model_state": model_state,
    }
    pth = tmp_path / "alex_synthetic.pth"
    torch.save(checkpoint, pth)

    network = load_network({"path": str(pth), "runtime": None}).eval()
    # the checkpoint-embedded runtime (CLAHE transforms) must survive
    assert "apply_clahe" in network.network_params.runtime["data"]["transforms"]

    img = rng.rand(96, 120, 3).astype(np.float32)
    ours = np.asarray(network(img)).reshape(-1)

    with torch.no_grad():
        x = torch.tensor(img.transpose(2, 0, 1))[None]
        ref = _torch_forward(feats, torch.tensor(p_value), x).numpy().reshape(-1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-4)


def test_cirtorch_format_embed_stage(tmp_path, rng):
    """The cirtorch_format embed stage over an OFFICIAL-format checkpoint
    (cirtorch test.py schema: {"meta": ..., "state_dict": ...}) — descriptors
    come back (N, D) L2-normalized; empty input short-circuits to skipped."""
    from PIL import Image

    from mdir_tpu.stages.cirtorch_format import embed

    torch.manual_seed(1)
    feats = _torch_alexnet_features().eval()
    state_dict = {"features.%s" % k: v for k, v in feats.state_dict().items()}
    state_dict["pool.p"] = torch.tensor([3.0])
    official = {
        "meta": {"architecture": "alexnet", "local_whitening": False,
                 "pooling": "gem", "regional": False, "whitening": False,
                 "mean": MEAN_STD[0], "std": MEAN_STD[1], "outputdim": 256},
        "state_dict": state_dict,
    }
    pth = tmp_path / "official.pth"
    torch.save(official, pth)

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    names = []
    for i in range(3):
        name = "e%d.jpg" % i
        Image.fromarray((rng.rand(96, 96, 3) * 255).astype(np.uint8)).save(
            img_dir / name)
        names.append(name)

    meta, out_names, vecs = embed(
        {"net": str(pth), "imgdir": str(img_dir), "image_size": 96,
         "multiscale": False}, (names,))
    assert list(out_names) == names
    assert vecs.shape == (3, 256)
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0, rtol=1e-5)

    skipped = embed({"net": str(pth), "imgdir": str(img_dir)}, ([],))
    assert skipped[0] == {"status": "skipped"}


def test_cirtorch_format_load_whitening(tmp_path):
    """load_whitening reads the Lw entry embedded in an official checkpoint's
    meta (ms/ss keyed) and optionally persists it to the whitening dir."""
    import pickle

    from mdir_tpu.stages.cirtorch_format import load_whitening

    lw_ms = {"m": np.zeros((4, 1)), "P": np.eye(4)}
    official = {"meta": {"architecture": "alexnet",
                         "Lw": {"retrieval-SfM-120k": {"ms": lw_ms,
                                                       "ss": None}}},
                "state_dict": {}}
    pth = tmp_path / "whit_net.pth"
    torch.save(official, pth)

    meta, lw = load_whitening({"net": str(pth), "whitening": "sfm120k"}, ())
    np.testing.assert_array_equal(np.asarray(lw["P"]), np.eye(4))

    out_dir = tmp_path / "whit"
    (meta,) = load_whitening({"net": str(pth), "whitening": "sfm120k",
                              "whitening_dir": str(out_dir)}, ())
    files = list(out_dir.iterdir())
    assert len(files) == 1 and files[0].suffix == ".pkl"
    with open(files[0], "rb") as handle:
        stored = pickle.load(handle)
    np.testing.assert_array_equal(np.asarray(stored["P"]), np.eye(4))
