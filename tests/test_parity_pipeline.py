"""Whole-pipeline parity vs a torch transcription of the reference eval.

Builds one AlexNet-GeM network in torch, imports the same weights into our
flax model, then runs BOTH full evaluation pipelines on the same JPEG files:

reference side (transcribed): PIL load -> thumbnail -> ToTensor+Normalize ->
per scale F.interpolate(bilinear) -> trunk -> GeM -> L2N -> msp aggregation
-> Lw whitening -> numpy ranking -> loop-based junk-aware mAP.

our side: the production CirDatasetAp path (streaming uint8 ingress, fused
bucketed multi-scale extraction with masked trunks, on-device ranking,
vectorized mAP).

Descriptors must agree to float tolerance and mAP to ~1e-6 — this covers the
whole parity chain end to end without any downloads.
"""
import math
import os
import pickle

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

MEAN = [0.485, 0.456, 0.406]
STD = [0.229, 0.224, 0.225]


def _torch_alexnet_features():
    return tnn.Sequential(
        tnn.Conv2d(3, 64, 11, 4, 2), tnn.ReLU(), tnn.MaxPool2d(3, 2),
        tnn.Conv2d(64, 192, 5, 1, 2), tnn.ReLU(), tnn.MaxPool2d(3, 2),
        tnn.Conv2d(192, 384, 3, 1, 1), tnn.ReLU(),
        tnn.Conv2d(384, 256, 3, 1, 1), tnn.ReLU(),
        tnn.Conv2d(256, 256, 3, 1, 1), tnn.ReLU(),
    )


def _torch_gem(x, p, eps=1e-6):
    return F.avg_pool2d(x.clamp(min=eps).pow(p),
                        (x.size(-2), x.size(-1))).pow(1.0 / p)


def _torch_forward(feats, p, x):
    o = feats(x)
    o = _torch_gem(o, p)
    o = o.squeeze(-1).squeeze(-1)
    o = o / (torch.norm(o, p=2, dim=1, keepdim=True) + 1e-6)
    return o.permute(1, 0)  # D x N


def _torch_extract(feats, p, paths, image_size, msp):
    """Transcription of cirtorch extract_vectors + extract_ms."""
    from PIL import Image

    vecs = torch.zeros(256, len(paths))
    scales = [1, 1.0 / math.sqrt(2), 1.0 / 2]
    mean = torch.tensor(MEAN).view(3, 1, 1)
    std = torch.tensor(STD).view(3, 1, 1)
    with torch.no_grad():
        for i, path in enumerate(paths):
            img = Image.open(path).convert("RGB")
            img.thumbnail((image_size, image_size), Image.LANCZOS)
            arr = torch.tensor(
                np.asarray(img, np.float32) / 255.0).permute(2, 0, 1)
            inp = ((arr - mean) / std).unsqueeze(0)

            v = torch.zeros(256)
            for s in scales:
                x = inp if s == 1 else F.interpolate(
                    inp, scale_factor=s, mode="bilinear", align_corners=False)
                v += _torch_forward(feats, p, x).pow(msp).squeeze()
            v = (v / len(scales)).pow(1.0 / msp)
            v /= v.norm()
            vecs[:, i] = v
    return vecs.numpy()


@pytest.fixture(scope="module")
def parity_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("parity")
    os.environ["MDIR_TPU_ROOT"] = str(root)
    from PIL import Image

    rng = np.random.RandomState(11)
    jpg_dir = root / "data" / "test" / "roxford5k" / "jpg"
    jpg_dir.mkdir(parents=True)
    imlist = ["p%02d" % i for i in range(10)]
    qimlist = imlist[:3]
    sizes = [(250, 330), (330, 250), (280, 280), (240, 350), (350, 240),
             (300, 300), (320, 260), (260, 320), (256, 256), (230, 340)]
    for name, (h, w) in zip(imlist, sizes):
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(
            jpg_dir / (name + ".jpg"), quality=95)

    gnd = []
    for q in range(3):
        perm = rng.permutation(10)
        gnd.append({"easy": perm[:2], "hard": perm[2:4], "junk": perm[4:5],
                    "bbx": None})
    with open(root / "data" / "test" / "roxford5k" / "gnd_roxford5k.pkl",
              "wb") as handle:
        pickle.dump({"imlist": imlist, "qimlist": qimlist, "gnd": gnd}, handle)

    yield root, [str(jpg_dir / (n + ".jpg")) for n in imlist], gnd
    os.environ.pop("MDIR_TPU_ROOT", None)


def test_full_pipeline_parity(parity_root, tmp_path):
    root, paths, gnd = parity_root
    torch.manual_seed(0)
    feats = _torch_alexnet_features().eval()
    p_value = 2.8

    # ---- reference-side pipeline (torch transcription) ----
    rng = np.random.RandomState(2)
    dim = 256
    P = np.eye(dim) + 0.01 * rng.randn(dim, dim)
    m = 0.01 * rng.randn(dim, 1)

    ref_vecs = _torch_extract(feats, torch.tensor(p_value), paths, 224,
                              msp=p_value)
    X = np.dot(P, ref_vecs - m)
    ref_white = X / (np.linalg.norm(X, ord=2, axis=0, keepdims=True) + 1e-6)
    ref_qvecs = ref_white[:, :3]
    ref_scores = np.dot(ref_white.T, ref_qvecs)
    ref_ranks = np.argsort(-ref_scores, axis=0)

    from tests.test_ranking import _reference_compute_map

    gnd_m = [{"ok": np.concatenate([g["easy"], g["hard"]]), "junk": g["junk"]}
             for g in gnd]
    ref_map = _reference_compute_map(ref_ranks, gnd_m)[0]

    # ---- our side: import weights, run the production validate stage ----
    import pickle as pkl

    from mdir_tpu.learning.checkpoints import save_state
    from mdir_tpu.learning.network import CirNetwork
    from mdir_tpu.models import initialize_model, torch_import
    from mdir_tpu.stages.validate import validate

    model = initialize_model({
        "architecture": "cirnet", "cir_architecture": "alexnet",
        "local_whitening": False, "pooling": "gem", "regional": False,
        "whitening": False, "pretrained": False})
    state = {"features." + k: v.detach().numpy()
             for k, v in feats.state_dict().items()}
    state["pool.p"] = np.array([p_value], np.float32)
    torch_import.import_model_state(model, state)

    network = CirNetwork(model, CirNetwork.NetworkParams(
        model={"architecture": "cirnet", "cir_architecture": "alexnet",
               "local_whitening": False, "pooling": "gem", "regional": False,
               "whitening": False, "pretrained": False},
        runtime={"wrappers": "",
                 "data": {"mean_std": [MEAN, STD],
                          "transforms": "pil2np | totensor | normalize"}}))
    ckpt = tmp_path / "net.ckpt"
    save_state(network.state_dict()["net"], ckpt)
    whit = tmp_path / "whit.pkl"
    with open(whit, "wb") as handle:
        pkl.dump({"P": P, "m": m}, handle)

    # direct descriptor comparison through the production extractor
    from mdir_tpu.data.transforms import initialize_transforms
    from mdir_tpu.parallel.extract import extract_vectors_network

    network2 = CirNetwork(model, CirNetwork.NetworkParams(
        model={}, runtime={"wrappers": {
            "train": None,
            "eval": {"0_cirwhiten": {"whitening": str(whit), "dimensions": None},
                     "1_cirmultiscale": {"scales": True}}}}), frozen=True)
    transform = initialize_transforms("pil2np | totensor | normalize",
                                      [MEAN, STD])
    ours_white = extract_vectors_network(network2, paths, 224, transform)
    np.testing.assert_allclose(ref_white, ours_white, rtol=1e-3, atol=2e-4)

    # full validate stage -> identical mAP
    scenario = {
        "network": {
            "path": str(ckpt),
            "runtime": {"wrappers": {
                "train": None,
                "eval": {"0_cirwhiten": {"whitening": str(whit),
                                         "dimensions": None},
                         "1_cirmultiscale": {"scales": True}}}},
        },
        "validation": {
            "type": "MultiCriterialValidation",
            "decisive_criterion": None,
            "roxford5k": {"type": "SingleValidation", "frequency": None,
                          "criterion": {"type": "cirdatasetap",
                                        "image_size": 224,
                                        "dataset": "roxford5k"},
                          "network_overlay": None, "data": None},
        },
        "data": {},
    }
    metadata, = validate(scenario, ())
    ours_map = metadata["eval"]["roxford5k/validation/score:ap_medium_avg.4"]
    np.testing.assert_allclose(ref_map, ours_map, atol=1e-6)


def test_clahe_chain_pipeline_parity(parity_root, tmp_path):
    """Same end-to-end comparison with the paper's CLAHE preprocessing chain
    (the eval_test.yml configuration shape: pil2np | apply_clahe | totensor |
    normalize). The host chain goes through our cv2-bit-exact CLAHE."""
    import cv2

    root, paths, gnd = parity_root
    torch.manual_seed(1)
    feats = _torch_alexnet_features().eval()
    p_value = 3.0

    def torch_clahe_extract(paths, image_size):
        from PIL import Image

        clahe = cv2.createCLAHE(clipLimit=4, tileGridSize=(8, 8))
        mean = torch.tensor(MEAN).view(3, 1, 1)
        std = torch.tensor(STD).view(3, 1, 1)
        vecs = torch.zeros(256, len(paths))
        scales = [1, 1.0 / math.sqrt(2), 1.0 / 2]
        with torch.no_grad():
            for i, path in enumerate(paths):
                img = Image.open(path).convert("RGB")
                img.thumbnail((image_size, image_size), Image.LANCZOS)
                pic = np.asarray(img, np.float32) / 255.0
                # reference ApplyClahe: lab space, CLAHE on L, back to rgb
                spc = (cv2.cvtColor(pic, cv2.COLOR_RGB2LAB)
                       + np.array([0, 128, 128], np.float32)) / np.array(
                           [100.0, 255.0, 255.0], np.float32)
                spc[:, :, 0] = clahe.apply(
                    (spc[:, :, 0] * 255).astype(np.uint8)).astype(
                        np.float32) / 255.0
                pic = cv2.cvtColor(
                    (spc * np.array([100.0, 255.0, 255.0], np.float32))
                    - np.array([0, 128, 128], np.float32), cv2.COLOR_LAB2RGB)
                arr = torch.tensor(pic).permute(2, 0, 1)
                inp = ((arr - mean) / std).unsqueeze(0)
                v = torch.zeros(256)
                for s in scales:
                    x = inp if s == 1 else F.interpolate(
                        inp, scale_factor=s, mode="bilinear",
                        align_corners=False)
                    v += _torch_forward(feats, torch.tensor(p_value),
                                        x).pow(p_value).squeeze()
                v = (v / len(scales)).pow(1.0 / p_value)
                v /= v.norm()
                vecs[:, i] = v
        return vecs.numpy()

    ref_vecs = torch_clahe_extract(paths, 224)

    from mdir_tpu.data.transforms import initialize_transforms
    from mdir_tpu.learning.network import CirNetwork
    from mdir_tpu.models import initialize_model, torch_import
    from mdir_tpu.parallel.extract import extract_vectors_network

    model = initialize_model({
        "architecture": "cirnet", "cir_architecture": "alexnet",
        "local_whitening": False, "pooling": "gem", "regional": False,
        "whitening": False, "pretrained": False})
    state = {"features." + k: v.detach().numpy()
             for k, v in feats.state_dict().items()}
    state["pool.p"] = np.array([p_value], np.float32)
    torch_import.import_model_state(model, state)

    network = CirNetwork(model, CirNetwork.NetworkParams(
        model={}, runtime={"wrappers": {
            "train": None,
            "eval": {"0_cirmultiscale": {"scales": True}}}}), frozen=True)
    transform = initialize_transforms(
        "pil2np | apply_clahe | totensor | normalize", [MEAN, STD])
    ours = extract_vectors_network(network, paths, 224, transform)
    np.testing.assert_allclose(ref_vecs, ours, rtol=1e-3, atol=2e-4)
