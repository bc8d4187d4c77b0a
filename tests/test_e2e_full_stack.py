"""One-command rehearsal of ``./eval.py test``'s EXACT stack on synthetics.

The acceptance scenario (reference ``examples/iccv19/eval_test.yml``) is the
overlay of eval.yml + a network override: checkpoint-embedded runtime data
(mean_std + ``pil2np | apply_clahe | totensor | normalize``), cirwhiten +
multiscale wrappers, and a 3-dataset MultiCriterialValidation — roxford5k /
rparis6k (revisited E/M/H gnd) and 247tokyo1k (old 'ok' protocol). This test
drives that whole shape through the real CLI with synthetic datasets and a
synthetic checkpoint, so the only thing the real run adds is the artifacts
(staged via MDIR_TPU_ARTIFACTS — see tests/test_acceptance.py).
"""
import os
import pickle
import re
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def full_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("fullstack")
    from PIL import Image

    rng = np.random.RandomState(11)
    test_dir = root / "data" / "test"

    def build_dataset(name, gnd):
        jpg = test_dir / name / "jpg"
        jpg.mkdir(parents=True)
        imlist = ["%s_im%02d" % (name, i) for i in range(8)]
        qimlist = ["%s_q%02d" % (name, i) for i in range(2)]
        for img in imlist + qimlist:
            arr = (rng.rand(80, 96, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(jpg / (img + ".jpg"))
        with open(test_dir / name / ("gnd_%s.pkl" % name), "wb") as handle:
            pickle.dump({"imlist": imlist, "qimlist": qimlist, "gnd": gnd},
                        handle)

    revisited = [
        {"easy": np.array([1, 2]), "hard": np.array([4]),
         "junk": np.array([0]), "bbx": [2.0, 2.0, 80.0, 60.0]},
        {"easy": np.array([5]), "hard": np.array([6, 7]),
         "junk": np.array([3]), "bbx": None},
    ]
    old_protocol = [
        {"ok": np.array([0, 2]), "junk": np.array([1]), "bbx": None},
        {"ok": np.array([3]), "junk": np.array([]), "bbx": None},
    ]
    build_dataset("roxford5k", revisited)
    build_dataset("rparis6k", revisited)
    build_dataset("247tokyo1k", old_protocol)
    return root


@pytest.fixture(scope="module")
def clahe_checkpoint(full_root):
    """AlexNet-GeM checkpoint embedding the CLAHE runtime (like the real
    alex_clahe artifact) + an Lw-style whitening pkl."""
    from mdir_tpu.learning.checkpoints import save_state
    from mdir_tpu.learning.network import CirNetwork
    from mdir_tpu.models import initialize_model

    model_params = {"architecture": "cirnet", "cir_architecture": "alexnet",
                    "local_whitening": False, "pooling": "gem",
                    "regional": False, "whitening": False,
                    "pretrained": False}
    model = initialize_model(dict(model_params))
    network = CirNetwork(model, CirNetwork.NetworkParams(
        model=model_params,
        runtime={"wrappers": "",
                 "data": {"mean_std": [model.meta["mean"], model.meta["std"]],
                          "transforms":
                              "pil2np | apply_clahe | totensor | normalize"}}))
    ckpt = full_root / "alex_clahe_synthetic.ckpt"
    save_state(network.state_dict()["net"], ckpt)

    rng = np.random.RandomState(1)
    dim = model.meta["out_channels"]
    whit = full_root / "whiten_synthetic.pkl"
    with open(whit, "wb") as handle:
        pickle.dump({"P": np.eye(dim) + 0.01 * rng.randn(dim, dim),
                     "m": 0.01 * rng.randn(dim, 1)}, handle)
    return str(ckpt), str(whit)


def test_eval_cli_full_test_stack(full_root, clahe_checkpoint, tmp_path):
    """eval.yml + override through the CLI: CLAHE runtime + cirwhiten +
    multiscale + 3 datasets (incl. Tokyo's 'ok' protocol), one command."""
    import yaml

    net_path, whit_path = clahe_checkpoint
    override = {
        "network": {
            "path": net_path,
            "runtime": {"wrappers": {"eval": {
                "0_cirwhiten": {"whitening": whit_path}}}},
        },
        # synthetic images are tiny; shrink the eval resolution
        "validation": {name: {"criterion": {"image_size": 96}}
                       for name in ("roxford5k", "rparis6k", "247tokyo1k")},
    }
    override_path = tmp_path / "local_test.yml"
    with open(override_path, "w") as handle:
        yaml.safe_dump(override, handle)

    here = os.path.dirname(__file__)
    eval_yml = os.path.join(here, "..", "examples", "iccv19", "eval.yml")
    script = os.path.join(here, "..", "examples", "iccv19", "eval.py")
    env = dict(os.environ, MDIR_TPU_SKIP_DOWNLOAD="1", JAX_PLATFORMS="cpu",
               MDIR_TPU_ROOT=str(full_root))
    result = subprocess.run(
        [sys.executable, script, eval_yml, str(override_path)],
        capture_output=True, text=True, env=env, timeout=1800)
    assert result.returncode == 0, result.stderr[-3000:]

    got = {}
    for line in result.stdout.splitlines():
        match = re.match(r"\s+(\S.*\S)\s+([0-9.]+)$", line)
        if match:
            got[match.group(1)] = float(match.group(2))
    for key in ("roxford.5k medium", "rparis.6k medium", "247tokyo.1k"):
        assert key in got, (key, result.stdout[-2000:])
        assert 0.0 <= got[key] <= 100.0


@pytest.fixture(scope="module")
def composition_checkpoint(full_root):
    """Translator (pixel mapper) -> AlexNet-GeM embedder, saved in the
    Checkpoints directory layout (the eval_composition.yml artifact shape)."""
    from mdir_tpu.learning.checkpoints import save_state
    from mdir_tpu.learning.network import (CirNetwork, SequentialNetwork,
                                           SingleNetwork)
    from mdir_tpu.models import initialize_model

    t_params = {"architecture": "pixelconv_regr", "in_channels": 3,
                "out_channels": 3, "hidden": [8]}
    translator = SingleNetwork(
        initialize_model(dict(t_params)),
        SingleNetwork.NetworkParams(
            model=t_params,
            runtime={"wrappers": "",
                     "data": {"mean_std": [[0.5] * 3, [0.5] * 3],
                              "transforms": "pil2np | totensor | normalize"}}))
    e_params = {"architecture": "cirnet", "cir_architecture": "alexnet",
                "local_whitening": False, "pooling": "gem",
                "regional": False, "whitening": False, "pretrained": False}
    embedder = CirNetwork(
        initialize_model(dict(e_params)),
        CirNetwork.NetworkParams(model=e_params, runtime={"wrappers": ""}))
    net = SequentialNetwork({"translate": translator, "embed": embedder},
                            ["translate", "embed"])

    ckpt_dir = full_root / "composition" / "epochs"
    ckpt_dir.mkdir(parents=True)
    state = net.state_dict()
    state["net"]["_network_names"] = [k for k in state if k != "net"]
    for key, sub in state.items():
        save_state(sub, ckpt_dir / (key + "_best.ckpt"))
    return str(ckpt_dir)


def test_eval_cli_composition_stack(full_root, composition_checkpoint,
                                    clahe_checkpoint, tmp_path):
    """The eval_composition.yml shape through the CLI: a SequentialNetwork
    checkpoint + cirwhiten/multiscale wrappers over the 3 datasets, riding
    the fused composed extraction path."""
    import yaml

    _, whit_path = clahe_checkpoint
    override = {
        "network": {
            "path": composition_checkpoint,
            "runtime": {"wrappers": {
                "train": None,
                "eval": {"0_cirwhiten": {"whitening": whit_path,
                                         "dimensions": None},
                         "1_cirmultiscale": {"scales": True}}}},
        },
        "validation": {name: {"criterion": {"image_size": 96}}
                       for name in ("roxford5k", "rparis6k", "247tokyo1k")},
    }
    override_path = tmp_path / "local_composition.yml"
    with open(override_path, "w") as handle:
        yaml.safe_dump(override, handle)

    here = os.path.dirname(__file__)
    eval_yml = os.path.join(here, "..", "examples", "iccv19", "eval.yml")
    script = os.path.join(here, "..", "examples", "iccv19", "eval.py")
    env = dict(os.environ, MDIR_TPU_SKIP_DOWNLOAD="1", JAX_PLATFORMS="cpu",
               MDIR_TPU_ROOT=str(full_root))
    result = subprocess.run(
        [sys.executable, script, eval_yml, str(override_path)],
        capture_output=True, text=True, env=env, timeout=1800)
    assert result.returncode == 0, result.stderr[-3000:]
    for key in ("roxford.5k medium", "rparis.6k medium", "247tokyo.1k"):
        assert key in result.stdout, result.stdout[-2000:]
