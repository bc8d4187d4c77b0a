"""Real-artifact acceptance runs for the three published scenarios.

The north star: ``./eval.py test`` must reproduce the published triple
39.06 ROxf(M) / 58.94 RPar(M) / 72.0 Tokyo within 0.1 mAP (reference
``mdir/examples/iccv19/eval_test.yml:4``, ``README.md:29-41``). The other
two published workloads — ``clahe`` (VGG16 "CLAHE N/D",
``eval_clahe.yml:1-11``) and ``composition`` (U-Net jointly N/D,
``eval_composition.yml:1-11``) — have no expected scores recorded in the
reference repo (they live in the ICCV19 paper, Jenicek & Chum Table 2);
their tests gate on conservative floors (well below the paper's values but
far above a broken pipeline: the plain cirtorch VGG16-GeM baseline already
scores 60.9 ROxf(M) / 69.3 RPar(M)) and accept an exact pin via
``MDIR_TPU_EXPECTED_CLAHE`` / ``MDIR_TPU_EXPECTED_COMPOSITION``
("roxford,rparis,tokyo" triples, checked +-0.1) once transcribed from the
paper by someone who can verify them.

Zero-egress environments stage the artifacts offline: set
``MDIR_TPU_ARTIFACTS`` to a directory containing the model/whitening files
and the dataset archives/gnd pkls (docs/ACCEPTANCE.md has the one-command
wget list); every fetch consults it before the network
(``tools/utils.py::staged_artifact``). The moment artifacts land, these
tests produce all three published workloads' triples.
"""
import os
import re
import subprocess
import sys

import pytest

SCORE_KEYS = ("roxford.5k medium", "rparis.6k medium", "247tokyo.1k")

SCENARIOS = {
    "test": {
        "artifacts": ("alex_clahe_sfmnd0.25-4142b192.pth",
                      "alex_clahe_sfmnd0.25-whit-87d5d095.pkl"),
        # in-repo published triple: eval_test.yml:4 / README.md:39-41
        "expected": {"roxford.5k medium": 39.06, "rparis.6k medium": 58.94,
                     "247tokyo.1k": 72.0},
        "floors": None,
    },
    "clahe": {
        "artifacts": ("vgg_clahe_sfmnd0.25-85f6ced3.pth",
                      "vgg_clahe_sfmnd0.25-lw-d706adc9.pkl"),
        "expected_env": "MDIR_TPU_EXPECTED_CLAHE",
        # floors: VGG16-GeM + Lw baseline is 60.9/69.3 (cirtorch README);
        # the paper's CLAHE N/D model must not score below these margins
        "floors": {"roxford.5k medium": 55.0, "rparis.6k medium": 63.0,
                   "247tokyo.1k": 75.0},
    },
    "composition": {
        "artifacts": ("vgg_unet_jointly_sfmnd0.25-88869e65.pth",
                      "vgg_unet_jointly_sfmnd0.25-lw-2a505744.pkl"),
        "expected_env": "MDIR_TPU_EXPECTED_COMPOSITION",
        "floors": {"roxford.5k medium": 50.0, "rparis.6k medium": 60.0,
                   "247tokyo.1k": 75.0},
    },
}


def _staged(scenario):
    root = os.environ.get("MDIR_TPU_ARTIFACTS")
    return bool(root) and all(
        os.path.exists(os.path.join(root, f))
        for f in SCENARIOS[scenario]["artifacts"])


def _run_scenario(shortcut, extra_env=None):
    here = os.path.dirname(__file__)
    script = os.path.join(here, "..", "examples", "iccv19", "eval.py")
    env = dict(os.environ)
    env.pop("MDIR_TPU_SKIP_DOWNLOAD", None)
    env.update(extra_env or {})
    result = subprocess.run([sys.executable, script, shortcut],
                            capture_output=True, text=True, env=env,
                            timeout=3 * 3600)
    assert result.returncode == 0, result.stderr[-4000:]

    got = {}
    for line in result.stdout.splitlines():
        match = re.match(r"\s+(\S.*\S)\s+([0-9.]+)$", line)
        if match and match.group(1) in SCORE_KEYS:
            got[match.group(1)] = float(match.group(2))
    assert set(got) == set(SCORE_KEYS), result.stdout[-2000:]
    return got


def _check_scores(scenario, got):
    spec = SCENARIOS[scenario]
    expected = spec.get("expected")
    if expected is None and spec.get("expected_env"):
        pinned = os.environ.get(spec["expected_env"])
        if pinned:
            expected = dict(zip(SCORE_KEYS,
                                (float(x) for x in pinned.split(","))))
    print("acceptance[%s]: %s" % (scenario, got))
    if expected is not None:
        for key, value in expected.items():
            assert abs(got[key] - value) <= 0.1, (key, got[key], value)
    else:
        for key, floor in spec["floors"].items():
            assert got[key] >= floor, (key, got[key], floor)


@pytest.mark.skipif(not _staged("test"),
                    reason="real artifacts not staged (set MDIR_TPU_ARTIFACTS "
                           "to a dir with the alexnet model + whitening)")
def test_eval_test_acceptance_triple():
    _check_scores("test", _run_scenario("test"))


@pytest.mark.skipif(not _staged("test"),
                    reason="real artifacts not staged")
def test_eval_test_device_chain_parity():
    """The production device photometric chain (CLAHE + bit-exact RGB->lab
    on chip) must reproduce the host-cv2 path's real-artifact triple
    exactly — the strongest possible check that the device chain does not
    move real mAP."""
    host = _run_scenario("test", {"MDIR_TPU_DEVICE_PREPROCESS": "0"})
    device = _run_scenario("test", {"MDIR_TPU_DEVICE_PREPROCESS": "1"})
    assert host == device, (host, device)
    _check_scores("test", device)


@pytest.mark.skipif(not _staged("clahe"),
                    reason="real artifacts not staged (set MDIR_TPU_ARTIFACTS "
                           "to a dir with the VGG clahe model + whitening)")
def test_eval_clahe_acceptance_triple():
    _check_scores("clahe", _run_scenario("clahe"))


@pytest.mark.skipif(not _staged("composition"),
                    reason="real artifacts not staged (set MDIR_TPU_ARTIFACTS "
                           "to a dir with the VGG U-Net model + whitening)")
def test_eval_composition_acceptance_triple():
    _check_scores("composition", _run_scenario("composition"))
