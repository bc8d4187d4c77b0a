"""The real-artifact acceptance run: ``./eval.py test`` must reproduce the
published triple 39.06 ROxf(M) / 58.94 RPar(M) / 72.0 Tokyo within 0.1 mAP
(reference ``mdir/examples/iccv19/eval_test.yml:4``, ``README.md:29-41``).

Zero-egress environments stage the artifacts offline: set
``MDIR_TPU_ARTIFACTS`` to a directory containing the model/whitening files
(``alex_clahe_sfmnd0.25-4142b192.pth``, ``alex_clahe_sfmnd0.25-whit-87d5d095.pkl``)
and the dataset archives/gnd pkls; every fetch consults it before the
network (``tools/utils.py::staged_artifact``). The moment artifacts land,
this one test produces the triple.
"""
import os
import re
import subprocess
import sys

import pytest

MODEL = "alex_clahe_sfmnd0.25-4142b192.pth"
WHITENING = "alex_clahe_sfmnd0.25-whit-87d5d095.pkl"
EXPECTED = {"roxford.5k medium": 39.06, "rparis.6k medium": 58.94,
            "247tokyo.1k": 72.0}


def _artifacts_staged():
    root = os.environ.get("MDIR_TPU_ARTIFACTS")
    return bool(root) and all(os.path.exists(os.path.join(root, f))
                              for f in (MODEL, WHITENING))


@pytest.mark.skipif(not _artifacts_staged(),
                    reason="real artifacts not staged (set MDIR_TPU_ARTIFACTS "
                           "to a dir with the model + whitening files)")
def test_eval_test_acceptance_triple():
    here = os.path.dirname(__file__)
    script = os.path.join(here, "..", "examples", "iccv19", "eval.py")
    env = dict(os.environ)
    env.pop("MDIR_TPU_SKIP_DOWNLOAD", None)
    result = subprocess.run([sys.executable, script, "test"],
                            capture_output=True, text=True, env=env,
                            timeout=3 * 3600)
    assert result.returncode == 0, result.stderr[-4000:]

    got = {}
    for line in result.stdout.splitlines():
        match = re.match(r"\s+(\S.*\S)\s+([0-9.]+)$", line)
        if match and match.group(1) in EXPECTED:
            got[match.group(1)] = float(match.group(2))
    assert set(got) == set(EXPECTED), result.stdout[-2000:]
    for key, expected in EXPECTED.items():
        assert abs(got[key] - expected) <= 0.1, (key, got[key], expected)
