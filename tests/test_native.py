"""Native C CLAHE extension: bit-exact with the numpy reference and cv2."""
import subprocess
import sys
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def native():
    from mdir_tpu.ops import clahe

    if clahe._mdir_native is None:
        root = os.path.join(os.path.dirname(__file__), "..")
        build = subprocess.run(
            [sys.executable, os.path.join(root, "csrc", "setup.py"),
             "build_ext", "--inplace"],
            cwd=root, capture_output=True)
        if build.returncode != 0:
            pytest.skip("no C toolchain: %s" % build.stderr[-200:])
        import importlib

        import _mdir_native

        clahe._mdir_native = _mdir_native
    return clahe


@pytest.mark.parametrize("shape", [(64, 64), (100, 130), (37, 53), (256, 333)])
@pytest.mark.parametrize("clip", [4, 2, 40])
def test_native_matches_numpy(native, rng, shape, clip):
    src = (rng.rand(*shape) * 255).astype(np.uint8)
    ref = native._clahe_u8_numpy(src, clip_limit=clip)
    out = native.clahe_u8_native(src, clip_limit=clip)
    np.testing.assert_array_equal(ref, out)


def test_native_other_grid(native, rng):
    src = (rng.rand(120, 77) * 255).astype(np.uint8)
    ref = native._clahe_u8_numpy(src, clip_limit=3, grid=(6, 4))
    out = native.clahe_u8_native(src, clip_limit=3, grid=(6, 4))
    np.testing.assert_array_equal(ref, out)
