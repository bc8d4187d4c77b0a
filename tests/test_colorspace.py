"""Colorspace parity: JAX conversions vs cv2 float semantics."""
import numpy as np
import pytest

from mdir_tpu.ops import colorspace

cv2 = pytest.importorskip("cv2")


@pytest.fixture
def img(rng):
    return rng.rand(16, 20, 3).astype(np.float32)


def test_rgb_to_lab(img):
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2LAB)
    ours = np.asarray(colorspace.rgb_to_lab(img))
    # cv2's float Lab path is internally LUT-quantized (~1/128 steps); the
    # JAX in-graph path matches to ~0.4 on the 0-100 / +-128 scales. The host
    # pipeline calls cv2 directly, so eval parity is exact by construction.
    assert np.abs(ref - ours).max() < 0.5


def test_rgb_to_luv(img):
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2LUV)
    ours = np.asarray(colorspace.rgb_to_luv(img))
    assert np.abs(ref - ours).max() < 0.5


def test_rgb_to_hls(img):
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2HLS)
    ours = np.asarray(colorspace.rgb_to_hls(img))
    assert np.abs(ref - ours).max() < 1e-4


def test_rgb_to_gray(img):
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    ours = np.asarray(colorspace.rgb_to_gray(img))
    assert np.abs(ref - ours).max() < 1e-5


def test_lab_roundtrip(img):
    lab = colorspace.rgb_to_lab(img)
    back = np.asarray(colorspace.lab_to_rgb(lab))
    assert np.abs(back - img).max() < 6e-3


def test_luv_roundtrip(img):
    luv = colorspace.rgb_to_luv(img)
    back = np.asarray(colorspace.luv_to_rgb(luv))
    assert np.abs(back - img).max() < 6e-3


def test_hls_roundtrip(img):
    hls = colorspace.rgb_to_hls(img)
    back = np.asarray(colorspace.hls_to_rgb(hls))
    assert np.abs(back - img).max() < 1e-4


@pytest.mark.parametrize("space", ["lab", "luv", "lsh", "gray"])
def test_normspace_range(img, space):
    """Reference normalization constants put values (mostly) in [0, 1]."""
    out = np.asarray(colorspace.rgb2normspace(img, space))
    assert out.min() > -0.05 and out.max() < 1.05
    if space == "gray":
        assert out.shape == img.shape[:2] + (1,)


@pytest.mark.parametrize("space", ["lab", "luv"])
def test_normspace_matches_reference_formula(img, space):
    """rgb2normspace == (cv2_convert + shift) / scale (functional.py:24-34)."""
    if space == "lab":
        ref = (cv2.cvtColor(img, cv2.COLOR_RGB2LAB)
               + np.array([0, 128, 128], np.float32)) / np.array(
                   [100.0, 255.0, 255.0], np.float32)
    else:
        ref = (cv2.cvtColor(img, cv2.COLOR_RGB2LUV)
               + np.array([0, 134, 140], np.float32)) / np.array(
                   [100.0, 354.0, 262.0], np.float32)
    ours = np.asarray(colorspace.rgb2normspace(img, space))
    assert np.abs(ref - ours).max() < 3e-3
