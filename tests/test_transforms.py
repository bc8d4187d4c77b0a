"""Transform DSL and per-transform semantics (HWC host chain)."""
import numpy as np
import pytest

from mdir_tpu.data import transforms as T

cv2 = pytest.importorskip("cv2")


@pytest.fixture
def img(rng):
    return rng.rand(40, 50, 3).astype(np.float32)


def test_dsl_parsing():
    compose = T.initialize_transforms(
        "pil2np | apply_clahe | totensor | normalize",
        [[0.5, 0.5, 0.5], [0.2, 0.2, 0.2]])
    kinds = [type(t).__name__ for t in compose.transforms]
    assert kinds == ["Pil2Numpy", "ApplyClahe", "ToTensor", "Normalize"]


def test_dsl_args():
    compose = T.initialize_transforms("downscale:256 | gaussian_noise:0.1", [[], []])
    assert compose.transforms[0].params["size"] == 256
    assert compose.transforms[1].params["sigma"] == 0.1


def test_normalize_strict_and_loose(img):
    strict = T.Normalize([0.5] * 3, [0.2] * 3)
    out = strict(img)[0]
    np.testing.assert_allclose(out, (img - 0.5) / 0.2, rtol=1e-6)

    loose = T.Normalize([0.5] * 4, [0.2] * 4, strict_shape="false")
    assert loose(img)[0].shape == img.shape
    with pytest.raises(AssertionError):
        strict(np.concatenate([img, img[..., :1]], axis=2))


def test_pil2np_and_totensor(rng):
    from PIL import Image

    arr = (rng.rand(20, 30, 3) * 255).astype(np.uint8)
    pil = Image.fromarray(arr)
    out = T.Pil2Numpy()(pil)[0]
    np.testing.assert_allclose(out, arr.astype(np.float32) / 255)
    out2 = T.ToTensor()(pil)[0]
    np.testing.assert_allclose(out2, out)


def test_multi_image_consistency(img):
    """One transform applies consistently to all tuple members."""
    flip = T.RandomHorizontalFlip(p=1.0)
    a, b = flip(img, img + 1)
    np.testing.assert_allclose(a, np.flip(img, axis=1))
    np.testing.assert_allclose(b, np.flip(img + 1, axis=1))


def test_apply_clahe_matches_reference_composition(img):
    """ApplyClahe == cv2 colorspace -> bit-exact CLAHE on L -> back."""
    ours = T.ApplyClahe(clip_limit=4, colorspace="lab", grid_size=8)(img)[0]

    spc = (cv2.cvtColor(img, cv2.COLOR_RGB2LAB)
           + np.array([0, 128, 128], np.float32)) / np.array(
               [100.0, 255.0, 255.0], np.float32)
    clahe = cv2.createCLAHE(clipLimit=4, tileGridSize=(8, 8))
    spc[:, :, 0] = clahe.apply(
        (spc[:, :, 0] * 255).astype(np.uint8)).astype(np.float32) / 255.0
    ref = cv2.cvtColor(
        (spc * np.array([100.0, 255.0, 255.0], np.float32))
        - np.array([0, 128, 128], np.float32), cv2.COLOR_LAB2RGB)
    np.testing.assert_allclose(ref, ours, atol=1e-6)


def test_add_clahe_fromrgb_appends_channel(img):
    out = T.AddClaheFromRgb()(img)[0]
    assert out.shape == (40, 50, 4)
    np.testing.assert_array_equal(out[..., :3], img)


def test_create_clahed_pair(img):
    orig, clahed = T.CreateClahedImage()(img)
    assert orig.shape == clahed.shape == img.shape
    np.testing.assert_array_equal(orig, img)


def test_channel_transforms(img):
    out = T.AddConstantChannel(0.7)(img)[0]
    assert out.shape[-1] == 4 and (out[..., 3] == np.float32(0.7)).all()

    sel = T.NpChanSelector(1, 3)(out)[0]
    np.testing.assert_array_equal(sel, out[..., 1:3])

    clone = T.NpCloneChannels(0, 2)(img)[0]
    assert clone.shape[-1] == 5
    np.testing.assert_array_equal(clone[..., 3:], img[..., 0:2])

    inv = T.NpInvertChannel(0)(img.copy())[0]
    np.testing.assert_allclose(inv[..., 0], 1 - img[..., 0], rtol=1e-6)


def test_tospace_gray(img):
    out = T.ToColorspace("gray")(img)[0]
    assert out.shape == (40, 50, 1)
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    np.testing.assert_allclose(out[..., 0], ref, atol=1e-6)


def test_center_crop(img):
    out = T.CenterCrop("30_20")(img)[0]
    assert out.shape == (20, 30, 3)


def test_random_scale_crop_skip(img):
    t = T.RandomScaleCrop("50_40")
    out = t(img)
    assert out[0].shape == img.shape  # exact-size skip


def test_gamma_equalize(img):
    out = T.GammaEqualize(0.5)(img)[0]
    spc = T.rgb2normspace_np(out, "lab")
    assert abs(float(spc[:, :, 0].mean()) - 0.5) < 0.02


def test_match_histogram(img):
    out = T.MatchHistogram("f3d_lab")(img)[0]
    assert out.shape == img.shape and np.isfinite(out).all()


def test_replace_histogram_modes(rng):
    img4 = rng.rand(16, 16, 4).astype(np.float32)
    gt4 = rng.rand(16, 16, 4).astype(np.float32)
    tr = T.ReplaceChannelWithHistogram("f3d_lab", "replace")
    out_train = tr(img4, gt4)
    assert out_train[0].shape == (16, 16, 4) and out_train[1].shape == (16, 16, 3)
    out_test = tr(img4)
    assert out_test[0].shape == (16, 16, 4)


def test_nan_check(img):
    T.NanCheck()(img)
    bad = img.copy()
    bad[0, 0, 0] = np.nan
    with pytest.raises(ValueError):
        T.NanCheck()(bad)


def test_stack_batch(img):
    out = T.StackBatch()(img, img)[0]
    assert out.shape == (40, 50, 6)


def test_transforms_dsl_all_keys_constructible(img):
    """Every TRANSFORMS DSL key parses through initialize_transforms with a
    representative argument string and runs on an image — catches
    factory arg-wiring crashes across the whole registry (same insurance
    the model-registry sweep provides; reference DSL:
    mdir/components/data/transform/__init__.py)."""
    from PIL import Image

    dsl_args = {
        "normalize": "",            # mean_std injected by the initializer
        "random_crop": ":8",
        "center_crop": ":8",
        "downscale": ":2",
        "scalecrop": ":50_40",
        "gaussian_noise": ":0.01",
        "add_const": ":0.5",
        "tospace": ":lab",
        "np_invert_chan": ":0",
        "np_chanselect": ":0:2",
        "np_chanclone": ":0:2",
        "add_clahe_fromrgb": ":2:8",
        "apply_clahe": ":2:lab:8",
        "create_clahed": ":2:lab:8",
        "replace_histogram": ":f3d_lab:append",
        "match_histogram": ":f3d_lab",
        "gamma_equalize": ":0.5",
        "pil2np": "",
    }
    pil_first = {"pil2np"}
    uint8_like = (img * 255).astype(np.uint8)
    for key in T.TRANSFORMS:
        if key == "add_edgesdollar_fromrgb":
            continue  # gated on an external edges model artifact
        dsl = key + dsl_args.get(key, "")
        compose = T.initialize_transforms(dsl, [[0.5] * 3, [0.5] * 3])
        if key in pil_first:
            inp = Image.fromarray(uint8_like)
        elif key == "totensor":
            inp = img
        elif key == "stackbatch":
            inp = img
        else:
            inp = img
        out = compose(inp)
        assert out is not None, key


def test_histogram_jax_variants_match_numpy(rng):
    """The in-graph JAX histogram ops must match the host numpy
    implementations (they exist so future device chains can fuse
    histogram photometrics; parity is their contract)."""
    from mdir_tpu.ops import histogram as H

    chan = rng.rand(64, 64).astype(np.float32)
    ref = rng.rand(64, 64).astype(np.float32)

    # jnp.interp runs f32 (numpy interps in f64): ~1e-4 abs rounding
    for name in ("f3d_lab", "eq"):
        np.testing.assert_allclose(
            np.asarray(H.channel_histogram_matching_jax(chan, name)),
            H.channel_histogram_matching(chan, name), rtol=1e-4, atol=2e-4)

    np.testing.assert_allclose(
        np.asarray(H.channel2channel_histogram_matching_jax(chan, ref)),
        H.channel2channel_histogram_matching(chan, ref),
        rtol=1e-4, atol=2e-4)

    # gamma: fixed-iteration Newton vs the scipy host solver (1e-4 tol)
    out_jax = np.asarray(H.channel_gamma_matching_jax(chan, 0.3))
    out_np = H.channel_gamma_matching(chan, 0.3)
    assert abs(out_jax.mean() - 0.3) < 1e-3
    np.testing.assert_allclose(out_jax, out_np, rtol=5e-3, atol=5e-4)
