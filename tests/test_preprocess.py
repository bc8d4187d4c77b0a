"""In-graph preprocessing chain vs the exact host transform chain."""
import numpy as np
import pytest

import jax.numpy as jnp

from mdir_tpu.data.transforms import initialize_transforms
from mdir_tpu.ops.preprocess import make_device_preprocess, supports_chain

cv2 = pytest.importorskip("cv2")

MEAN = [0.485, 0.456, 0.406]
STD = [0.229, 0.224, 0.225]


def _host_chain(chain, batch_u8, mean_std):
    transform = initialize_transforms(chain, mean_std)
    return np.stack([transform(img.astype(np.float32) / 255.0)
                     for img in batch_u8])


def test_plain_chain_bit_equal(rng):
    batch = (rng.rand(2, 64, 96, 3) * 255).astype(np.uint8)
    fn = make_device_preprocess("pil2np | totensor | normalize", [MEAN, STD])
    ref = _host_chain("totensor | normalize", batch, [MEAN, STD])
    out = np.asarray(fn(jnp.asarray(batch)))
    np.testing.assert_allclose(ref, out, rtol=1e-5, atol=1e-6)


def test_clahe_chain_near_exact(rng):
    batch = (rng.rand(2, 64, 96, 3) * 255).astype(np.uint8)
    fn = make_device_preprocess("pil2np | apply_clahe | totensor | normalize",
                                [MEAN, STD])
    ref = _host_chain("apply_clahe | totensor | normalize", batch, [MEAN, STD])
    out = np.asarray(fn(jnp.asarray(batch)))
    err = np.abs(ref - out)
    # The ~1e-3 colorspace delta flips (L*255) uint8 bins on isolated pixels,
    # amplified by the LUT slope: rare pixels differ by a few /255 steps
    # (normalized units divide by std ~0.22). Mean error stays ~0.5%.
    assert err.max() < 0.5, err.max()
    assert err.mean() < 0.05, err.mean()
    assert (err > 0.1).mean() < 0.02  # only isolated bin-flip pixels


def test_add_clahe_chain(rng):
    batch = (rng.rand(2, 64, 96, 3) * 255).astype(np.uint8)
    mean4, std4 = MEAN + [0.5], STD + [0.25]
    fn = make_device_preprocess(
        "pil2np | add_clahe_fromrgb | totensor | normalize", [mean4, std4])
    ref = _host_chain("add_clahe_fromrgb | totensor | normalize",
                      batch, [mean4, std4])
    out = np.asarray(fn(jnp.asarray(batch)))
    assert out.shape == ref.shape == (2, 64, 96, 4)
    err = np.abs(ref - out)
    assert err.max() < 0.5 and err.mean() < 0.05


def test_tospace_chain(rng):
    batch = (rng.rand(2, 32, 48, 3) * 255).astype(np.uint8)
    fn = make_device_preprocess("pil2np | tospace:lab | totensor | normalize",
                                [MEAN, STD])
    ref = _host_chain("tospace:lab | totensor | normalize", batch, [MEAN, STD])
    out = np.asarray(fn(jnp.asarray(batch)))
    assert np.abs(ref - out).max() < 0.05


def test_supports_chain():
    assert supports_chain("pil2np | apply_clahe | totensor | normalize")
    assert not supports_chain("pil2np | mirror | totensor | normalize")
    assert not supports_chain("pil2np | totensor")


def test_bucketed_chain_fuzz_vs_host():
    """Fuzz the production device chain against the host transform chain
    across shapes, clip limits, grids, and colorspaces."""
    import jax.numpy as jnp

    from mdir_tpu.data.transforms import initialize_transforms
    from mdir_tpu.learning.train_step import pad_image_batch
    from mdir_tpu.ops.clahe import clahe_bucket_aux
    from mdir_tpu.ops.preprocess import chain_from_transform, \
        make_bucketed_chain

    rng = np.random.RandomState(5)
    # (chain, channels, mean tol, frac(|diff|>0.05) tol) — LUV's u/v
    # channels divide by L and amplify ~1e-3 colorspace deltas on
    # near-black pixels, so its outlier budget is wider
    cases = [
        ("pil2np | apply_clahe:3:lab:8 | totensor | normalize", 3, 3e-3, 1e-3),
        ("pil2np | apply_clahe:4:luv:4 | totensor | normalize", 3, 6e-3, 5e-3),
        ("pil2np | add_clahe_fromrgb:2:16:lab | totensor | normalize", 4,
         3e-3, 1e-3),
        ("pil2np | totensor | normalize", 3, 1e-6, 0.0),
    ]
    for chain_str, channels, mean_tol, frac_tol in cases:
        mean_std = [[0.45] * channels, [0.25] * channels]
        transform = initialize_transforms(chain_str, mean_std)
        chain = chain_from_transform(transform)
        assert chain is not None, chain_str
        fn = make_bucketed_chain(chain)

        imgs = [(rng.rand(40 + rng.randint(60), 40 + rng.randint(60), 3)
                 * 255).astype(np.uint8) for _ in range(3)]
        raw = [chain.host_input(im) for im in imgs]
        batch, valid = pad_image_batch(raw, multiple=16)
        aux = None
        if chain.clahe_params:
            clip, grid = chain.clahe_params
            aux = {k: jnp.asarray(v) for k, v in clahe_bucket_aux(
                [tuple(v) for v in valid], batch.shape[1:3],
                clip_limit=clip, grid=grid).items()}
        out = np.asarray(fn(jnp.asarray(batch), aux))

        from PIL import Image

        for i, im in enumerate(imgs):
            host = transform(Image.fromarray(im))
            h, w = im.shape[:2]
            diff = np.abs(np.asarray(host) - out[i, :h, :w])
            assert diff.mean() < mean_tol, (chain_str, i, diff.mean())
            assert (diff > 0.05).mean() <= frac_tol, (chain_str, i, diff.max())


def test_chain_from_transform_reject_matrix():
    """chain_from_transform accepts exactly the device-lowerable chains and
    returns None (host path) for everything else."""
    from mdir_tpu.data.transforms import initialize_transforms
    from mdir_tpu.ops.preprocess import chain_from_transform

    mean_std = [[0.5] * 3, [0.5] * 3]

    def chain_of(dsl):
        return chain_from_transform(initialize_transforms(dsl, mean_std))

    # accepted: photometrics ending in one strict normalize
    assert chain_of("pil2np | apply_clahe | totensor | normalize") is not None
    assert chain_of("pil2np | tospace:lab | totensor | normalize") is not None

    # rejected: geometry/augmentation, gray (channel-count change),
    # missing or non-final normalize, empty
    assert chain_of("pil2np | mirror | totensor | normalize") is None
    assert chain_of("pil2np | tospace:gray | totensor | normalize") is None
    assert chain_of("pil2np | totensor") is None
    assert chain_of("") is None
    assert chain_from_transform(object()) is None


def test_tospace_before_clahe_does_not_lower():
    """A host chain that converts colorspace BEFORE CLAHE must stay on the
    host: the device CLAHE plane derives from the raw ingress RGB, so
    lowering that ordering would silently produce device != host outputs."""
    from mdir_tpu.data.transforms import initialize_transforms
    from mdir_tpu.ops.preprocess import chain_from_transform

    mean_std = [[0.5] * 3, [0.5] * 3]
    lowers = chain_from_transform(initialize_transforms(
        "pil2np | apply_clahe | totensor | normalize", mean_std))
    assert lowers is not None

    for dsl in ("pil2np | tospace:lab | apply_clahe | totensor | normalize",
                "pil2np | tospace:lab | add_clahe_fromrgb | totensor "
                "| normalize"):
        assert chain_from_transform(
            initialize_transforms(dsl, mean_std)) is None, dsl
