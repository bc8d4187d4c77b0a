"""CLAHE parity: numpy and JAX implementations vs cv2 (bit-exact)."""
import numpy as np
import pytest

from mdir_tpu.ops import clahe

cv2 = pytest.importorskip("cv2")

SHAPES = [(64, 64), (100, 130), (37, 53), (256, 333), (513, 700), (9, 17)]


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("clip", [4, 2, 40])
def test_clahe_np_matches_cv2(rng, shape, clip):
    src = (rng.rand(*shape) * 255).astype(np.uint8)
    ref = cv2.createCLAHE(clipLimit=clip, tileGridSize=(8, 8)).apply(src)
    ours = clahe.clahe_u8_np(src, clip_limit=clip)
    np.testing.assert_array_equal(ref, ours)


@pytest.mark.parametrize("shape", [(64, 64), (100, 130), (256, 333)])
def test_clahe_jax_matches_cv2(rng, shape):
    src = (rng.rand(*shape) * 255).astype(np.uint8)
    ref = cv2.createCLAHE(clipLimit=4, tileGridSize=(8, 8)).apply(src)
    ours = np.asarray(clahe.clahe_u8_jax(src))
    # XLA fuses the interpolation mul-adds (FMA), which can flip a
    # round-half-even boundary: allow off-by-1 on <0.1% of pixels.
    diff = np.abs(ref.astype(int) - ours.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-3


def test_clahe_channel_roundtrip(rng):
    chan = rng.rand(96, 128).astype(np.float32)
    ref = cv2.createCLAHE(clipLimit=4, tileGridSize=(8, 8)).apply(
        (chan * 255).astype(np.uint8)).astype(np.float32) / 255.0
    np.testing.assert_array_equal(ref, clahe.clahe_channel_np(chan))
    # jax path: reciprocal-multiply division (1 ulp) plus rare FMA-fused
    # rounding flips (1/255 on <0.1% of pixels)
    jax_out = np.asarray(clahe.clahe_channel_jax(chan))
    diff = np.abs(ref - jax_out)
    assert diff.max() <= 1.0 / 255 + 1e-6
    assert (diff > 1e-6).mean() < 1e-3


def test_clahe_other_grid(rng):
    src = (rng.rand(120, 77) * 255).astype(np.uint8)
    ref = cv2.createCLAHE(clipLimit=3, tileGridSize=(4, 6)).apply(src)
    # cv2 tileGridSize is (cols, rows); ours is (rows, cols)
    ours = clahe.clahe_u8_np(src, clip_limit=3, grid=(6, 4))
    np.testing.assert_array_equal(ref, ours)


def test_bucketed_clahe_bit_exact():
    """Valid-extent bucketed CLAHE (padded batch, host tile maps + device MXU
    histograms) is bit-exact with the cv2-exact host kernel at every image's
    true size — including cv2's both-dims padding rule when either dim is
    non-divisible (a divisible dim gains a full extra tile)."""
    import jax.numpy as jnp

    from mdir_tpu.ops.clahe import (clahe_bucket_aux, clahe_u8_bucketed_jax,
                                    clahe_u8_np)

    rng = np.random.RandomState(3)
    shapes = [(57, 43), (64, 64), (100, 91), (33, 120), (128, 77), (96, 128)]
    bh, bw = 128, 128
    batch = np.zeros((len(shapes), bh, bw), np.int32)
    imgs = []
    for i, (h, w) in enumerate(shapes):
        img = rng.randint(0, 256, (h, w)).astype(np.uint8)
        imgs.append(img)
        batch[i, :h, :w] = img
    for clip in (2.5, 4.0, 40.0):
        aux = clahe_bucket_aux(shapes, (bh, bw), clip_limit=clip, grid=(8, 8))
        out = np.asarray(clahe_u8_bucketed_jax(
            jnp.asarray(batch), {k: jnp.asarray(v) for k, v in aux.items()}))
        for i, (h, w) in enumerate(shapes):
            ref = clahe_u8_np(imgs[i], clip, (8, 8))
            np.testing.assert_array_equal(out[i, :h, :w].astype(np.uint8), ref)


def test_bucketed_clahe_small_buckets_cpu():
    """Sub-64px buckets must run (and stay bit-exact) on CPU.

    Regression: CPU XLA has no bf16 x bf16 = f32 DotThunk at some small
    contraction shapes — the bucketed kernels crashed for bucket sides
    32-48 (passing at >= 64, which is why the 64-multiple bucket tests
    never caught it) when the hist/interp one-hot contractions went bf16
    unconditionally. All contractions now stay f32 + HIGHEST on CPU; the
    dryrun's 32px device-chain train step exercises this path too."""
    import jax.numpy as jnp

    from mdir_tpu.ops.clahe import (clahe_bucket_aux, clahe_u8_bucketed_jax,
                                    clahe_u8_np)

    rng = np.random.RandomState(5)
    for side in (32, 40, 48):
        shapes = [(side, side), (side - 8, side - 4)]
        batch = np.zeros((2, side, side), np.int32)
        imgs = []
        for i, (h, w) in enumerate(shapes):
            img = rng.randint(0, 256, (h, w)).astype(np.uint8)
            imgs.append(img)
            batch[i, :h, :w] = img
        aux = clahe_bucket_aux(shapes, (side, side), clip_limit=2.0,
                               grid=(8, 8))
        out = np.asarray(clahe_u8_bucketed_jax(
            jnp.asarray(batch), {k: jnp.asarray(v) for k, v in aux.items()}))
        for i, (h, w) in enumerate(shapes):
            ref = clahe_u8_np(imgs[i], 2.0, (8, 8))
            np.testing.assert_array_equal(out[i, :h, :w].astype(np.uint8),
                                          ref)
