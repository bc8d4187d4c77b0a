"""Device-computed CLAHE input plane (ops/lab_trilinear.py).

cv2's float RGB2LAB runs a fixed-point trilinear pipeline (LAB_BASE = 2^14);
the device replica was verified exhaustively over all 256^3 RGB triples
offline (zero mismatches) — these tests pin the machinery against the live
cv2 on dense samples, pin the JAX kernel bit-exact against the numpy
replica, and pin that the device-L chain equals the ship-L chain program
output bit for bit.

Reference semantics: mdir/components/data/transform/
photometric_transforms.py:28-36, functional.py:109-129 (the CLAHE family
feeds cv2 CLAHE with the u8-quantized colorspace L plane).
"""
import os

import numpy as np
import pytest

from mdir_tpu.ops import lab_trilinear as lt


def _host_l_u8(u8, space):
    from mdir_tpu.data.transforms import rgb2normspace_np

    spc = rgb2normspace_np(u8.astype(np.float32) / 255.0, space)
    return (spc[..., 0] * 255).astype(np.uint8).astype(np.int32)


def test_numpy_replica_matches_cv2_dense():
    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 256, (512, 513, 3)).astype(np.uint8)
    np.testing.assert_array_equal(lt.lab_l_u8_np(u8), _host_l_u8(u8, "lab"))


def test_numpy_replica_matches_cv2_structured():
    # ramps and channel extremes: where corner/rounding bugs show first
    v = np.arange(256, dtype=np.uint8)
    cases = [np.stack([v, v, v], -1)]
    for c in range(3):
        img = np.zeros((256, 3), np.uint8)
        img[:, c] = v
        cases.append(img)
        img2 = np.full((256, 3), 255, np.uint8)
        img2[:, c] = v
        cases.append(img2)
    u8 = np.concatenate(cases)[None]
    np.testing.assert_array_equal(lt.lab_l_u8_np(u8), _host_l_u8(u8, "lab"))


def test_jax_kernel_bit_exact_vs_numpy():
    import jax.numpy as jnp

    rng = np.random.RandomState(1)
    batch = rng.randint(0, 256, (3, 96, 64, 3)).astype(np.uint8)
    out = np.asarray(lt.lab_l_u8_jax(jnp.asarray(batch)))
    np.testing.assert_array_equal(out, lt.lab_l_u8_np(batch))


def test_ab_channels_bit_exact_vs_host():
    """The a/b normalized channels from the trilinear LUT equal the host
    chain's (cv2 + 128)/255 bit for bit."""
    import jax.numpy as jnp

    from mdir_tpu.data.transforms import rgb2normspace_np

    rng = np.random.RandomState(5)
    batch = rng.randint(0, 256, (2, 64, 96, 3)).astype(np.uint8)
    host = np.stack([rgb2normspace_np(im.astype(np.float32) / 255.0, "lab")
                     for im in batch])
    l_np, ab_np = lt.lab_chan_np(batch)
    np.testing.assert_array_equal(ab_np, host[..., 1:])
    l_j, ab_j = lt.lab_chan_jax(jnp.asarray(batch))
    np.testing.assert_array_equal(np.asarray(ab_j), host[..., 1:])
    np.testing.assert_array_equal(np.asarray(l_j), l_np)


def test_lab_normspace_bit_exact_vs_host():
    """tospace:lab on device == the host cv2 conversion bit for bit
    (including the L/100 channel)."""
    import jax.numpy as jnp

    from mdir_tpu.data.transforms import rgb2normspace_np

    rng = np.random.RandomState(6)
    batch = rng.randint(0, 256, (1, 48, 80, 3)).astype(np.uint8)
    host = rgb2normspace_np(batch[0].astype(np.float32) / 255.0, "lab")
    dev = np.asarray(lt.lab_normspace_jax(jnp.asarray(batch)))[0]
    np.testing.assert_array_equal(dev, host)


def test_pallas_kernel_bit_exact_interpret():
    import jax.numpy as jnp

    rng = np.random.RandomState(4)
    batch = rng.randint(0, 256, (2, 16, 256, 3)).astype(np.uint8)
    out = np.asarray(lt.lab_l_u8_pallas(jnp.asarray(batch), interpret=True))
    np.testing.assert_array_equal(out, lt.lab_l_u8_np(batch))


def test_pallas_v2_kernel_bit_exact_interpret():
    """v2 (MXU-built pair weights) reproduces the exact lattice for all
    three channels, both row-block modes, structured + random pixels."""
    import jax.numpy as jnp

    rng = np.random.RandomState(5)
    batch = rng.randint(0, 256, (2, 24, 96, 3)).astype(np.uint8)
    batch[0, :4, 0] = [0, 0, 0]
    batch[0, :4, 1] = [255, 255, 255]
    batch[0, :4, 2] = [255, 0, 0]
    out = np.asarray(lt.lab_n_pallas(jnp.asarray(batch), interpret=True))
    np.testing.assert_array_equal(out, lt._lab_n_np(batch))

    # odd height exercises the rows_per_block=1 mode
    odd = batch[:, :15]
    out = np.asarray(lt.lab_n_pallas(jnp.asarray(odd), interpret=True))
    np.testing.assert_array_equal(out, lt._lab_n_np(odd))

    # single narrow row exercises the px<256 stretch-matmul branch
    tiny = batch[:1, :1]
    out = np.asarray(lt.lab_n_pallas(jnp.asarray(tiny), interpret=True))
    np.testing.assert_array_equal(out, lt._lab_n_np(tiny))

    l_u8, ab = lt.lab_chan(jnp.asarray(batch), interpret=True)
    l_ref, ab_ref = lt.lab_chan_np(batch)
    np.testing.assert_array_equal(np.asarray(l_u8), l_ref)
    np.testing.assert_array_equal(np.asarray(ab), ab_ref)

    spc = np.asarray(lt.lab_normspace(jnp.asarray(batch), interpret=True))
    np.testing.assert_array_equal(
        spc, np.asarray(lt.lab_normspace_jax(jnp.asarray(batch))))


def test_lab_dispatchers_use_xla_off_tpu():
    """On the CPU test backend the dispatchers pick the XLA scan (the
    Pallas path is TPU-gated), keeping chain tracing portable."""
    import jax.numpy as jnp

    rng = np.random.RandomState(6)
    batch = jnp.asarray(rng.randint(0, 256, (1, 16, 32, 3)).astype(np.uint8))
    l_u8, ab = lt.lab_chan(batch)
    l_ref, ab_ref = lt.lab_chan_jax(batch)
    np.testing.assert_array_equal(np.asarray(l_u8), np.asarray(l_ref))
    np.testing.assert_array_equal(np.asarray(ab), np.asarray(ab_ref))
    np.testing.assert_array_equal(np.asarray(lt.lab_l_u8(batch)),
                                  np.asarray(lt.lab_l_u8_jax(batch)))
    np.testing.assert_array_equal(np.asarray(lt.lab_normspace(batch)),
                                  np.asarray(lt.lab_normspace_jax(batch)))


def test_lsh_plane_exact():
    import jax.numpy as jnp

    rng = np.random.RandomState(2)
    u8 = rng.randint(0, 256, (200, 3)).astype(np.uint8)
    host = _host_l_u8(u8[None], "lsh")[0]
    np.testing.assert_array_equal(lt.lsh_l_u8_np(u8), host)
    np.testing.assert_array_equal(
        np.asarray(lt.lsh_l_u8_jax(jnp.asarray(u8[None]))), host[None])


@pytest.mark.skipif(os.environ.get("MDIR_TPU_EXHAUSTIVE", "0") != "1",
                    reason="exhaustive 256^3 sweep; set MDIR_TPU_EXHAUSTIVE=1"
                           " (run it on the TPU backend to seal the"
                           " hardware-lowering claim — CPU tests cannot"
                           " catch operand demotion)")
def test_exhaustive_device_sweep():
    """lab_l_u8_jax over ALL 256^3 RGB triples vs the live cv2 host chain.

    This is the check that caught XLA demoting the f32 node table to bf16
    at some shapes (10% wrong outputs) before the hi/lo packing fix.
    """
    import cv2
    import jax.numpy as jnp

    g, b = np.meshgrid(np.arange(256, dtype=np.uint8),
                       np.arange(256, dtype=np.uint8), indexing="ij")
    bad = 0
    for r0 in range(0, 256, 16):
        rr = np.arange(r0, r0 + 16, dtype=np.uint8)
        batch = np.stack([
            np.broadcast_to(rr[:, None, None], (16, 256, 256)),
            np.broadcast_to(g[None], (16, 256, 256)),
            np.broadcast_to(b[None], (16, 256, 256))], axis=-1)
        out = np.asarray(lt.lab_l_u8_jax(jnp.asarray(batch)))
        flat = batch.reshape(16 * 256, 256, 3).astype(np.float32) \
            / np.float32(255.0)
        L = cv2.cvtColor(flat, cv2.COLOR_RGB2LAB)[..., 0]
        truth = (L.astype(np.float32) / np.float32(100.0)
                 * np.float32(255.0)).astype(np.uint8)
        bad += int((out.reshape(16 * 256, 256) != truth).sum())
    assert bad == 0, f"{bad} mismatches of 256^3"


def test_spot_check_gates():
    assert lt.spot_check("lab")
    assert lt.spot_check("lsh")
    # cv2's Luv is genuine float math (non-lattice): no exact replica
    # exists, but the guarded FLOAT plane qualifies (next test)
    assert not lt.spot_check("luv")


def test_luv_float_l_guard_and_bound():
    """The device float Luv plane (analytic-Y contraction) deviates from
    the host cv2 plane only by off-by-one quantization flips at a bounded
    rate: <0.05% on a dense 16x64x64 lattice sweep (measured 0.005%).
    cv2's float Luv uses the plain analytic sRGB curve — the calibrated
    lab-path LUT is ~1e-3 off and flipped ~20% of bins (the round-2 reason
    luv chains shipped the host plane)."""
    import jax
    import jax.numpy as jnp

    from mdir_tpu.data.transforms import rgb2normspace_np
    from mdir_tpu.ops.preprocess import _float_l_u8, float_l_spot_check

    assert float_l_spot_check("luv")

    ks = np.arange(0, 256, 4, dtype=np.uint8)
    g, b = np.meshgrid(ks, ks, indexing="ij")
    fn = jax.jit(lambda v: _float_l_u8(v, "luv"))
    flips, mx, tot = 0, 0, 0
    for r in range(0, 256, 16):
        batch = np.stack([np.full_like(g, r), g, b], -1).astype(np.uint8)
        host = (rgb2normspace_np(batch.astype(np.float32) / 255.0,
                                 "luv")[..., 0] * 255).astype(np.uint8)
        dev = np.asarray(fn(jnp.asarray(batch[None])))[0]
        d = np.abs(dev - host.astype(np.int32))
        flips += int((d != 0).sum())
        mx = max(mx, int(d.max()))
        tot += d.size
    assert mx <= 1, mx
    assert flips / tot < 5e-4, (flips, tot)


@pytest.mark.parametrize("dsl", ["pil2np | apply_clahe | totensor | normalize",
                                 "pil2np | apply_clahe:3:lsh | totensor | "
                                 "normalize",
                                 "pil2np | apply_clahe:4:luv | totensor | "
                                 "normalize"])
def test_device_l_chain_equals_shipped_l_chain(monkeypatch, dsl):
    """The full bucketed device chain agrees whether the CLAHE input plane
    is shipped from host or recomputed on device. For lsh the two modes are
    bit-identical; for lab the default mode additionally upgrades the a/b
    channels to cv2-bit-exact (the conservative ship mode keeps the float
    colorspace), so those agree within the float path's ~1e-3."""
    import jax.numpy as jnp

    from mdir_tpu.data.transforms import initialize_transforms
    from mdir_tpu.ops.clahe import clahe_bucket_aux
    from mdir_tpu.ops.preprocess import chain_from_transform, \
        make_bucketed_chain

    mean_std = [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]]

    def build(ship):
        monkeypatch.setenv("MDIR_TPU_SHIP_L", "1" if ship else "0")
        return chain_from_transform(initialize_transforms(dsl, mean_std))

    dev = build(False)
    shp = build(True)
    assert dev.device_l and not dev.ships_l
    assert shp.ships_l and not shp.device_l and not shp.exact_lab

    rng = np.random.RandomState(3)
    shapes = [(72, 96), (96, 72)]
    bucket = (96, 96)
    imgs = [rng.randint(0, 256, s + (3,)).astype(np.uint8) for s in shapes]

    def run(chain):
        n_chan = 4 if chain.ships_l else 3
        batch = np.zeros((len(imgs),) + bucket + (n_chan,), np.uint8)
        for i, img in enumerate(imgs):
            inp = chain.host_input(img)
            batch[i, :inp.shape[0], :inp.shape[1]] = inp
        clip, grid = chain.clahe_params
        aux = {k: jnp.asarray(v) for k, v in clahe_bucket_aux(
            shapes, bucket, clip_limit=clip, grid=grid).items()}
        return np.asarray(make_bucketed_chain(chain)(
            jnp.asarray(batch), aux))

    out_dev = run(dev)
    out_shp = run(shp)
    for i, (h, w) in enumerate(shapes):
        if "lsh" in dsl:
            np.testing.assert_array_equal(out_dev[i, :h, :w],
                                          out_shp[i, :h, :w])
        elif "luv" in dsl:
            # both modes share the float colorspace; only the CLAHE input
            # plane differs, by rare off-by-one quantization flips — the
            # output may differ at those pixels (local tile-LUT slope) and
            # negligibly elsewhere (histogram shift)
            diff = np.abs(out_dev[i, :h, :w] - out_shp[i, :h, :w])
            assert (diff > 1e-6).mean() < 0.05, (diff > 1e-6).mean()
            assert diff.max() < 0.2, diff.max()
        else:
            # ~1e-3 rgb-space float-colorspace delta, amplified ~4.4x by
            # the normalize std; rare pixels cross a lab->rgb branch
            # threshold between the two a/b variants
            diff = np.abs(out_dev[i, :h, :w] - out_shp[i, :h, :w])
            assert np.quantile(diff, 0.999) < 5e-2, np.quantile(diff, 0.999)
            assert diff.max() < 0.2, diff.max()


def test_exact_lab_chain_tighter_than_float_vs_host():
    """With exact_lab the device apply_clahe chain's residual vs the host
    chain is ONLY the inverse (lab->rgb) float conversion — strictly
    tighter than the old float forward+inverse path."""
    import jax.numpy as jnp
    from PIL import Image

    from mdir_tpu.data.transforms import initialize_transforms
    from mdir_tpu.ops.clahe import clahe_bucket_aux
    from mdir_tpu.ops.preprocess import chain_from_transform, \
        make_bucketed_chain

    mean_std = [[0.5, 0.5, 0.5], [0.25, 0.25, 0.25]]
    dsl = "pil2np | apply_clahe | totensor | normalize"
    transform = initialize_transforms(dsl, mean_std)
    chain = chain_from_transform(transform)
    assert chain.exact_lab and chain.device_l

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (64, 96, 3)).astype(np.uint8)
    host = transform(Image.fromarray(img))

    clip, grid = chain.clahe_params
    aux = {k: jnp.asarray(v) for k, v in clahe_bucket_aux(
        [(64, 96)], (64, 96), clip_limit=clip, grid=grid).items()}
    dev = np.asarray(make_bucketed_chain(chain)(
        jnp.asarray(img[None]), aux))[0]
    # residual = inverse float conversion only; the forward (incl. a/b) is
    # bit-exact. Normalized units with std 0.25: 4x the rgb-space delta.
    assert np.abs(dev - host).max() < 2e-2


def test_device_corner_check():
    """The on-device corner quantization (the only stage exposed to the
    TPU divide's 1-ulp slack) reproduces the exact u8 tables."""
    lt.device_corner_check.cache_clear()
    assert lt.device_corner_check()


def test_wchunk_scan_partitions_bit_exact():
    """The scan's pixel-chunking (splitting W as well as H to keep the pair
    transient VMEM-sized) is a pure partitioning of the same per-pixel
    integer pipeline: every (target_px, shape) combination must reproduce
    the numpy replica exactly — including widths with no >=128 divisor and
    single-pixel images."""
    rng = np.random.RandomState(7)
    for shape in [(2, 16, 128), (1, 7, 33), (3, 32, 160), (1, 1, 1),
                  (2, 30, 254), (1, 8, 1024)]:
        batch = rng.randint(0, 256, shape + (3,)).astype(np.uint8)
        ref = lt._lab_n_np(batch)
        for target_px in (1, 64, 2048, 10 ** 9):
            got = np.asarray(lt._lab_n_jax(batch, (0, 1, 2), target_px))
            np.testing.assert_array_equal(got, ref, err_msg=str(
                (shape, target_px)))


def test_jax_kernel_unaligned_width_chunks():
    """Widths with no 128-aligned divisor (e.g. 992 = 2^5 x 31 at batch 16)
    must still W-chunk near the VMEM target — the old fallback silently
    degenerated to full-width rows (the HBM-round-trip regime) — and stay
    bit-exact."""
    import jax.numpy as jnp

    rng = np.random.RandomState(7)
    batch = rng.randint(0, 256, (16, 4, 992, 3)).astype(np.uint8)
    out = np.asarray(lt.lab_l_u8_jax(jnp.asarray(batch)))
    np.testing.assert_array_equal(out, lt.lab_l_u8_np(batch))
