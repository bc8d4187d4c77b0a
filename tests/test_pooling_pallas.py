"""Pallas fused GeM+L2N kernel vs the jnp composition (interpret mode)."""
import numpy as np
import pytest

import jax.numpy as jnp

from mdir_tpu.models.trunks import feature_mask
from mdir_tpu.ops import pooling
from mdir_tpu.ops.pooling_pallas import gem_l2n_pallas


@pytest.mark.parametrize("shape,valid", [
    ((2, 16, 24, 128), [[16, 24], [9, 17]]),
    ((1, 8, 8, 256), [[5, 8]]),
    ((3, 7, 9, 128), [[7, 9], [3, 4], [1, 1]]),
])
def test_gem_l2n_pallas_matches_jnp(rng, shape, valid):
    x = rng.rand(*shape).astype(np.float32)
    valid = np.asarray(valid, np.int32)
    p = 2.7

    ref_mask = feature_mask(shape[1:3], jnp.asarray(valid), dtype=jnp.float32)
    ref = pooling.l2n(pooling.gem(jnp.asarray(x), p=p, mask=ref_mask))

    out = gem_l2n_pallas(jnp.asarray(x), jnp.asarray(valid), p,
                         interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-5, atol=1e-6)


def test_clahe_pallas_interp_matches_numpy(rng):
    """Pallas LUT-interpolation kernel vs the bit-exact numpy CLAHE."""
    from mdir_tpu.ops.clahe import clahe_u8_np
    from mdir_tpu.ops.clahe_pallas import clahe_u8_pallas

    src = (rng.rand(32, 32) * 255).astype(np.uint8)
    ref = clahe_u8_np(src)
    out = np.asarray(clahe_u8_pallas(jnp.asarray(src), interpret=True))
    diff = np.abs(ref.astype(int) - out.astype(int))
    # FMA fusion can flip a round-half-even boundary on rare pixels
    assert diff.max() <= 1 and (diff > 0).mean() < 1e-3


def test_clahe_pallas_full_matches_numpy(rng):
    """Both CLAHE stages as Pallas kernels (LUT build + interpolation)."""
    from mdir_tpu.ops.clahe import clahe_u8_np
    from mdir_tpu.ops.clahe_pallas import clahe_u8_pallas_full

    src = (rng.rand(32, 32) * 255).astype(np.uint8)
    ref = clahe_u8_np(src)
    out = np.asarray(clahe_u8_pallas_full(jnp.asarray(src), interpret=True))
    np.testing.assert_array_equal(ref, out)


def test_clahe_interp_bucketed_pallas_close():
    """The dynamic-extent Pallas interpolation (kept as an alternative to
    the faster all-tile-lookup XLA contraction)
    matches the bit-exact XLA contraction within 1 u8 level (the kernel
    premultiplies the separable blend weights)."""
    import jax
    import jax.numpy as jnp

    from mdir_tpu.ops.clahe import (clahe_bucket_aux, clahe_u8_bucketed_jax,
                                    _hist_dynamic, _luts_dynamic)
    from mdir_tpu.ops.clahe_pallas import clahe_interp_bucketed_pallas

    rng = np.random.RandomState(4)
    shapes = [(57, 43), (100, 91), (128, 77)]
    bh, bw = 128, 128
    batch = np.zeros((len(shapes), bh, bw), np.int32)
    for i, (h, w) in enumerate(shapes):
        batch[i, :h, :w] = rng.randint(0, 256, (h, w))
    aux = {k: jnp.asarray(v) for k, v in clahe_bucket_aux(
        shapes, (bh, bw), 4.0, (8, 8)).items()}
    ref = np.asarray(clahe_u8_bucketed_jax(jnp.asarray(batch), aux))

    def tile_luts(vals, rs, cs_, rt, ct, clim, scale):
        padded = jnp.take(jnp.take(vals, rs, 0), cs_, 1)
        hist = _hist_dynamic(padded, rt, ct, 8, 8)
        return _luts_dynamic(hist.reshape(64, 256), clim, scale)

    luts = jax.vmap(tile_luts)(jnp.asarray(batch), aux["row_src"],
                               aux["col_src"], aux["row_tile"],
                               aux["col_tile"], aux["clim"], aux["scale"])
    out = np.asarray(clahe_interp_bucketed_pallas(
        jnp.asarray(batch), luts, aux["inv_th"], aux["inv_tw"],
        interpret=True))
    for i, (h, w) in enumerate(shapes):
        d = np.abs(ref[i, :h, :w] - out[i, :h, :w])
        assert d.max() <= 1.0, (shapes[i], d.max())
