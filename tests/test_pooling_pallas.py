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
