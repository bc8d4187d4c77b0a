"""Pooling/normalization parity vs the reference torch formulas."""
import numpy as np
import pytest

from mdir_tpu.ops import pooling

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_gem(x, p=3.0, eps=1e-6):
    return F.avg_pool2d(x.clamp(min=eps).pow(p), (x.size(-2), x.size(-1))).pow(1.0 / p)


@pytest.fixture
def feat(rng):
    # NCHW torch tensor and NHWC numpy twin
    x = rng.rand(2, 5, 9, 7).astype(np.float32)
    return torch.tensor(x), np.transpose(x, (0, 2, 3, 1))


def test_mac(feat):
    xt, xn = feat
    ref = F.max_pool2d(xt, (xt.size(-2), xt.size(-1))).squeeze(-1).squeeze(-1).numpy()
    ours = np.asarray(pooling.mac(xn))
    np.testing.assert_allclose(ref, ours, rtol=1e-6)


def test_spoc(feat):
    xt, xn = feat
    ref = F.avg_pool2d(xt, (xt.size(-2), xt.size(-1))).squeeze(-1).squeeze(-1).numpy()
    ours = np.asarray(pooling.spoc(xn))
    np.testing.assert_allclose(ref, ours, rtol=1e-5)


@pytest.mark.parametrize("p", [1.0, 3.0, 4.7])
def test_gem(feat, p):
    xt, xn = feat
    ref = _torch_gem(xt, p=p).squeeze(-1).squeeze(-1).numpy()
    ours = np.asarray(pooling.gem(xn, p=p))
    np.testing.assert_allclose(ref, ours, rtol=1e-5)


def test_l2n(feat):
    xt, xn = feat
    pooled = _torch_gem(xt).squeeze(-1).squeeze(-1)
    ref = (pooled / (torch.norm(pooled, p=2, dim=1, keepdim=True) + 1e-6)).numpy()
    ours = np.asarray(pooling.l2n(pooling.gem(xn)))
    np.testing.assert_allclose(ref, ours, rtol=1e-5)


def test_rmac_against_reference_loops(feat):
    """RMAC vs a direct torch transcription of functional.py:26-75."""
    import math

    xt, xn = feat

    def torch_rmac(x, L=3, eps=1e-6):
        ovr = 0.4
        steps = torch.Tensor([2, 3, 4, 5, 6, 7])
        W, H = x.size(3), x.size(2)
        w = min(W, H)
        b = (max(H, W) - w) / (steps - 1)
        _, idx = torch.min(torch.abs(((w ** 2 - w * b) / w ** 2) - ovr), 0)
        Wd, Hd = 0, 0
        if H < W:
            Wd = idx.item() + 1
        elif H > W:
            Hd = idx.item() + 1
        v = F.max_pool2d(x, (x.size(-2), x.size(-1)))
        v = v / (torch.norm(v, p=2, dim=1, keepdim=True) + eps).expand_as(v)
        for l in range(1, L + 1):
            wl = math.floor(2 * w / (l + 1))
            wl2 = math.floor(wl / 2 - 1)
            if l + Wd == 1:
                b = 0
            else:
                b = (W - wl) / (l + Wd - 1)
            cenW = torch.floor(wl2 + torch.Tensor(range(l - 1 + Wd + 1)) * b) - wl2
            if l + Hd == 1:
                b = 0
            else:
                b = (H - wl) / (l + Hd - 1)
            cenH = torch.floor(wl2 + torch.Tensor(range(l - 1 + Hd + 1)) * b) - wl2
            for i_ in cenH.tolist():
                for j_ in cenW.tolist():
                    if wl == 0:
                        continue
                    R = x[:, :, int(i_):int(i_) + wl, int(j_):int(j_) + wl]
                    vt = F.max_pool2d(R, (R.size(-2), R.size(-1)))
                    vt = vt / (torch.norm(vt, p=2, dim=1, keepdim=True) + eps).expand_as(vt)
                    v += vt
        return v

    ref = torch_rmac(xt).squeeze(-1).squeeze(-1).numpy()
    ours = np.asarray(pooling.rmac(xn))
    np.testing.assert_allclose(ref, ours, rtol=1e-5, atol=1e-6)


def test_masked_pooling_equals_cropped(rng):
    """Padding + mask must reproduce the native-shape pooling exactly."""
    x = rng.rand(1, 9, 7, 5).astype(np.float32)
    padded = np.zeros((1, 16, 16, 5), np.float32)
    padded[:, :9, :7] = x
    mask = np.zeros((1, 16, 16), np.float32)
    mask[:, :9, :7] = 1.0

    for fn in (pooling.mac, pooling.spoc, pooling.gem):
        native = np.asarray(fn(x))
        masked = np.asarray(fn(padded, mask=mask))
        np.testing.assert_allclose(native, masked, rtol=1e-5, atol=1e-7)


def test_powerlaw_signed_sqrt():
    """powerlaw: signed sqrt with eps shift (cirtorch functional.py:133-135
    as documented — the reference's own method has an unused-self bug)."""
    from mdir_tpu.ops.pooling import powerlaw

    import jax.numpy as jnp

    x = np.array([-4.0, -1.0, 0.0, 0.25, 9.0], np.float32)
    out = np.asarray(powerlaw(jnp.asarray(x), eps=0.0))
    np.testing.assert_allclose(out, np.sign(x) * np.sqrt(np.abs(x)),
                               rtol=1e-6)
    shifted = np.asarray(powerlaw(jnp.asarray(x), eps=1e-6))
    assert np.isfinite(shifted).all()


def test_rmac_region_grid_matches_torch_f32_sweep():
    """The RMAC region grid must replicate cirtorch's FLOAT32 tensor math
    (functional.py:26-75) — including torch's reciprocal-multiply lowering
    of scalar/tensor division — across feature extents. float64 centers
    diverge at dozens of extents in 4..129 (e.g. (11,47) picks a different
    steps index; (4,33) shifts the level-2 offsets), silently breaking
    regional-descriptor parity with published checkpoints."""
    import math

    import torch

    from mdir_tpu.ops.pooling import _rmac_region_grid

    def torch_grid(H, W, L=3):
        steps = torch.Tensor([2, 3, 4, 5, 6, 7])
        w = min(W, H)
        b = (max(H, W) - w) / (steps - 1)
        _, idx = torch.min(torch.abs(((w ** 2 - w * b) / w ** 2) - 0.4), 0)
        Wd = Hd = 0
        if H < W:
            Wd = idx.item() + 1
        elif H > W:
            Hd = idx.item() + 1
        out = []
        for l in range(1, L + 1):
            wl = math.floor(2 * w / (l + 1))
            wl2 = math.floor(wl / 2 - 1)
            if wl == 0:
                continue
            bb = 0 if l + Wd == 1 else (W - wl) / (l + Wd - 1)
            cenW = torch.floor(
                wl2 + torch.Tensor(range(l - 1 + Wd + 1)) * bb) - wl2
            bb = 0 if l + Hd == 1 else (H - wl) / (l + Hd - 1)
            cenH = torch.floor(
                wl2 + torch.Tensor(range(l - 1 + Hd + 1)) * bb) - wl2
            for i_ in cenH.tolist():
                for j_ in cenW.tolist():
                    out.append((int(i_), int(j_), wl))
        return out

    for H in range(4, 130):
        for W in range(4, 130):
            assert _rmac_region_grid(H, W) == torch_grid(H, W), (H, W)
