"""Loss parity: our JAX contrastive/triplet vs the reference torch formulas."""
import numpy as np
import pytest

from mdir_tpu.optim import criteria

torch = pytest.importorskip("torch")


def _torch_contrastive(x, label, margin=0.7, eps=1e-6):
    x = torch.tensor(x)
    label = torch.tensor(label)
    dim = x.size(0)
    nq = int(torch.sum(label.data == -1))
    S = x.size(1) // nq
    x1 = x[:, ::S].permute(1, 0).repeat(1, S - 1).view((S - 1) * nq, dim).permute(1, 0)
    idx = [i for i in range(len(label)) if label.data[i] != -1]
    x2 = x[:, idx]
    lbl = label[label != -1]
    dif = x1 - x2
    D = torch.pow(dif + eps, 2).sum(dim=0).sqrt()
    y = 0.5 * lbl * torch.pow(D, 2) + \
        0.5 * (1 - lbl) * torch.pow(torch.clamp(margin - D, min=0), 2)
    return float(torch.sum(y))


def _torch_triplet(x, label, margin=0.1):
    x = torch.tensor(x)
    label = torch.tensor(label)
    dim = x.size(0)
    nq = int(torch.sum(label.data == -1).item())
    S = x.size(1) // nq
    xa = x[:, label.data == -1].permute(1, 0).repeat(1, S - 2).view(
        (S - 2) * nq, dim).permute(1, 0)
    xp = x[:, label.data == 1].permute(1, 0).repeat(1, S - 2).view(
        (S - 2) * nq, dim).permute(1, 0)
    xn = x[:, label.data == 0]
    dist_pos = torch.sum(torch.pow(xa - xp, 2), dim=0)
    dist_neg = torch.sum(torch.pow(xa - xn, 2), dim=0)
    return float(torch.sum(torch.clamp(dist_pos - dist_neg + margin, min=0)))


@pytest.mark.parametrize("nq,nneg", [(2, 3), (5, 5), (1, 1)])
def test_contrastive_matches_torch(rng, nq, nneg):
    S = 2 + nneg
    x = rng.randn(32, nq * S).astype(np.float32)
    x /= np.linalg.norm(x, axis=0, keepdims=True)
    label = np.tile([-1.0, 1.0] + [0.0] * nneg, nq).astype(np.float32)
    ref = _torch_contrastive(x, label)
    ours = float(np.asarray(criteria.ContrastiveLoss(0.7, 1e-6)(x, label)))
    np.testing.assert_allclose(ref, ours, rtol=1e-5)


@pytest.mark.parametrize("nq,nneg", [(2, 3), (4, 2)])
def test_triplet_matches_torch(rng, nq, nneg):
    S = 2 + nneg
    x = rng.randn(32, nq * S).astype(np.float32)
    x /= np.linalg.norm(x, axis=0, keepdims=True)
    label = np.tile([-1.0, 1.0] + [0.0] * nneg, nq).astype(np.float32)
    ref = _torch_triplet(x, label)
    ours = float(np.asarray(criteria.TripletLoss(0.1)(x, label)))
    np.testing.assert_allclose(ref, ours, rtol=1e-5)


def test_contrastive_grad_flows(rng):
    import jax
    import jax.numpy as jnp

    x = rng.randn(8, 6).astype(np.float32)
    label = np.array([-1, 1, 0, -1, 1, 0], np.float32)
    grad = jax.grad(lambda a: criteria.contrastive_loss(a, label))(jnp.asarray(x))
    assert np.isfinite(np.asarray(grad)).all()
    assert np.abs(np.asarray(grad)).sum() > 0


def test_l1_mse(rng):
    a = rng.rand(4, 5).astype(np.float32)
    b = rng.rand(4, 5).astype(np.float32)
    np.testing.assert_allclose(
        float(np.asarray(criteria.L1Loss()(a, b))), np.abs(a - b).mean(), rtol=1e-6)
    np.testing.assert_allclose(
        float(np.asarray(criteria.MSELoss()(a, b))), ((a - b) ** 2).mean(), rtol=1e-6)


def test_label_list_concat(rng):
    x = rng.randn(8, 6).astype(np.float32)
    labels = [np.array([-1, 1, 0], np.float32), np.array([-1, 1, 0], np.float32)]
    flat = np.concatenate(labels)
    crit = criteria.ContrastiveLoss(0.7, 1e-6)
    np.testing.assert_allclose(
        float(np.asarray(crit(x, labels))), float(np.asarray(crit(x, flat))))
