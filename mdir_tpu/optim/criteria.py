"""Loss criteria as pure JAX functions (jit/grad compatible).

Parity with the reference losses: L1/MSE (mean reduction,
``base_losses.py``), and the cirtorch contrastive/triplet losses (sum
reduction) on the D x N column layout where tuples are packed as
``[q, p, n1..nN, q2, ...]`` with labels -1/1/0 (``layers/functional.py:141-173``)
— including the reference's ``(dif + eps)^2`` quirk in the contrastive
distance. The per-tuple query/positive columns are recovered with a
forward-fill scan so the loss works for any tuple layout under jit.
"""
import jax
import jax.numpy as jnp
import numpy as np


class L1Loss:
    reduction = "mean"

    def __call__(self, x, target):
        return jnp.mean(jnp.abs(x - target))


class MSELoss:
    reduction = "mean"

    def __call__(self, x, target):
        return jnp.mean((x - target) ** 2)


def _forward_fill_positions(marker):
    """For each column j, the index of the last marked column at or <= j."""
    idx = jnp.where(marker, jnp.arange(marker.shape[0]), -1)
    return jax.lax.associative_scan(jnp.maximum, idx)


def contrastive_loss(x, label, margin=0.7, eps=1e-6):
    """Sum-reduced contrastive loss on D x N columns."""
    label = jnp.asarray(label).reshape(-1)
    is_query = label == -1
    qcol = _forward_fill_positions(is_query)
    x1 = x[:, qcol]  # query column for every column
    dif = x1 - x
    dist = jnp.sqrt(jnp.sum((dif + eps) ** 2, axis=0))
    lbl = jnp.clip(label, 0.0, 1.0)  # -1 -> 0 contribution is masked anyway
    y = 0.5 * lbl * dist ** 2 + 0.5 * (1 - lbl) * jnp.maximum(margin - dist, 0) ** 2
    return jnp.sum(jnp.where(is_query, 0.0, y))


def triplet_loss(x, label, margin=0.1):
    """Sum-reduced triplet loss on D x N columns."""
    label = jnp.asarray(label).reshape(-1)
    is_query = label == -1
    is_pos = label == 1
    is_neg = label == 0
    qcol = _forward_fill_positions(is_query)
    pcol = _forward_fill_positions(is_pos)
    xa = x[:, qcol]
    xp = x[:, pcol]
    dist_pos = jnp.sum((xa - xp) ** 2, axis=0)
    dist_neg = jnp.sum((xa - x) ** 2, axis=0)
    y = jnp.maximum(dist_pos - dist_neg + margin, 0)
    return jnp.sum(jnp.where(is_neg, y, 0.0))


class ContrastiveLoss:
    reduction = "sum"

    def __init__(self, margin=0.7, eps=1e-6):
        self.margin = margin
        self.eps = eps

    def __call__(self, x, label):
        if isinstance(label, (list, tuple)):
            label = np.concatenate([np.asarray(l).reshape(-1) for l in label])
        return contrastive_loss(x, label, self.margin, self.eps)

    def __repr__(self):
        return "ContrastiveLoss(margin=%.4f)" % self.margin


class TripletLoss:
    reduction = "sum"

    def __init__(self, margin=0.1):
        self.margin = margin

    def __call__(self, x, label):
        if isinstance(label, (list, tuple)):
            label = np.concatenate([np.asarray(l).reshape(-1) for l in label])
        return triplet_loss(x, label, self.margin)

    def __repr__(self):
        return "TripletLoss(margin=%s)" % self.margin


CRITERIA = {
    "l1": L1Loss,
    "mse": MSELoss,
    "contrastive": ContrastiveLoss,
    "triplet": TripletLoss,
}


def initialize_criterion(params):
    if not params:
        return None
    params = dict(params)
    return CRITERIA[params.pop("loss")](**params)
