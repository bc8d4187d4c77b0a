"""Device mesh helpers: data-parallel sharding for extraction and training.

The reference is single-device (SURVEY.md §2.11-2.12); scale-out here is
jax.sharding over an ICI mesh — batch-sharded extraction and DP training,
with XLA inserting the collectives. Tested on a virtual 8-device CPU mesh.
"""
import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis="batch"):
    """1-D data-parallel mesh over the first n devices.

    Asking for more devices than exist is a hard error, not a silent
    truncation: this is reached straight from user yaml
    (``parallel: {data: N}`` in scores/epoch iteration), and a misconfigured
    multi-chip job must not masquerade as a slow correct one."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                "parallel mesh wants %d devices but only %d are available"
                % (n_devices, len(devices)))
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def batch_sharding(mesh, axis="batch"):
    """Shard the leading (batch) dim across the mesh; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, array, axis="batch"):
    """Place a host array batch-sharded on the mesh (pads are caller's job)."""
    return jax.device_put(array, batch_sharding(mesh, axis))


def replicate(mesh, tree):
    return jax.device_put(tree, replicated(mesh))


def zero_shardings(mesh, tree, axis="batch"):
    """Per-leaf ZeRO-style shardings: each array leaf splits its largest
    mesh-divisible dimension across ``axis``; leaves with no divisible
    dimension (scalars, step counters, odd-sized vectors) replicate.

    Used for gradients and optimizer state in the ZeRO-sharded DP training
    mode (``network: runtime: param_sharding: zero``): gradients leave the
    step program reduce-scattered instead of all-reduced, momentum/Adam
    moments live sharded N ways, and the optimizer update emits replicated
    params (the all-gather rides inside the compiled update program) — same
    total ICI traffic as plain DP all-reduce, 1/N the grad + optimizer-state
    memory. The reference is single-device (SURVEY.md §2.11); this is the
    jax.sharding scaling of its SGD/Adam training.
    """
    n = mesh.devices.size

    def spec(leaf):
        shape = getattr(leaf, "shape", None) or ()
        best, size = None, 0
        for i, d in enumerate(shape):
            if d % n == 0 and d > size:
                best, size = i, d
        if best is None:
            return NamedSharding(mesh, P())
        parts = [None] * len(shape)
        parts[best] = axis
        return NamedSharding(mesh, P(*parts))

    return jax.tree.map(spec, tree)


def zero_put(mesh, tree, axis="batch"):
    """Place a tree's array leaves with ``zero_shardings``; non-array leaves
    (python ints in optimizer state) pass through untouched."""
    shardings = zero_shardings(mesh, tree, axis)
    return jax.tree.map(
        lambda leaf, s: jax.device_put(leaf, s)
        if hasattr(leaf, "shape") or hasattr(leaf, "dtype") else leaf,
        tree, shardings)
