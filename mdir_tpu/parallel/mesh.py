"""Device mesh helpers: data-parallel sharding for extraction and training.

The reference is single-device (SURVEY.md §2.11-2.12); scale-out here is
jax.sharding over an ICI mesh — batch-sharded extraction and DP training,
with XLA inserting the collectives. Tested on a virtual 8-device CPU mesh.
"""
import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis="batch"):
    """1-D data-parallel mesh over the first n devices."""
    devices = jax.devices()
    if n_devices is not None:
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
