"""Device mesh + sharding helpers.

The reference is single-process single-device (SURVEY §2.6); scaling here is
jax.sharding-native: a 2-D mesh with a ``data`` axis (chronological batch
sharding — safe because the reference already treats intra-batch edges as
concurrent) and a ``model`` axis (feature-dimension sharding of tables and
dense layers). XLA's SPMD partitioner inserts the ICI collectives.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: int | None = None, model_parallelism: int = 1
) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    assert n % model_parallelism == 0
    grid = np.array(devices[:n]).reshape(n // model_parallelism, model_parallelism)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading (chronological-batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def feature_sharded(mesh: Mesh) -> NamedSharding:
    """Shard trailing feature columns of a table over the model axis."""
    return NamedSharding(mesh, P(None, MODEL_AXIS))
