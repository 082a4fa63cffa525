"""Device meshes and sharding helpers.

The reference is single-device (``torch.device("cuda:0")`` everywhere, e.g.
``train_torch.py:52``); parallelism here is a new, first-class component:

* victim training: 1-D data-parallel mesh over the batch axis — parameters
  replicated, activations batch-sharded, gradient all-reduce inserted by the
  partitioner over ICI;
* the attack: generated-set-axis sharding with a tie-break-exact global
  argmin reduction (see ``parallel/knn_shard.py``).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(shape: tuple[int, ...] = (1,),
                       axis_names: tuple[str, ...] = ("data",)) -> Mesh | None:
    """A mesh over the first ``prod(shape)`` devices; None for the trivial
    single-device case (no partitioning overhead)."""
    n = int(np.prod(shape))
    if n <= 1:
        return None
    devices = np.asarray(jax.devices()[:n]).reshape(shape)
    return Mesh(devices, axis_names)


def shard_batch(batch: jax.Array, mesh: Mesh,
                axis: str = "data") -> jax.Array:
    """Lay a batch out shard-major over the mesh's data axis."""
    spec = P(axis, *([None] * (batch.ndim - 1)))
    return jax.device_put(batch, NamedSharding(mesh, spec))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (parameters) over every mesh device."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
