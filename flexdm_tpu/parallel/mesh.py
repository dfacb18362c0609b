"""Device mesh and sharding helpers.

The reference is single-device (its ``MirroredStrategy`` is commented out,
reference ``src/mfp/mfp/train.py:25``).  Here data parallelism is first-class
and nearly free: one ``jax.sharding.Mesh`` with a ``data`` axis, batches
sharded over it, parameters replicated, and XLA SPMD inserts the gradient
all-reduce over ICI.  A ``model`` axis is exposed for tensor parallelism —
unnecessary at D=256 but the sharding rules accept it so scaled configs can
turn it on without code changes.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    num_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """(data, model) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch axis sharded over data; everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, np.ndarray], mesh: Mesh) -> Dict:
    """Device-put a host batch with the leading axis sharded over `data`.

    The global batch size must divide the data-axis size.
    """
    sharding = batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params, optimizer state) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
