"""Device mesh and sharding helpers.

The reference is single-device (its ``MirroredStrategy`` is commented out,
reference ``src/mfp/mfp/train.py:25``).  Here data parallelism is first-class
and nearly free: one ``jax.sharding.Mesh`` with a ``data`` axis, batches
sharded over it, and XLA SPMD inserts the gradient all-reduce over ICI.

Tensor parallelism is the ``model`` axis: :func:`shard_params` lays model
parameters out Megatron-style — attention QKV and the first MLP matmul are
column-parallel (output features split over ``model``), the attention output
projection and second MLP matmul are row-parallel (contraction dim split, so
each pair needs exactly one reduce per block), decoder heads and embedding
tables split their feature axis.  GSPMD propagates the activation shardings
and inserts the collectives.  Unnecessary at D=256, but the layout means
scaled configs turn it on without code changes — and the optimizer state
(Adam moments mirror the parameter tree) shards by the same rules, so
optimizer memory scales down with the axis too.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

# (leading_dim, data_axis) pairs already warned about, to log the
# replicated-placement fallback once instead of once per batch.
_uneven_batch_warned: set = set()

DATA_AXIS = "data"
MODEL_AXIS = "model"

# Dense layers whose OUTPUT features shard over `model` (column-parallel)
# and whose INPUT (contraction) dim shards (row-parallel).  Pairing them
# this way (Megatron MLP/attention) keeps activations sharded through the
# block interior with a single psum at each block boundary.
_COLUMN_PARALLEL = ("query", "key", "value", "mlp_0", "conditional")
_ROW_PARALLEL = ("out", "mlp_1")


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


def _single_process_placer(mesh: Mesh):
    """Per-leaf ``device_put`` with the leading axis on ``data`` when it
    divides the axis, replicated otherwise (warned once per (dim, axis)
    pair).  Shardings are built once per batch, not per leaf.

    Train/eval math is placement-invariant — losses are global sums and the
    eval num/den accounting zero-weights padded rows — so an indivisible
    batch (e.g. ``--batch_size 6`` on an 8-chip host) should lose data
    parallelism for that array, not crash with a pjit divisibility error.
    """
    data_sharding = batch_sharding(mesh)
    repl_sharding = replicated(mesh)
    axis = mesh.shape[DATA_AXIS]

    def place(x):
        if x.shape[0] % axis == 0:
            return jax.device_put(x, data_sharding)
        key = (x.shape[0], axis)
        if key not in _uneven_batch_warned:
            _uneven_batch_warned.add(key)
            logger.warning(
                "batch dim %d does not divide the data axis (%d); placing "
                "replicated (no data parallelism for this array)",
                x.shape[0],
                axis,
            )
        return jax.device_put(x, repl_sharding)

    return place


def shard_batch(batch: Dict[str, np.ndarray], mesh: Mesh) -> Dict:
    """Place a host batch with the leading axis sharded over ``data``.

    Single-process: a plain ``device_put``.  Multi-process: each process
    passes its LOCAL slice of the global batch (the trainer gives every
    host a disjoint 1-in-N record stride) and the global array is assembled
    with ``jax.make_array_from_process_local_data`` — a ``device_put``
    against a multi-host sharding would wrongly treat the local slice as
    the full global value.  The global batch size must divide the
    data-axis size.
    """
    if jax.process_count() > 1:
        sharding = batch_sharding(mesh)
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sharding, x),
            batch,
        )
    return jax.tree.map(_single_process_placer(mesh), batch)


def shard_global_batch(tree, mesh: Mesh):
    """Place a batch whose FULL content exists on every host (validation /
    test batches) with the leading axis sharded over ``data``.

    Single-process this is :func:`shard_batch`; multi-process each host
    contributes only its own row-slice of the globally-identical value.
    Accepts a dict or a bare array.
    """
    if jax.process_count() <= 1:
        return jax.tree.map(_single_process_placer(mesh), tree)
    n, pid = jax.process_count(), jax.process_index()
    sharding = batch_sharding(mesh)

    def place(x):
        if x.shape[0] % n:
            # Silently dropping the tail would corrupt eval num/den sums.
            raise ValueError(
                f"global batch dim {x.shape[0]} must divide over "
                f"{n} processes"
            )
        b = x.shape[0] // n
        return jax.make_array_from_process_local_data(
            sharding, x[pid * b : (pid + 1) * b]
        )

    return jax.tree.map(place, tree)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params, optimizer state) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def _string_keys(path) -> Tuple[str, ...]:
    out = []
    for entry in path:
        key = getattr(entry, "key", None) or getattr(entry, "name", None)
        if isinstance(key, str):
            out.append(key)
    return tuple(out)


def partition_spec(path, shape, model_size: int) -> P:
    """Tensor-parallel PartitionSpec for one parameter leaf.

    ``path`` is a tree_util key path (works for both ``params`` and the Adam
    ``mu``/``nu`` mirrors, whose paths carry the same parameter names).
    Dims that don't divide ``model_size`` stay replicated — correctness
    never depends on a shardable shape.
    """
    if model_size <= 1 or not shape:
        return P()
    keys = _string_keys(path)
    if not keys:
        return P()
    leaf = keys[-1]
    parent = keys[-2] if len(keys) >= 2 else ""

    def last_dim(spec_prefix_len: int) -> P:
        if shape[-1] % model_size:
            return P()
        return P(*([None] * spec_prefix_len + [MODEL_AXIS]))

    if parent in _ROW_PARALLEL and leaf == "kernel":
        if len(shape) == 2 and shape[0] % model_size == 0:
            return P(MODEL_AXIS, None)
        return P()
    if (parent in _COLUMN_PARALLEL or parent.startswith("decoder_")):
        if leaf == "kernel" and len(shape) == 2:
            return last_dim(1)
        if leaf == "bias" and len(shape) == 1:
            return last_dim(0)
        return P()
    # Encoder inputs: embedding tables are leaves named `input_*` (V, D);
    # numerical-input Dense kernels sit under a module named `input_*`.
    if leaf.startswith("input_") and len(shape) == 2:
        return last_dim(1)
    if parent.startswith("input_") and leaf == "kernel" and len(shape) == 2:
        return last_dim(1)
    return P()


def shard_params(tree, mesh: Mesh):
    """Place parameters (or any param-shaped tree, e.g. a TrainState) on the
    mesh with tensor-parallel layouts; everything unmatched is replicated.

    Multi-process: every host is assumed to hold the full value (true for
    seeded init and checkpoint restores), so each host materializes its own
    addressable shards via ``make_array_from_callback`` — a bare
    ``device_put`` of a committed array onto a multi-host sharding would
    demand cross-host device transfers, which e.g. the CPU backend refuses.
    """
    model_size = mesh.shape.get(MODEL_AXIS, 1)
    multiprocess = jax.process_count() > 1

    def place(path, x):
        spec = partition_spec(path, getattr(x, "shape", ()), model_size)
        sharding = NamedSharding(mesh, spec)
        if not multiprocess:
            return jax.device_put(x, sharding)
        arr = np.asarray(x)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )

    return jax.tree_util.tree_map_with_path(place, tree)


# A TrainState shards by the same leaf rules (Adam mu/nu mirror params).
shard_state = shard_params
