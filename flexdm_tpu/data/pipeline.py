"""Host-side input pipeline: TFRecord shards -> fixed-shape numpy batches.

Replaces the reference's ``tf.data`` pipeline (reference
``src/mfp/mfp/data/spec.py:213-253``) with a TensorFlow-free loader.  Design
points, TPU-first:

* **Static shapes.**  Every batch is ``(B, max_length, C)``; XLA compiles the
  train step once.  The reference padded to the ragged per-batch max instead,
  which would trigger recompilation under jit.
* **Decode once, cache.**  Records are decoded to compact per-record arrays on
  first touch and cached in RAM (the reference used ``dataset.cache()``,
  spec.py:238-239).  Batches are then pure ``np.stack`` calls.
* **Deterministic shuffling** from an explicit seed, re-derived per epoch.
* **Final partial batches** are padded up to ``batch_size`` and annotated with
  ``num_valid`` so evaluation can keep exact num/den score accounting.

Multi-host sharding: pass ``num_hosts``/``host_id`` to give each host a
disjoint subset of records (round-robin by record index).
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional

import numpy as np

from . import tfrecord

# Key carrying the number of real (non-padding) samples in a padded batch.
NUM_VALID_KEY = "num_valid"


class DataLoader:
    """Iterable over preprocessed, padded batches of one split."""

    def __init__(
        self,
        spec,
        split: str,
        batch_size: int = 8,
        shuffle: bool = False,
        repeat: bool = False,
        seed: int = 0,
        drop_remainder: bool = False,
        pad_final_batch: bool = True,
        num_hosts: int = 1,
        host_id: int = 0,
        verify_crc: bool = False,
    ):
        self.spec = spec
        self.split = split
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.repeat = repeat
        self.seed = seed
        self.drop_remainder = drop_remainder
        self.pad_final_batch = pad_final_batch
        self.num_hosts = num_hosts
        self.host_id = host_id
        self.verify_crc = verify_crc

        shards = tfrecord.list_shards(spec.path, split)
        if not shards:
            raise FileNotFoundError(
                f"no TFRecord shards for split {split!r} under {spec.path}"
            )
        payloads: List[bytes] = []
        for shard in shards:
            payloads.extend(tfrecord.read_records(shard, verify_crc=verify_crc))
        # Pre-shard global count: hosts need it to agree on a common
        # steps-per-epoch (shard sizes differ by up to 1 record, and every
        # host must run the SAME number of SPMD steps or collectives
        # deadlock).
        self.global_num_records = len(payloads)
        if num_hosts > 1:
            payloads = payloads[host_id::num_hosts]
        self._payloads = payloads
        self._decoded: List[Optional[Dict[str, np.ndarray]]] = [None] * len(
            payloads
        )

    def __len__(self) -> int:
        n = len(self._payloads)
        if self.drop_remainder:
            return n // self.batch_size
        return -(-n // self.batch_size)

    @property
    def num_records(self) -> int:
        return len(self._payloads)

    def _record(self, i: int) -> Dict[str, np.ndarray]:
        if self._decoded[i] is None:
            self._decoded[i] = self.spec.decode_record(self._payloads[i])
        return self._decoded[i]

    def _make_batch(self, indices: np.ndarray) -> Dict[str, np.ndarray]:
        records = [self._record(int(i)) for i in indices]
        num_valid = len(records)
        if num_valid < self.batch_size and self.pad_final_batch:
            records = records + [records[-1]] * (self.batch_size - num_valid)
        batch = {
            k: np.stack([r[k] for r in records], axis=0) for k in records[0]
        }
        batch[NUM_VALID_KEY] = num_valid
        return batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self._payloads)
        if self.drop_remainder and n < self.batch_size:
            raise ValueError(
                f"split {self.split!r} has {n} records < batch_size "
                f"{self.batch_size} with drop_remainder=True; no batch can "
                "ever be produced"
            )
        epoch = 0
        while True:
            order = np.arange(n)
            if self.shuffle:
                rng = np.random.default_rng(self.seed + epoch)
                rng.shuffle(order)
            stop = n - n % self.batch_size if self.drop_remainder else n
            for start in range(0, stop, self.batch_size):
                yield self._make_batch(order[start : start + self.batch_size])
            if not self.repeat:
                return
            epoch += 1


class Prefetcher:
    """Background-thread prefetch over any batch iterable.

    Decouples host-side decode/stack from the device step loop (the
    reference leaned on tf.data's AUTOTUNE threadpool for this,
    reference spec.py:219-251).  ``transform`` runs in the worker thread —
    pass the device_put/shard function there so transfers overlap compute.
    """

    def __init__(self, iterable, depth: int = 2, transform=None):
        import queue
        import threading

        self._queue: "queue.Queue" = queue.Queue(maxsize=depth)
        self._sentinel = object()
        self._err = None

        def worker():
            try:
                for item in iterable:
                    self._queue.put(
                        transform(item) if transform is not None else item
                    )
            except BaseException as e:  # surface worker errors to consumer
                self._err = e
            finally:
                self._queue.put(self._sentinel)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        while True:
            item = self._queue.get()
            if item is self._sentinel:
                if self._err is not None:
                    raise self._err
                return
            yield item


class DeviceDataCache:
    """Whole-split dataset resident in accelerator memory.

    At document scale (crello: ~20k docs x ~100KB padded) the split fits in
    HBM, so the fastest input pipeline is no host pipeline: upload every
    record once, then each train step gathers its batch with a device-side
    ``take`` on a (B,) index vector — the only per-step host->device traffic
    is the indices.

    **Mesh mode** (pass ``mesh=``): the record axis is sharded over the
    mesh's ``data`` axis instead of landing on one chip — device ``d`` of
    ``D`` holds records ``d, d+D, d+2D, …`` (round-robin keeps the shards
    balanced within one record).  Gathers then happen with *local* per-shard
    indices inside a :func:`jax.shard_map` (see :meth:`make_gather`), so a
    batch never funnels through a single device's HBM and each step's
    gather is collective-free.  The index-block builders
    (:meth:`epoch_indices`, :meth:`eval_index_blocks`,
    :meth:`elem_index_blocks`) emit device-aligned local indices: positions
    ``[d*k, (d+1)*k)`` of every (…, B) index row belong to device ``d``.

    The epoch shuffle in mesh mode is therefore *stratified*: each batch
    draws exactly ``B/D`` records from every device's shard (each record
    still appears exactly once per epoch).  This is the same statistical
    change multi-host data parallelism already makes (per-host record
    strides) and is standard practice for sharded caches; the reference's
    tf.data pipeline streamed per host for the same reason (reference
    ``src/mfp/mfp/data/spec.py:219-251``).

    Multi-host note: shard records across hosts first
    (``DataLoader(num_hosts=..., host_id=...)``) and build one cache per
    host; mesh mode additionally requires a single-process mesh (a global
    cache over multi-host HBM would need cross-host gathers per step).
    """

    def __init__(self, loader: "DataLoader", mesh=None):
        import jax
        import jax.numpy as jnp

        records = [loader._record(i) for i in range(loader.num_records)]
        self.num_records = len(records)
        self.mesh = None
        self._gather_fn = None  # memoized (shard_map closures are costly)
        # Device-resident eval index blocks, memoized per (kind, chunk[, S]).
        # Re-uploading them per evaluate_task call costs ~35 ms of relay
        # round trip EACH on this platform — against a ~110 ms task total
        # that was the r3 eval regression (19.0k -> 12.6k docs/s).
        self._device_blocks: dict = {}
        if mesh is not None:
            from ..parallel import mesh as mesh_lib

            if jax.process_count() > 1:
                raise ValueError(
                    "mesh-sharded DeviceDataCache is single-process; "
                    "multi-process runs stream per-host batches instead"
                )
            D = mesh.shape[mesh_lib.DATA_AXIS]
            if D > 1:
                self.mesh = mesh
                self.data_axis_size = D
                # Balanced round-robin shard assignment; pad the tail of
                # each shard by repeating the last record (zero-weighted by
                # the index-block builders).
                self.shard_size = -(-len(records) // D)
                self.local_counts = np.array(
                    [
                        sum(1 for i in range(self.shard_size) if i * D + d < len(records))
                        for d in range(D)
                    ],
                    dtype=np.int64,
                )
                order = [
                    min(i * D + d, len(records) - 1)
                    for d in range(D)
                    for i in range(self.shard_size)
                ]
                records = [records[g] for g in order]
        if self.mesh is None:
            self.data_axis_size = 1
            self.shard_size = self.num_records
            self.local_counts = np.array([self.num_records], dtype=np.int64)

        # Host copy of per-record lengths (shard order) so the elem-protocol
        # index builder can enumerate only REAL (record, element) replicas.
        self._host_lengths = (
            np.array(
                [int(np.asarray(r["length"]).reshape(-1)[0]) for r in records],
                dtype=np.int64,
            )
            if records and "length" in records[0]
            else None
        )

        self.data = {}
        for k, v in records[0].items():
            if isinstance(v, np.ndarray) and v.dtype == object:
                continue  # strings stay on host
            stacked = np.stack([r[k] for r in records], axis=0)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                from ..parallel.mesh import DATA_AXIS

                sharding = NamedSharding(self.mesh, PartitionSpec(DATA_AXIS))
                self.data[k] = jax.device_put(stacked, sharding)
            else:
                self.data[k] = jax.device_put(jnp.asarray(stacked))

    def make_gather(self):
        """jit-friendly ``(data, idx) -> batch`` closure-free gather.

        Non-mesh: a plain global ``take``.  Mesh: a :func:`jax.shard_map`
        over the ``data`` axis — each device slices its OWN shard with its
        block of local indices, so the batch materializes already sharded
        ``P('data')`` with zero communication.
        """
        if self._gather_fn is None:
            self._gather_fn = (
                gather_batch if self.mesh is None
                else make_sharded_gather(self.mesh)
            )
        return self._gather_fn

    def gather(self, indices):
        """Batch = dataset[indices], computed on device."""
        return self.make_gather()(self.data, indices)

    def epoch_indices(self, batch_size: int, seed: int, epoch: int):
        """Host-side permutation -> per-step (B,) index arrays (tiny)."""
        rng = np.random.default_rng(seed + epoch)
        if self.mesh is None:
            order = rng.permutation(self.num_records)
            stop = self.num_records - self.num_records % batch_size
            for start in range(0, stop, batch_size):
                yield order[start : start + batch_size].astype(np.int32)
            return
        D = self.data_axis_size
        assert batch_size % D == 0, (batch_size, D)
        per_dev = batch_size // D
        # floor(N/B)·(B/D) <= floor(N/D) <= min(local_counts): every device
        # can supply the full epoch from real (non-padding) records.
        steps = self.num_records // batch_size
        cols = [
            rng.permutation(int(c))[: steps * per_dev].reshape(steps, per_dev)
            for c in self.local_counts
        ]
        block = np.concatenate(cols, axis=1).astype(np.int32)
        for t in range(steps):
            yield block[t]

    def eval_index_blocks(self, chunk: int):
        """(T, chunk) local index + (T, chunk) weight blocks covering every
        real record exactly once (weights zero padding rows).  Evaluation
        sums are order-invariant, so mesh mode walks each shard in place."""
        D = self.data_axis_size
        assert chunk % D == 0, (chunk, D)
        per_dev = chunk // D
        T = -(-self.shard_size // per_dev)
        rows = np.arange(T * per_dev)
        idx = np.minimum(rows, self.shard_size - 1).astype(np.int32)
        idx = np.tile(idx.reshape(T, 1, per_dev), (1, D, 1))
        w = (rows.reshape(T, 1, per_dev) < self.local_counts.reshape(1, D, 1))
        return (
            idx.reshape(T, chunk),
            w.astype(np.float32).reshape(T, chunk),
        )

    def device_eval_blocks(self, chunk: int):
        """Device-resident ``(blk, w, gid)`` triple for the bundled eval
        scan, uploaded ONCE per (cache, chunk) and reused across every
        subsequent task run (``all_feat`` runs 4-5 tasks over one cache).

        ``gid`` carries global record ids for per-record mask draws (the
        ``random`` task): a sharded cache stores record ``g`` at
        (device ``g % D``, local slot ``g // D``), so
        ``gid = local*D + device`` recovers it.
        """
        import jax.numpy as jnp

        key = ("eval", chunk)
        if key not in self._device_blocks:
            blk, w = self.eval_index_blocks(chunk)
            D = self.data_axis_size
            if self.mesh is not None:
                dev = (np.arange(chunk) // (chunk // D)).astype(np.int32)
                gid = blk * D + dev[None, :]
            else:
                gid = blk
            self._device_blocks[key] = (
                jnp.asarray(blk), jnp.asarray(w), jnp.asarray(gid)
            )
        return self._device_blocks[key]

    def device_elem_blocks(self, chunk: int, seq_len: int):
        """Device-resident ``(doc, elem, w)`` blocks for the ``elem``
        protocol, uploaded once per (cache, chunk, seq_len)."""
        import jax.numpy as jnp

        key = ("elem", chunk, seq_len)
        if key not in self._device_blocks:
            doc, elem, w = self.elem_index_blocks(chunk, seq_len)
            self._device_blocks[key] = (
                jnp.asarray(doc), jnp.asarray(elem), jnp.asarray(w),
            )
        return self._device_blocks[key]

    def elem_index_blocks(self, chunk: int, seq_len: int):
        """Per-(record, element) replica blocks for ``elem`` evaluation.

        Returns ``(doc_idx, elem_idx, weight)`` each of shape (T, chunk):
        local record index, element index, and the replica weight.  Only
        REAL elements get replicas (r4): evaluation sums are
        order-invariant and a padding-element replica contributes an exact
        0/0 (reference eval.py:66-90 skips those rows the same way), so
        enumerating pairs from the host-known lengths instead of the full
        ``shard_size x seq_len`` grid cuts the forward-pass count by
        ``N*S / sum(length)`` — ~3-5x at crello shapes.  Tail slots (and
        mesh devices holding fewer real replicas) are padded with
        zero-weight (doc 0, elem 0) entries; the on-device weight is still
        ANDed with the gathered length mask, so a stale host length can
        only zero a row, never add one.
        """
        D = self.data_axis_size
        assert chunk % D == 0, (chunk, D)
        per_dev = chunk // D
        slots = np.arange(self.shard_size)
        if self._host_lengths is None:
            # No length column: every (record, element) pair is a replica.
            lengths = np.full((D, self.shard_size), seq_len, dtype=np.int64)
        else:
            # The length column is ZERO-based (vocab-looked-up): a record
            # with length value L has L+1 real elements (cf. get_seq_mask).
            lengths = np.clip(
                self._host_lengths.reshape(D, self.shard_size) + 1, 0, seq_len
            )
        # Padding records (repeated shard tail) emit no replicas at all.
        lengths = lengths * (slots[None, :] < self.local_counts[:, None])
        counts = lengths.sum(axis=1)
        T = max(1, int(-(-counts.max() // per_dev)))
        doc = np.zeros((D, T * per_dev), np.int32)
        elem = np.zeros((D, T * per_dev), np.int32)
        w = np.zeros((D, T * per_dev), np.float32)
        for d in range(D):
            n = int(counts[d])
            dd = np.repeat(slots, lengths[d]).astype(np.int32)
            starts = np.cumsum(lengths[d]) - lengths[d]
            doc[d, :n] = dd
            elem[d, :n] = (np.arange(n) - starts[dd]).astype(np.int32)
            w[d, :n] = 1.0

        def blk(a):  # (D, T*per_dev) -> (T, chunk), device-aligned columns
            return a.reshape(D, T, per_dev).transpose(1, 0, 2).reshape(T, chunk)

        return blk(doc), blk(elem), blk(w)


def make_sharded_gather(mesh):
    """``(data, idx) -> batch`` where ``data`` leaves are sharded P('data')
    on their record axis and ``idx`` carries device-aligned LOCAL indices
    (block ``d`` of the index vector indexes device ``d``'s shard).  The
    slice runs entirely shard-locally; the output batch is sharded
    P('data') on its leading axis."""
    import jax
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    return jax.shard_map(
        lambda data, idx: jax.tree.map(lambda v: v[idx], data),
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
    )


def gather_batch(data, indices):
    """``{k: dataset_array}`` + (B,) indices -> batch dict (jit-friendly).

    Keep the dataset dict an EXPLICIT argument of any jit-compiled caller —
    a closure capture can end up embedded in the serialized HLO module
    (observed: a 2048-doc split blew past the remote-compile request size
    limit), while arguments are always runtime parameters.
    """
    import jax.numpy as jnp

    idx = jnp.asarray(indices)
    return {k: jnp.take(v, idx, axis=0) for k, v in data.items()}


def split_device_batch(batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Drop host-only entries (strings, counters) before device transfer."""
    out = {}
    for k, v in batch.items():
        if k == NUM_VALID_KEY:
            continue
        if isinstance(v, np.ndarray) and v.dtype == object:
            continue
        out[k] = v
    return out
