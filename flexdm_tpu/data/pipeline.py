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
    a single chip's HBM, so the fastest input pipeline is no host pipeline:
    upload every record once, then each train step gathers its batch with a
    device-side ``take`` on a (B,) index vector — the only per-step
    host->device traffic is the indices.

    Multi-host note: shard records across hosts first
    (``DataLoader(num_hosts=..., host_id=...)``) and build one cache per
    host.
    """

    def __init__(self, loader: "DataLoader"):
        import jax
        import jax.numpy as jnp

        records = [loader._record(i) for i in range(loader.num_records)]
        self.num_records = len(records)
        self.data = {}
        for k, v in records[0].items():
            if isinstance(v, np.ndarray) and v.dtype == object:
                continue  # strings stay on host
            stacked = np.stack([r[k] for r in records], axis=0)
            self.data[k] = jax.device_put(jnp.asarray(stacked))

    def gather(self, indices):
        """Batch = dataset[indices], computed on device."""
        return gather_batch(self.data, indices)

    def epoch_indices(self, batch_size: int, seed: int, epoch: int):
        """Host-side permutation -> per-step (B,) index arrays (tiny)."""
        rng = np.random.default_rng(seed + epoch)
        order = rng.permutation(self.num_records)
        stop = self.num_records - self.num_records % batch_size
        for start in range(0, stop, batch_size):
            yield order[start : start + batch_size].astype(np.int32)


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
