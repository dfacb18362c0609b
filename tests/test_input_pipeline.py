"""Prefetcher + device-resident dataset cache tests."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdm_tpu.data.pipeline import DeviceDataCache, Prefetcher


def test_prefetcher_preserves_order_and_items():
    items = list(range(20))
    out = list(Prefetcher(iter(items), depth=3))
    assert out == items


def test_prefetcher_transform_runs_in_worker():
    out = list(Prefetcher(iter([1, 2, 3]), transform=lambda x: x * 10))
    assert out == [10, 20, 30]


def test_prefetcher_propagates_errors():
    def gen():
        yield 1
        raise RuntimeError("boom")

    it = iter(Prefetcher(gen()))
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_prefetcher_overlaps_production():
    def slow_gen():
        for i in range(4):
            time.sleep(0.05)
            yield i

    pf = Prefetcher(slow_gen(), depth=2)
    time.sleep(0.15)  # let the worker fill the queue
    t0 = time.perf_counter()
    first_two = [next(iter_) for iter_ in [iter(pf)] for _ in range(2)]
    assert first_two == [0, 1]
    assert time.perf_counter() - t0 < 0.05  # served from the queue


def test_device_cache_matches_host_batches(crello_spec):
    loader = crello_spec.make_dataset("val", batch_size=8)
    cache = DeviceDataCache(loader)
    assert cache.num_records == loader.num_records
    # gather = the same records the loader would decode
    idx = np.asarray([3, 0, 7], np.int32)
    got = cache.gather(idx)
    for j, i in enumerate(idx):
        rec = loader._record(int(i))
        for k, v in got.items():
            np.testing.assert_allclose(
                np.asarray(v[j], np.float32),
                np.asarray(rec[k], np.float32),
                err_msg=k,
            )
    # strings excluded from device arrays
    assert "id" not in cache.data and "uuid" not in cache.data


def test_device_cache_epoch_indices_cover_split(crello_spec):
    loader = crello_spec.make_dataset("val", batch_size=8)
    cache = DeviceDataCache(loader)
    seen = []
    n_steps = 0
    for idx in cache.epoch_indices(8, seed=0, epoch=0):
        assert idx.shape == (8,)
        seen.extend(idx.tolist())
        n_steps += 1
    assert n_steps == cache.num_records // 8
    assert len(set(seen)) == len(seen)  # no repeats within an epoch
    # different epoch -> different order
    other = np.concatenate(list(cache.epoch_indices(8, seed=0, epoch=1)))
    assert not np.array_equal(np.asarray(seen), other)


def test_train_host_and_device_modes_agree(rico_dir, tmp_path):
    from flexdm_tpu.train import TrainConfig, train

    results = {}
    for mode in ("device", "host"):
        config = TrainConfig(
            dataset_name="rico", data_dir=rico_dir,
            job_dir=str(tmp_path / mode),
            latent_dim=16, num_blocks=1, num_heads=2, batch_size=16,
            num_epochs=2, validation_freq=2, attention_impl="xla",
            num_devices=1, seed=0, input_mode=mode,
        )
        results[mode] = train(config)
    # Both modes complete; losses are finite and in the same regime (batch
    # order differs between the modes, so exact trajectories won't match,
    # and 2 tiny epochs are too noisy to demand monotonic descent).
    for mode, res in results.items():
        losses = [h["loss"] for h in res["history"]]
        assert len(losses) == 2 and all(np.isfinite(l) for l in losses), mode
    assert (
        abs(results["device"]["history"][0]["loss"]
            - results["host"]["history"][0]["loss"])
        < 0.5 * results["host"]["history"][0]["loss"]
    )
