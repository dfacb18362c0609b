"""Mesh-sharded DeviceDataCache: placement, gather exactness, eval parity.

VERDICT r2 #1/#4: the resident data path must span the mesh's ``data`` axis
(not funnel through chip 0) for both the trainer and the eval harness —
including ``elem``, the most expensive protocol.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdm_tpu.data.pipeline import DeviceDataCache
from flexdm_tpu.models import MFPModel, make_task_config
from flexdm_tpu.parallel import mesh as mesh_lib
from flexdm_tpu.train import (
    TrainState,
    init_params,
    make_optimizer,
    make_train_step,
)
from flexdm_tpu.train.trainer import make_scan_steps


@pytest.fixture(scope="module")
def setup(request):
    spec = request.getfixturevalue("rico_spec")
    loader = spec.make_dataset("train", batch_size=16)
    from flexdm_tpu.data import split_device_batch

    batch = split_device_batch(next(iter(loader)))
    model = MFPModel(
        spec.schema, latent_dim=32, num_blocks=1, num_heads=4,
        attention_impl="xla",
    )
    params = init_params(model, batch, seed=0)
    return spec, loader, model, params


def test_cache_spans_mesh(setup):
    spec, loader, model, params = setup
    mesh = mesh_lib.make_mesh(8)
    cache = DeviceDataCache(loader, mesh=mesh)
    for k, v in cache.data.items():
        assert len(v.sharding.device_set) == 8, k
        # each device holds 1/8 of the (padded) record axis
        assert v.addressable_shards[0].data.shape[0] == cache.shard_size, k
    assert int(cache.local_counts.sum()) == cache.num_records


def test_sharded_gather_bit_exact(setup):
    """Local-index gather must reproduce the exact host records."""
    spec, loader, model, params = setup
    mesh = mesh_lib.make_mesh(8)
    cache = DeviceDataCache(loader, mesh=mesh)
    D = cache.data_axis_size
    rng = np.random.default_rng(0)
    per_dev = 2
    # Device-aligned local indices, each within its shard's REAL records.
    idx = np.concatenate(
        [rng.integers(0, cache.local_counts[d], per_dev) for d in range(D)]
    ).astype(np.int32)
    batch = jax.jit(cache.make_gather())(cache.data, jnp.asarray(idx))
    # Local index i on device d is original record i*D + d (round-robin).
    for row in range(D * per_dev):
        d, i = row // per_dev, idx[row]
        rec = loader._record(int(i) * D + d)
        for k, v in batch.items():
            np.testing.assert_array_equal(np.asarray(v[row]), rec[k], err_msg=k)
    # The gathered batch lands sharded over the data axis, not on one chip.
    assert len(batch["length"].sharding.device_set) == 8


def test_epoch_indices_cover_each_record_once(setup):
    spec, loader, model, params = setup
    mesh = mesh_lib.make_mesh(8)
    cache = DeviceDataCache(loader, mesh=mesh)
    D, B = cache.data_axis_size, 16
    per_dev = B // D
    seen = set()
    steps = list(cache.epoch_indices(B, seed=0, epoch=3))
    assert len(steps) == cache.num_records // B
    for blk in steps:
        for row, i in enumerate(blk):
            d = row // per_dev
            g = int(i) * D + d
            assert g < cache.num_records  # never a padding row
            assert g not in seen  # each record at most once per epoch
            seen.add(g)
    assert len(seen) == len(steps) * B


@pytest.mark.slow
def test_train_scan_on_sharded_cache(setup):
    """The trainer's bundled scan runs on a sharded cache with finite loss."""
    spec, loader, model, params = setup
    mesh = mesh_lib.make_mesh(8)
    cache = DeviceDataCache(loader, mesh=mesh)
    tc = make_task_config(spec.schema, "random")
    tx = make_optimizer(1e-3)
    state = TrainState(
        params=mesh_lib.shard_state(params, mesh),
        opt_state=tx.init(params),
        step=jnp.asarray(0),
    )
    base_step = make_train_step(model, tc, tx, l2=1e-2)
    scan_fn = jax.jit(make_scan_steps(base_step, mesh, cache.make_gather()))
    block = np.stack(list(cache.epoch_indices(16, seed=0, epoch=0)))
    state, metrics = scan_fn(
        state, cache.data, jnp.asarray(block), jax.random.PRNGKey(0)
    )
    assert np.isfinite(float(metrics["loss"]))
    assert bool(metrics["finite"])
    assert int(state.step) == block.shape[0]


@pytest.mark.slow
def test_train_scan_unsharded_cache_on_mesh(setup):
    """The trainer's fallback for a batch that doesn't divide the data axis:
    an UNSHARDED cache on a multi-device mesh must still run the scan (with
    the default gather's batch-sharding constraint) and produce the same
    loss as the same steps on a single-device mesh."""
    spec, loader, model, params = setup
    tc = make_task_config(spec.schema, "random")
    tx = make_optimizer(1e-3)

    def run(mesh, B):
        cache = DeviceDataCache(loader)  # mesh=None: unsharded
        state = TrainState(
            params=mesh_lib.shard_state(params, mesh),
            opt_state=tx.init(params),
            step=jnp.asarray(0),
        )
        base_step = make_train_step(model, tc, tx, l2=1e-2)
        # gather_fn=None is what the trainer passes for an unsharded cache.
        scan_fn = jax.jit(make_scan_steps(base_step, mesh, None))
        block = np.stack(list(cache.epoch_indices(B, seed=0, epoch=0)))
        state, metrics = scan_fn(
            state, cache.data, jnp.asarray(block), jax.random.PRNGKey(0)
        )
        return float(metrics["loss"])

    B = 12  # 12 % 8 != 0 -> the trainer would leave this cache unsharded
    loss8 = run(mesh_lib.make_mesh(8), B)
    loss1 = run(mesh_lib.make_mesh(1), B)
    assert np.isfinite(loss8)
    np.testing.assert_allclose(loss8, loss1, rtol=2e-5)


@pytest.mark.parametrize("task_mode", ["pos", "attr", "elem"])
@pytest.mark.slow
def test_eval_scores_match_single_device(setup, task_mode):
    """Deterministic-mask tasks must score identically on a sharded cache
    (the num/den sums are order- and sharding-invariant)."""
    from flexdm_tpu.evaluation.harness import evaluate_task

    spec, loader, model, params = setup
    groups = spec.schema.attribute_groups
    group = None if task_mode == "elem" else (task_mode, groups[task_mode])

    ans1 = evaluate_task(
        model, params, spec.make_dataset("test", batch_size=16),
        task_mode, group, elem_chunk=64,
    )
    mesh = mesh_lib.make_mesh(8)
    ans8 = evaluate_task(
        model, mesh_lib.shard_params(params, mesh),
        spec.make_dataset("test", batch_size=16),
        task_mode, group, elem_chunk=64, mesh=mesh,
    )
    assert set(ans1) == set(ans8)
    for k in ans1:
        np.testing.assert_allclose(ans1[k], ans8[k], rtol=2e-5, err_msg=k)


@pytest.mark.slow
def test_random_eval_invariant_to_mesh_and_path(setup):
    """'random'-task scores are a function of (seed, record identity) only:
    per-record mask draws make the resident 8-device, resident 1-device,
    and streaming paths — at different batch sizes — score identically."""
    from flexdm_tpu.evaluation.harness import evaluate_task

    spec, loader, model, params = setup
    mesh = mesh_lib.make_mesh(8)
    ans8 = evaluate_task(
        model, mesh_lib.shard_params(params, mesh),
        spec.make_dataset("test", batch_size=16),
        "random", None, mesh=mesh,
    )
    assert ans8 and all(np.isfinite(v) for v in ans8.values())
    ans1 = evaluate_task(
        model, params, spec.make_dataset("test", batch_size=16),
        "random", None,
    )
    ans_stream = evaluate_task(
        model, params, spec.make_dataset("test", batch_size=12),
        "random", None, resident=False,
    )
    for k in ans1:
        np.testing.assert_allclose(ans8[k], ans1[k], rtol=2e-5, err_msg=k)
        np.testing.assert_allclose(
            ans_stream[k], ans1[k], rtol=2e-5, err_msg=k
        )


def test_cache_rejects_multiprocess(setup, monkeypatch):
    spec, loader, model, params = setup
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="single-process"):
        DeviceDataCache(loader, mesh=mesh_lib.make_mesh(8))


@pytest.mark.slow
def test_resident_autoreg_elem_matches_streaming(setup):
    """The resident scan's autoreg elem branch (reorganize-on-gathered-sub)
    must reproduce the independent streaming implementation
    (make_elem_step(autoreg=True)) exactly."""
    from collections import defaultdict

    import jax.numpy as jnp

    from flexdm_tpu.data.pipeline import DeviceDataCache
    from flexdm_tpu.evaluation import harness as H

    spec, loader, model, params = setup
    schema = spec.schema
    S = schema.max_length
    test_loader = spec.make_dataset("test", batch_size=16)

    # Streaming reference: jitted elem step with autoreg reordering.
    step, names = H.make_elem_step(
        model, num_iter=1, sort=False, task_id=None, autoreg=True
    )
    total = defaultdict(float)
    for batch, weight, _ids, _lens in H._batches(
        spec.make_dataset("test", batch_size=16)
    ):
        n = batch["length"].shape[0] * S
        for start in range(0, n, 64):
            idx = jnp.arange(start, start + 64, dtype=jnp.int32)
            H._accumulate(total, names, step(params, batch, idx, weight))

    # Resident path with autoreg=True.
    cache = DeviceDataCache(test_loader)
    doc, elem, w = cache.elem_index_blocks(64, S)
    xs = (jnp.asarray(doc), jnp.asarray(elem), jnp.asarray(w))
    scan_fn, names_r, _ = H._resident_scan(
        model, "elem", None, 1, False, None, True, None, False
    )
    vals = np.asarray(scan_fn(params, cache.data, xs, jax.random.PRNGKey(0)))
    resident = dict(zip(names_r, vals.tolist()))

    for k in names_r:
        np.testing.assert_allclose(resident[k], total[k], rtol=1e-4, err_msg=k)


@pytest.mark.parametrize("num_devices", [1, 8])
def test_elem_blocks_enumerate_exactly_real_elements(setup, num_devices):
    """r4: elem replicas cover each REAL (record, element) pair exactly
    once (length is zero-based: L+1 real elements), nothing else gets
    weight, and mesh blocks stay device-aligned."""
    spec, loader, model, params = setup
    mesh = mesh_lib.make_mesh(8) if num_devices == 8 else None
    cache = DeviceDataCache(loader, mesh=mesh)
    S = spec.schema.max_length
    D = cache.data_axis_size
    chunk = 16
    doc, elem, w = cache.elem_index_blocks(chunk, S)
    assert doc.shape == elem.shape == w.shape
    assert doc.shape[1] == chunk
    per_dev = chunk // D
    seen = set()
    for t in range(doc.shape[0]):
        for row in range(chunk):
            d = row // per_dev
            if w[t, row] == 0.0:
                continue
            g = int(doc[t, row]) * D + d if D > 1 else int(doc[t, row])
            assert g < cache.num_records
            pair = (g, int(elem[t, row]))
            assert pair not in seen  # exactly once
            seen.add(pair)
    expected = set()
    for g in range(loader.num_records):
        n = int(np.asarray(loader._record(g)["length"]).reshape(-1)[0]) + 1
        for e in range(min(n, S)):
            expected.add((g, e))
    assert seen == expected


def test_elem_streaming_matches_resident(setup):
    """r4: the streaming elem branch enumerates only real replicas from
    host lengths; scores must match the resident scan exactly (both paths
    dropped padding replicas that contribute 0/0)."""
    from flexdm_tpu.evaluation.harness import evaluate_task

    spec, loader, model, params = setup
    ans_res = evaluate_task(
        model, params, spec.make_dataset("test", batch_size=16),
        "elem", None, elem_chunk=64,
    )
    ans_stream = evaluate_task(
        model, params, spec.make_dataset("test", batch_size=12),
        "elem", None, elem_chunk=64, resident=False,
    )
    assert set(ans_res) == set(ans_stream) and ans_res
    for k in ans_res:
        np.testing.assert_allclose(
            ans_stream[k], ans_res[k], rtol=2e-5, err_msg=k
        )
