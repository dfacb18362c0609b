"""SPMD sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdm_tpu.data import split_device_batch
from flexdm_tpu.models import MFPModel, make_task_config
from flexdm_tpu.parallel import mesh as mesh_lib
from flexdm_tpu.train import (
    TrainState,
    init_params,
    make_optimizer,
    make_train_step,
    make_val_step,
)


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


@pytest.fixture(scope="module")
def setup(request):
    spec = request.getfixturevalue("rico_spec")
    batch = split_device_batch(next(iter(spec.make_dataset("train", batch_size=16))))
    model = MFPModel(
        spec.schema, latent_dim=32, num_blocks=1, num_heads=4,
        attention_impl="xla",
    )
    params = init_params(model, batch, seed=0)
    tc = make_task_config(spec.schema, "random")
    tx = make_optimizer(1e-3)
    state = TrainState(params=params, opt_state=tx.init(params), step=jnp.asarray(0))
    return spec, model, tc, tx, state, batch


def _run_steps(model, tc, tx, state, batch, mesh, n=3):
    step_fn = jax.jit(make_train_step(model, tc, tx, l2=1e-2))
    if mesh is not None:
        state = mesh_lib.shard_state(state, mesh)
        batch = mesh_lib.shard_batch(batch, mesh)
    key = jax.random.PRNGKey(0)
    metrics = None
    for i in range(n):
        state, metrics = step_fn(state, batch, jax.random.fold_in(key, i))
    return state, metrics


@pytest.mark.slow
def test_data_parallel_matches_single_device(setup):
    """8-way sharded training must match single-device training.

    Uses SGD so the comparison is linear in the gradients — Adam would
    amplify reduction-order float noise on near-zero-gradient leaves to
    ~lr scale and mask what is being tested (the SPMD all-reduce).
    """
    import optax

    spec, model, tc, _, state, batch = setup
    sgd = optax.sgd(1e-2)
    state = TrainState(
        params=state.params, opt_state=sgd.init(state.params), step=jnp.asarray(0)
    )
    mesh8 = mesh_lib.make_mesh(8)
    mesh1 = mesh_lib.make_mesh(1)

    state8, metrics8 = _run_steps(model, tc, sgd, state, batch, mesh8)
    state1, metrics1 = _run_steps(model, tc, sgd, state, batch, mesh1)

    np.testing.assert_allclose(
        float(metrics8["loss"]), float(metrics1["loss"]), rtol=1e-4
    )
    l8 = jax.tree.leaves(jax.device_get(state8.params))
    l1 = jax.tree.leaves(jax.device_get(state1.params))
    for a, b in zip(l8, l1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)


def test_batch_is_actually_sharded(setup):
    spec, model, tc, tx, state, batch = setup
    mesh = mesh_lib.make_mesh(8)
    sharded = mesh_lib.shard_batch(batch, mesh)
    x = sharded["left"]
    assert len(x.sharding.device_set) == 8
    # each device holds B/8 of the batch
    shard = x.addressable_shards[0]
    assert shard.data.shape[0] == x.shape[0] // 8


def test_indivisible_batch_places_replicated(setup):
    # --batch_size 6 on an 8-chip host must lose data parallelism for the
    # batch, not crash with a pjit divisibility error (eval/train math is
    # placement-invariant).  Regression: trainer.evaluate_split crashed in
    # shard_global_batch with B=6 on the 8-device virtual mesh.
    spec, model, tc, tx, state, batch = setup
    mesh = mesh_lib.make_mesh(8)
    small = jax.tree.map(lambda x: np.asarray(x)[:6], batch)
    for place in (mesh_lib.shard_batch, mesh_lib.shard_global_batch):
        placed = place(small, mesh)
        x = placed["left"]
        assert x.shape[0] == 6
        # replicated: every device holds the full array
        assert x.addressable_shards[0].data.shape == x.shape
    # divisible arrays in the same tree still shard normally
    mixed = mesh_lib.shard_batch(batch, mesh)
    assert mixed["left"].addressable_shards[0].data.shape[0] == 2


def test_params_replicated(setup):
    spec, model, tc, tx, state, batch = setup
    mesh = mesh_lib.make_mesh(8)
    rep = mesh_lib.replicate(state.params, mesh)
    leaf = jax.tree.leaves(rep)[0]
    assert len(leaf.sharding.device_set) == 8
    assert leaf.addressable_shards[0].data.shape == leaf.shape


@pytest.mark.slow
def test_model_parallel_axis_accepted(setup):
    spec, model, tc, tx, state, batch = setup
    mesh = mesh_lib.make_mesh(8, model_parallel=2)
    assert mesh.shape[mesh_lib.DATA_AXIS] == 4
    assert mesh.shape[mesh_lib.MODEL_AXIS] == 2
    _, metrics = _run_steps(model, tc, tx, state, batch, mesh, n=1)
    assert np.isfinite(float(metrics["loss"]))


def test_val_step_on_mesh(setup):
    spec, model, tc, tx, state, batch = setup
    mesh = mesh_lib.make_mesh(8)
    val_fn, names = make_val_step(model, tc)
    val_step = jax.jit(val_fn)
    b = mesh_lib.shard_batch(batch, mesh)
    p = mesh_lib.replicate(state.params, mesh)
    w = jnp.ones((batch["length"].shape[0],), dtype=jnp.float32)
    stacked = val_step(p, b, jax.random.PRNGKey(0), w)
    metrics = dict(zip(names, np.asarray(stacked).tolist()))
    assert np.isfinite(metrics["total_score"])


def test_tensor_parallel_params_actually_sharded(setup):
    """model_parallel=2 must SPLIT parameters over the model axis (and the
    Adam moments with them), not merely replicate (VERDICT round 1 #3)."""
    spec, model, tc, tx, state, batch = setup
    mesh = mesh_lib.make_mesh(8, model_parallel=2)
    st = mesh_lib.shard_state(state, mesh)
    p = st.params["params"]

    q = p["blocks"]["seq2seq_0"]["attn"]["query"]["kernel"]
    assert q.addressable_shards[0].data.shape[-1] == q.shape[-1] // 2
    out = p["blocks"]["seq2seq_0"]["attn"]["out"]["kernel"]
    assert out.addressable_shards[0].data.shape[0] == out.shape[0] // 2
    mlp0 = p["blocks"]["seq2seq_0"]["mlp_0"]["kernel"]
    assert mlp0.addressable_shards[0].data.shape[-1] == mlp0.shape[-1] // 2
    mlp1 = p["blocks"]["seq2seq_0"]["mlp_1"]["kernel"]
    assert mlp1.addressable_shards[0].data.shape[0] == mlp1.shape[0] // 2
    # embedding tables split the feature axis
    emb = p["encoder"]["input_type"]
    assert emb.addressable_shards[0].data.shape[-1] == emb.shape[-1] // 2
    # LayerNorm stays replicated
    norm = p["blocks"]["seq2seq_0"]["norm1"]["scale"]
    assert norm.addressable_shards[0].data.shape == norm.shape

    # Adam moments mirror the parameter layout (optimizer memory shards too)
    leaves = jax.tree_util.tree_flatten_with_path(st.opt_state)[0]
    mu_q = [
        leaf for path, leaf in leaves
        if "mu" in str(path) and "query" in str(path) and "kernel" in str(path)
    ]
    assert mu_q, "could not locate Adam mu for the query kernel"
    assert mu_q[0].addressable_shards[0].data.shape[-1] == q.shape[-1] // 2


@pytest.mark.parametrize("model_parallel", [2, 4])
@pytest.mark.slow
def test_tensor_parallel_matches_data_parallel(setup, model_parallel):
    """Training under tensor parallelism must reproduce pure-DP results
    bit-close (same math, different layout).  mp=4 splits every head onto
    its own shard group (num_heads=4) — the deepest split this config
    supports."""
    import optax

    spec, model, tc, _, state, batch = setup
    sgd = optax.sgd(1e-2)
    state = TrainState(
        params=state.params, opt_state=sgd.init(state.params),
        step=jnp.asarray(0),
    )
    mesh_dp = mesh_lib.make_mesh(8)
    mesh_tp = mesh_lib.make_mesh(8, model_parallel=model_parallel)

    state_dp, metrics_dp = _run_steps(model, tc, sgd, state, batch, mesh_dp)
    state_tp, metrics_tp = _run_steps(model, tc, sgd, state, batch, mesh_tp)

    np.testing.assert_allclose(
        float(metrics_tp["loss"]), float(metrics_dp["loss"]), rtol=1e-4
    )
    for a, b in zip(
        jax.tree.leaves(jax.device_get(state_tp.params)),
        jax.tree.leaves(jax.device_get(state_dp.params)),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5
        )


def test_tensor_parallel_eval_matches(setup):
    """Eval scores are identical under tensor parallelism."""
    from flexdm_tpu.evaluation.harness import evaluate_task

    spec, model, tc, tx, state, batch = setup
    groups = spec.schema.attribute_groups
    ans1 = evaluate_task(
        model, state.params, spec.make_dataset("test", batch_size=16),
        "pos", ("pos", groups["pos"]),
    )
    mesh = mesh_lib.make_mesh(8, model_parallel=2)
    ans_tp = evaluate_task(
        model, mesh_lib.shard_params(state.params, mesh),
        spec.make_dataset("test", batch_size=16),
        "pos", ("pos", groups["pos"]), mesh=mesh,
    )
    for k in ans1:
        np.testing.assert_allclose(ans1[k], ans_tp[k], rtol=1e-5, err_msg=k)
