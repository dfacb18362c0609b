"""Model architecture tests: shapes, invariances, jit parity, training forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdm_tpu.data import split_device_batch
from flexdm_tpu.models import (
    MFPModel,
    forward_eval,
    forward_train,
    make_task_config,
)
from flexdm_tpu.models.masking import (
    get_initial_masks,
    get_seq_mask,
    preprocess_for_test,
)


@pytest.fixture(scope="module")
def crello_setup(request):
    spec = request.getfixturevalue("crello_spec")
    batch = split_device_batch(next(iter(spec.make_dataset("train", batch_size=4))))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    model = MFPModel(
        spec.schema, latent_dim=32, num_blocks=2, num_heads=4,
        attention_impl="xla",
    )
    seq_mask = get_seq_mask(batch["length"], spec.schema.max_length)
    masks = get_initial_masks(spec.schema, seq_mask)
    modified = preprocess_for_test(batch, spec.schema, masks)
    params = model.init({"params": jax.random.PRNGKey(0)}, modified)
    return spec, model, params, batch, masks


def test_output_shapes(crello_setup):
    spec, model, params, batch, masks = crello_setup
    out = forward_eval(model, params, batch, masks)
    schema = spec.schema
    S = schema.max_length
    assert out["type"].shape == (4, S, 1, schema["type"].input_dim)
    assert out["color"].shape == (4, S, 3, 16)
    assert out["image_embedding"].shape == (4, S, 512)
    assert out["length"].shape == (4, 1)  # canvas passthrough


def test_permutation_equivariance(crello_setup):
    """The default 'set' model has no positional embedding: permuting the
    valid elements must permute the outputs identically
    (reference encoder.py:41, 251-252)."""
    spec, model, params, batch, masks = crello_setup
    schema = spec.schema
    lengths = np.asarray(batch["length"][:, 0]) + 1
    n = int(lengths.min())
    if n < 2:
        pytest.skip("need at least 2 valid elements")
    perm = np.arange(schema.max_length)
    perm[0], perm[1] = 1, 0  # swap first two (valid for every sample)

    batch_p = dict(batch)
    for c in schema.modeled:
        if c.is_sequence:
            batch_p[c.name] = batch[c.name][:, perm]

    out = forward_eval(model, params, batch, masks)
    out_p = forward_eval(model, params, batch_p, {
        k: (v[:, perm] if v.ndim == 2 else v) for k, v in masks.items()
    })
    for c in schema.modeled:
        if c.is_sequence:
            np.testing.assert_allclose(
                np.asarray(out_p[c.name][:, :2]),
                np.asarray(out[c.name][:, perm[:2]]),
                rtol=2e-4,
                atol=2e-4,
            )


def test_masked_field_actually_hidden(crello_setup):
    """Changing a masked field's value must not change the model output."""
    spec, model, params, batch, masks = crello_setup
    schema = spec.schema
    seq_mask = get_seq_mask(batch["length"], schema.max_length)
    masks2 = dict(masks)
    masks2["left"] = seq_mask  # mask the whole left column

    batch_alt = dict(batch)
    batch_alt["left"] = (batch["left"] + 7) % 64  # different hidden values

    out1 = forward_eval(model, params, batch, masks2)
    out2 = forward_eval(model, params, batch_alt, masks2)
    np.testing.assert_allclose(
        np.asarray(out1["top"]), np.asarray(out2["top"]), atol=1e-6
    )


def test_jit_eager_parity(crello_setup):
    spec, model, params, batch, masks = crello_setup
    tc = make_task_config(spec.schema, "elem_pos_attr_img_txt")
    key = jax.random.PRNGKey(7)

    loss_e, metrics_e = forward_train(model, params, batch, key, tc, train=False)
    loss_j, metrics_j = jax.jit(
        lambda p, b, k: forward_train(model, p, b, k, tc, train=False)
    )(params, batch, key)
    np.testing.assert_allclose(float(loss_e), float(loss_j), rtol=1e-5)
    np.testing.assert_allclose(
        float(metrics_e["total_score"]), float(metrics_j["total_score"]), rtol=1e-5
    )


def test_dropout_changes_with_key_and_train_flag(crello_setup):
    spec, model, params, batch, masks = crello_setup
    tc = make_task_config(spec.schema, "random")
    k = jax.random.PRNGKey(0)
    l1, _ = forward_train(model, params, batch, k, tc, train=True)
    l2, _ = forward_train(model, params, batch, k, tc, train=True)
    l3, _ = forward_train(model, params, batch, jax.random.PRNGKey(1), tc, train=True)
    assert float(l1) == float(l2)  # same key -> deterministic
    assert float(l1) != float(l3)  # different key -> different masking/dropout


def test_flat_seq_type_runs(crello_spec):
    spec = crello_spec
    batch = split_device_batch(next(iter(spec.make_dataset("train", batch_size=2))))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    model = MFPModel(
        spec.schema, latent_dim=32, num_blocks=1, num_heads=4,
        seq_type="flat", input_dtype="shuffled_set", attention_impl="xla",
    )
    seq_mask = get_seq_mask(batch["length"], spec.schema.max_length)
    masks = get_initial_masks(spec.schema, seq_mask)
    modified = preprocess_for_test(batch, spec.schema, masks)
    params = model.init({"params": jax.random.PRNGKey(0)}, modified)
    out = model.apply(params, modified)
    assert out["type"].shape[0] == 2
    assert out["image_embedding"].shape == (2, spec.schema.max_length, 512)


def test_context_id_runs(crello_spec):
    spec = crello_spec
    batch = split_device_batch(next(iter(spec.make_dataset("train", batch_size=2))))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    model = MFPModel(
        spec.schema, latent_dim=32, num_blocks=1, num_heads=4,
        context="id", attention_impl="xla",
    )
    seq_mask = get_seq_mask(batch["length"], spec.schema.max_length)
    masks = get_initial_masks(spec.schema, seq_mask)
    modified = preprocess_for_test(
        batch, spec.schema, masks, tasks=jnp.asarray([3, 3])
    )
    params = model.init({"params": jax.random.PRNGKey(0)}, modified)
    out = model.apply(params, modified)
    assert out["type"].shape == (2, spec.schema.max_length, 1, spec.schema["type"].input_dim)


@pytest.mark.slow
def test_remat_gradients_match(crello_setup):
    """nn.remat over blocks must not change gradients (same params tree)."""
    spec, model, params, batch, masks = crello_setup
    tc = make_task_config(spec.schema, "random")
    model_r = MFPModel(
        spec.schema, latent_dim=32, num_blocks=2, num_heads=4,
        attention_impl="xla", remat=True,
    )
    key = jax.random.PRNGKey(3)
    g = jax.grad(lambda p: forward_train(model, p, batch, key, tc, train=False)[0])(params)
    gr = jax.grad(lambda p: forward_train(model_r, p, batch, key, tc, train=False)[0])(params)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_maskgit_only_commits_masked_fields(crello_setup):
    spec, model, params, batch, _ = crello_setup
    schema = spec.schema
    seq_mask = get_seq_mask(batch["length"], schema.max_length)
    masks = get_initial_masks(schema, seq_mask)
    masks["left"] = seq_mask
    masks["top"] = seq_mask
    out = forward_eval(model, params, batch, masks, num_iter=3)
    # unmasked categorical fields must be exact one-hot ground truth
    onehot = jax.nn.one_hot(batch["width"], 64)
    np.testing.assert_allclose(np.asarray(out["width"]), np.asarray(onehot))
    assert np.all(np.isfinite(np.asarray(out["left"])))
