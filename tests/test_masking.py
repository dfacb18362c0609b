"""Masking/task-layer unit tests against hand-computed expectations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdm_tpu.data.schema import (
    CATEGORICAL,
    MASK_VALUE,
    NULL_VALUE,
    NUMERICAL,
    ColumnSpec,
    LossCondition,
    Schema,
)
from flexdm_tpu.models import masking as M


def tiny_schema(max_length=6):
    """Small crello-like schema: type + left + emb(4) with loss_condition."""
    cols = (
        ColumnSpec("length", CATEGORICAL, (1,), False, input_dim=max_length),
        ColumnSpec("type", CATEGORICAL, (1,), True, input_dim=3, primary_label=0),
        ColumnSpec("left", CATEGORICAL, (1,), True, input_dim=8),
        ColumnSpec("width", CATEGORICAL, (1,), True, input_dim=8),
        ColumnSpec("top", CATEGORICAL, (1,), True, input_dim=8),
        ColumnSpec("height", CATEGORICAL, (1,), True, input_dim=8),
        ColumnSpec(
            "emb",
            NUMERICAL,
            (4,),
            True,
            loss_condition=LossCondition("type", (False, True, False)),
        ),
    )
    return Schema("crello", cols, max_length=max_length)


def tiny_inputs(B=4, schema=None, lengths=(0, 2, 5, 3)):
    schema = schema or tiny_schema()
    S = schema.max_length
    rng = np.random.default_rng(0)
    x = {
        "length": jnp.asarray(np.array(lengths)[:, None], jnp.int32),
        "type": jnp.asarray(rng.integers(0, 3, (B, S, 1)), jnp.int32),
        "left": jnp.asarray(rng.integers(0, 8, (B, S, 1)), jnp.int32),
        "width": jnp.asarray(rng.integers(0, 8, (B, S, 1)), jnp.int32),
        "top": jnp.asarray(rng.integers(0, 8, (B, S, 1)), jnp.int32),
        "height": jnp.asarray(rng.integers(0, 8, (B, S, 1)), jnp.int32),
        "emb": jnp.asarray(rng.normal(size=(B, S, 4)), jnp.float32),
    }
    return x


def test_get_seq_mask_zero_based():
    m = M.get_seq_mask(jnp.asarray([[0], [2]]), 5)
    np.testing.assert_array_equal(
        np.asarray(m),
        [[True, False, False, False, False], [True, True, True, False, False]],
    )


def test_get_seq_mask_from_logits():
    logits = jnp.asarray([[[0.1, 5.0, 0.0]]])[:, 0]  # (1, 3) argmax 1
    m = M.get_seq_mask(logits, 4, from_logits=True)
    np.testing.assert_array_equal(np.asarray(m), [[True, True, False, False]])


def test_apply_token_categorical():
    schema = tiny_schema()
    col = schema["left"]
    x = jnp.zeros((2, 6, 1), jnp.int32) + 3
    mask = jnp.zeros((2, 6), bool).at[0, 1].set(True)
    y = M.apply_token(x, col, mask, "masked")
    assert int(y[0, 1, 0]) == 8 and int(y[0, 0, 0]) == 3
    y = M.apply_token(x, col, mask, "unused")
    assert int(y[0, 1, 0]) == 9
    y = M.apply_token(x, col, mask, "random", jax.random.PRNGKey(0))
    assert 0 <= int(y[0, 1, 0]) < 8


def test_apply_token_numerical():
    schema = tiny_schema()
    col = schema["emb"]
    x = jnp.ones((1, 6, 4))
    mask = jnp.zeros((1, 6), bool).at[0, 2].set(True)
    y = M.apply_token(x, col, mask, "masked")
    assert np.all(np.asarray(y[0, 2]) == MASK_VALUE)
    y = M.apply_token(x, col, mask, "unused")
    assert np.all(np.asarray(y[0, 2]) == NULL_VALUE)
    assert np.all(np.asarray(y[0, 0]) == 1.0)


def test_filter_padding_nulls_padding_and_invalid():
    schema = tiny_schema()
    x = tiny_inputs(schema=schema)
    seq_mask = M.get_seq_mask(x["length"], schema.max_length)
    out = M.filter_padding(x, schema, seq_mask)
    # padded slots nulled in every sequence column
    assert int(out["left"][0, 3, 0]) == schema["left"].null_token_id
    assert np.all(np.asarray(out["emb"][0, 3]) == NULL_VALUE)
    # emb invalid wherever type != 1 (loss_condition), even on valid slots
    t = np.asarray(x["type"][..., 0])
    emb = np.asarray(out["emb"])
    sm = np.asarray(seq_mask)
    for b in range(4):
        for s in range(schema.max_length):
            if sm[b, s] and t[b, s] != 1:
                assert np.all(emb[b, s] == NULL_VALUE)
            if sm[b, s] and t[b, s] == 1:
                np.testing.assert_allclose(emb[b, s], np.asarray(x["emb"])[b, s])


def test_random_masking_statistics():
    schema = tiny_schema(max_length=32)
    B, S = 64, 32
    rng = np.random.default_rng(0)
    x = {
        "length": jnp.full((B, 1), S - 1, jnp.int32),
        "type": jnp.asarray(rng.integers(0, 3, (B, S, 1)), jnp.int32),
        "left": jnp.asarray(rng.integers(0, 8, (B, S, 1)), jnp.int32),
        "width": jnp.asarray(rng.integers(0, 8, (B, S, 1)), jnp.int32),
        "top": jnp.asarray(rng.integers(0, 8, (B, S, 1)), jnp.int32),
        "height": jnp.asarray(rng.integers(0, 8, (B, S, 1)), jnp.int32),
        "emb": jnp.asarray(rng.normal(size=(B, S, 4)), jnp.float32),
    }
    out, masks = M.random_masking(x, schema, jnp.ones((B, S), bool), jax.random.PRNGKey(3))
    rate = float(jnp.mean(masks["left"].astype(jnp.float32)))
    assert 0.12 < rate < 0.18  # ~15%
    # of masked positions: ~80% [MASK], ~10% random, ~10% unchanged
    lm = np.asarray(masks["left"])
    lx = np.asarray(x["left"][..., 0])
    ly = np.asarray(out["left"][..., 0])
    masked_vals = ly[lm]
    orig_vals = lx[lm]
    frac_mask_tok = np.mean(masked_vals == 8)
    frac_unchanged = np.mean((masked_vals == orig_vals) & (masked_vals != 8))
    assert 0.70 < frac_mask_tok < 0.90
    assert 0.03 < frac_unchanged < 0.20


def test_random_masking_pure_mask_mode():
    schema = tiny_schema()
    x = tiny_inputs(schema=schema)
    seq = M.get_seq_mask(x["length"], schema.max_length)
    out, masks = M.random_masking(
        x, schema, seq, jax.random.PRNGKey(0),
        replace_prob=0.0, unchange_prob=0.0,
    )
    lm = np.asarray(masks["left"])
    ly = np.asarray(out["left"][..., 0])
    assert np.all(ly[lm] == 8)  # every masked slot is the [MASK] token


def test_random_masking_respects_padding():
    schema = tiny_schema()
    x = tiny_inputs(schema=schema)
    seq = M.get_seq_mask(x["length"], schema.max_length)
    _, masks = M.random_masking(x, schema, seq, jax.random.PRNGKey(1))
    assert not np.any(np.asarray(masks["left"]) & ~np.asarray(seq))


def test_elem_masking_selects_one_valid_element():
    schema = tiny_schema()
    x = tiny_inputs(schema=schema, lengths=(0, 2, 5, 3))
    seq = M.get_seq_mask(x["length"], schema.max_length)
    out, masks = M.elem_masking(x, schema, seq, jax.random.PRNGKey(0))
    m = np.asarray(masks["left"])
    np.testing.assert_array_equal(m, np.asarray(masks["type"]))
    counts = m.sum(axis=1)
    np.testing.assert_array_equal(counts, [1, 1, 1, 1])
    # selected element is within the valid range
    sel = m.argmax(axis=1)
    lengths = np.asarray(x["length"][:, 0]) + 1
    assert np.all(sel < lengths)
    # masked element's categorical fields are [MASK]
    for b in range(4):
        assert int(out["left"][b, sel[b], 0]) == 8


def test_elem_masking_select_last():
    schema = tiny_schema()
    x = tiny_inputs(schema=schema, lengths=(0, 2, 5, 3))
    seq = M.get_seq_mask(x["length"], schema.max_length)
    _, masks = M.elem_masking(x, schema, seq, jax.random.PRNGKey(0), select_last=True)
    sel = np.asarray(masks["left"]).argmax(axis=1)
    np.testing.assert_array_equal(sel, [0, 2, 5, 3])


def test_feat_masking():
    schema = tiny_schema()
    x = tiny_inputs(schema=schema)
    seq = M.get_seq_mask(x["length"], schema.max_length)
    out, masks = M.feat_masking(x, schema, seq, ("left", "top"))
    np.testing.assert_array_equal(np.asarray(masks["left"]), np.asarray(seq))
    np.testing.assert_array_equal(np.asarray(masks["type"]), np.zeros_like(seq))
    assert np.all(np.asarray(out["left"][..., 0])[np.asarray(seq)] == 8)
    np.testing.assert_array_equal(np.asarray(out["type"]), np.asarray(x["type"]))


def test_preprocess_for_train_task_mux():
    schema = tiny_schema()
    x = tiny_inputs(schema=schema, lengths=(3, 3, 3, 3))
    # crello groups: type, pos, attr, img, txt -> tasks: 0 random, 1 elem,
    # 2 type, 3 pos, 4 attr, 5 img, 6 txt
    tasks = jnp.asarray([1, 3, 3, 0])
    targets, modified, masks = M.preprocess_for_train(
        x, schema, tasks, jax.random.PRNGKey(0)
    )
    seq = np.asarray(M.get_seq_mask(x["length"], schema.max_length))
    # sample 0: elem -> exactly one element masked everywhere
    assert np.asarray(masks["left"])[0].sum() == 1
    # samples 1, 2: pos -> left fully masked on valid slots, type untouched
    np.testing.assert_array_equal(np.asarray(masks["left"])[1], seq[1])
    assert np.asarray(masks["type"])[1].sum() == 0
    assert "task" in modified and modified["task"].shape == (4, 1)
    np.testing.assert_array_equal(np.asarray(targets["left"]), np.asarray(x["left"]))


def test_merge_inputs_and_prediction():
    schema = tiny_schema()
    x = tiny_inputs(schema=schema, lengths=(3, 3, 3, 3))
    seq = M.get_seq_mask(x["length"], schema.max_length)
    masks = M.get_initial_masks(schema, seq)
    masks["left"] = jnp.zeros_like(seq).at[:, 0].set(True)
    B, S = seq.shape
    pred = {
        "type": jnp.asarray(np.random.default_rng(0).normal(size=(B, S, 1, 3)), jnp.float32),
        "left": jnp.asarray(np.random.default_rng(1).normal(size=(B, S, 1, 8)), jnp.float32),
        "width": jnp.asarray(np.random.default_rng(1).normal(size=(B, S, 1, 8)), jnp.float32),
        "top": jnp.asarray(np.random.default_rng(1).normal(size=(B, S, 1, 8)), jnp.float32),
        "height": jnp.asarray(np.random.default_rng(1).normal(size=(B, S, 1, 8)), jnp.float32),
        "emb": jnp.asarray(np.random.default_rng(2).normal(size=(B, S, 4)), jnp.float32),
    }
    merged = M.merge_inputs_and_prediction(x, schema, masks, pred)
    # unmasked categorical slots -> one-hot ground truth
    onehot = np.eye(8)[np.asarray(x["left"][..., 0])]
    np.testing.assert_allclose(np.asarray(merged["left"])[:, 1:, 0], onehot[:, 1:])
    # masked slot keeps the prediction
    np.testing.assert_allclose(
        np.asarray(merged["left"])[:, 0], np.asarray(pred["left"])[:, 0]
    )
    # numerical unmasked -> ground truth
    np.testing.assert_allclose(np.asarray(merged["emb"]), np.asarray(x["emb"]))
    # canvas passthrough
    np.testing.assert_array_equal(np.asarray(merged["length"]), np.asarray(x["length"]))


def test_sample_tasks_distribution():
    probs = (0.0, 0.5, 0.0, 0.5, 0.0, 0.0, 0.0)
    tasks = np.asarray(M.sample_tasks(jax.random.PRNGKey(0), 2000, probs))
    vals, counts = np.unique(tasks, return_counts=True)
    assert set(vals) == {1, 3}
    assert abs(counts[0] / 2000 - 0.5) < 0.05


def test_fast_rng_changes_values_not_masks():
    """fast_rng=True (train-path hardware rbg) must alter only the random-
    REPLACEMENT values; mask positions come from the fused threefry draw
    and stay identical, and the val path (fast_rng=False) is unaffected."""
    schema = tiny_schema()
    x = tiny_inputs(schema=schema, lengths=(5, 5, 5, 5))
    tasks = jnp.zeros((4,), jnp.int32)  # all 'random' -> replacement path
    key = jax.random.PRNGKey(7)
    _, mod_slow, masks_slow = M.preprocess_for_train(
        x, schema, tasks, key, fast_rng=False
    )
    _, mod_fast, masks_fast = M.preprocess_for_train(
        x, schema, tasks, key, fast_rng=True
    )
    for name in masks_slow:
        np.testing.assert_array_equal(
            np.asarray(masks_slow[name]), np.asarray(masks_fast[name]), name
        )
    # [MASK]-written and untouched slots agree; only replaced slots differ.
    for c in schema.modeled:
        if not c.is_sequence:
            continue
        a = np.asarray(mod_slow[c.name])
        b = np.asarray(mod_fast[c.name])
        diff = a != b
        if diff.any():
            # differing slots must be inside the mfp mask (replacements)
            m = np.asarray(masks_slow[c.name])[..., None]
            m = np.broadcast_to(m, diff.shape)
            assert (~diff | m).all(), c.name
