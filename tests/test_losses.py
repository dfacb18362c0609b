"""Loss/score engine tests against hand-computed values."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdm_tpu.models import losses as L
from flexdm_tpu.models import masking as M
from tests.test_masking import tiny_inputs, tiny_schema


def test_categorical_loss_and_score_hand_computed():
    logits = jnp.asarray([[[[2.0, 0.0, 0.0]]]])  # (1,1,1,3)
    labels = jnp.asarray([[[0]]])
    loss, score = L.categorical_loss_and_score(labels, logits)
    expect = -np.log(np.exp(2.0) / (np.exp(2.0) + 2.0))
    np.testing.assert_allclose(float(loss[0, 0, 0]), expect, rtol=1e-3)
    assert float(score[0, 0, 0]) == 1.0
    _, score2 = L.categorical_loss_and_score(jnp.asarray([[[1]]]), logits)
    assert float(score2[0, 0, 0]) == 0.0


def test_continuous_loss_and_score_hand_computed():
    y = jnp.asarray([[[1.0, 0.0, 0.0, 0.0]]])
    p = jnp.asarray([[[0.0, 1.0, 0.0, 0.0]]])
    mse, score = L.continuous_loss_and_score(y, p)
    np.testing.assert_allclose(float(mse[0, 0]), 0.5, rtol=1e-6)  # mean over 4
    np.testing.assert_allclose(float(score[0, 0]), 0.5, atol=1e-6)  # cos=0
    _, s_same = L.continuous_loss_and_score(y, y)
    np.testing.assert_allclose(float(s_same[0, 0]), 1.0, atol=1e-6)
    _, s_opp = L.continuous_loss_and_score(y, -y)
    np.testing.assert_allclose(float(s_opp[0, 0]), 0.0, atol=1e-6)


def _perfect_predictions(schema, x):
    """Logits that argmax to ground truth; emb predictions equal GT."""
    pred = {}
    for c in schema.modeled:
        if not c.is_sequence:
            continue
        if c.is_categorical:
            pred[c.name] = 10.0 * jax.nn.one_hot(x[c.name], c.input_dim)
        else:
            pred[c.name] = x[c.name]
    return pred


def test_perfect_prediction_scores_one():
    schema = tiny_schema()
    x = tiny_inputs(schema=schema, lengths=(1, 2, 3, 4))
    seq = M.get_seq_mask(x["length"], schema.max_length)
    masks = M.get_initial_masks(schema, seq)
    for c in schema.modeled:
        if c.is_sequence:
            masks[c.name] = seq
    pred = _perfect_predictions(schema, x)
    loss, metrics = L.compute_mfp_loss(schema, x, pred, masks)
    assert float(metrics["left_score"]) == 1.0
    assert float(metrics["type_score"]) == 1.0
    np.testing.assert_allclose(float(metrics["emb_score"]), 1.0, atol=1e-5)
    # den for left counts valid slots = sum of (zero-based length + 1)
    assert float(metrics["left_score_den"]) == 2 + 3 + 4 + 5


def test_loss_condition_gates_scores():
    schema = tiny_schema()
    x = tiny_inputs(schema=schema, lengths=(5, 5, 5, 5))
    seq = M.get_seq_mask(x["length"], schema.max_length)
    masks = M.get_initial_masks(schema, seq)
    for c in schema.modeled:
        if c.is_sequence:
            masks[c.name] = seq
    pred = _perfect_predictions(schema, x)
    _, metrics = L.compute_mfp_loss(schema, x, pred, masks)
    # emb is only scored where type == 1 (loss_condition mask (F, T, F))
    t = np.asarray(x["type"][..., 0])
    sm = np.asarray(seq)
    expected_den = float(((t == 1) & sm).sum())
    assert float(metrics["emb_score_den"]) == expected_den


def test_empty_denominator_scores_one():
    schema = tiny_schema()
    x = tiny_inputs(schema=schema)
    seq = M.get_seq_mask(x["length"], schema.max_length)
    masks = M.get_initial_masks(schema, seq)  # nothing masked
    pred = _perfect_predictions(schema, x)
    pred = {k: v * 0.0 - 1.0 if k == "emb" else v for k, v in pred.items()}
    _, metrics = L.compute_mfp_loss(schema, x, pred, masks)
    assert float(metrics["left_score"]) == 1.0  # den == 0 -> 1.0
    assert float(metrics["left_score_den"]) == 0.0


def test_total_score_divides_by_full_column_count():
    schema = tiny_schema()
    x = tiny_inputs(schema=schema, lengths=(1, 1, 1, 1))
    seq = M.get_seq_mask(x["length"], schema.max_length)
    masks = M.get_initial_masks(schema, seq)
    for c in schema.modeled:
        if c.is_sequence:
            masks[c.name] = seq
    pred = _perfect_predictions(schema, x)
    _, metrics = L.compute_mfp_loss(schema, x, pred, masks)
    # 6 sequence fields score ~1.0 each; 7 columns total (incl. length)
    np.testing.assert_allclose(
        float(metrics["total_score"]), 6.0 / 7.0, atol=1e-5
    )


def test_sample_weight_zeroes_padding_samples():
    schema = tiny_schema()
    x = tiny_inputs(schema=schema, lengths=(2, 2, 2, 2))
    seq = M.get_seq_mask(x["length"], schema.max_length)
    masks = M.get_initial_masks(schema, seq)
    for c in schema.modeled:
        if c.is_sequence:
            masks[c.name] = seq
    pred = _perfect_predictions(schema, x)
    w = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    _, metrics = L.compute_mfp_loss(schema, x, pred, masks, sample_weight=w)
    assert float(metrics["left_score_den"]) == 6.0  # 2 samples * 3 slots


def test_sorted_scoring_matches_manual_sort():
    schema = tiny_schema()
    x = tiny_inputs(schema=schema, lengths=(4, 3, 5, 2))
    seq = M.get_seq_mask(x["length"], schema.max_length)
    masks = M.get_initial_masks(schema, seq)
    for name in ("left", "top", "width", "height"):
        masks[name] = seq
    pred = _perfect_predictions(schema, x)
    flag = jnp.ones((4,), bool)
    loss_sorted, m_sorted = L.compute_mfp_loss(
        schema, x, pred, masks, sort_flag=flag
    )
    loss_plain, m_plain = L.compute_mfp_loss(schema, x, pred, masks)
    # perfect predictions stay perfect under a consistent permutation
    np.testing.assert_allclose(
        float(m_sorted["left_score"]), float(m_plain["left_score"]), atol=1e-6
    )
    # and a prediction that is only correct *after* sorting scores 1.0
    # with the sort flag but not without: shuffle GT row-wise.
    perm = np.asarray([1, 0, 2, 3, 4, 5])
    x_shuf = dict(x)
    for c in schema.modeled:
        if c.is_sequence:
            x_shuf[c.name] = x[c.name][:, perm]
    pred_shuf = _perfect_predictions(schema, x_shuf)
    # lengths >= 2 so elements 0,1 are valid and genuinely swapped
    _, m_no = L.compute_mfp_loss(schema, x, pred_shuf, masks)
    _, m_yes = L.compute_mfp_loss(
        schema, x, pred_shuf, masks, sort_flag=flag
    )
    assert float(m_yes["left_score"]) >= float(m_no["left_score"])
    np.testing.assert_allclose(float(m_yes["left_score"]), 1.0, atol=1e-6)


def test_predict_context_scores_canvas_columns():
    """predict_context=True additionally scores non-sequence columns present
    in y_pred (reference metrics.py:165,226 — a dead flag there; corrected
    broadcasting here, see PARITY.md §2.7)."""
    schema = tiny_schema()
    x = tiny_inputs(schema=schema, lengths=(1, 2, 3, 4))
    seq = M.get_seq_mask(x["length"], schema.max_length)
    masks = M.get_initial_masks(schema, seq)
    for c in schema.modeled:
        if c.is_sequence:
            masks[c.name] = seq
    pred = _perfect_predictions(schema, x)
    # canvas head: length logits (B, 1, input_dim) argmaxing to GT
    pred["length"] = 10.0 * jax.nn.one_hot(
        x["length"], schema["length"].input_dim
    )

    _, base = L.compute_mfp_loss(schema, x, pred, masks)
    assert "length_score" not in base

    loss, metrics = L.compute_mfp_loss(
        schema, x, pred, masks, predict_context=True
    )
    assert float(metrics["length_score"]) == 1.0
    assert float(metrics["length_score_den"]) == 4.0  # all-True canvas mask
    # total_score now counts the canvas field too: 7 fields / 7 columns
    np.testing.assert_allclose(float(metrics["total_score"]), 1.0, atol=1e-5)
    # imperfect canvas prediction lowers the canvas score only
    bad = dict(pred)
    bad["length"] = jnp.roll(pred["length"], 1, axis=-1)
    _, m2 = L.compute_mfp_loss(schema, x, bad, masks, predict_context=True)
    assert float(m2["length_score"]) == 0.0
    assert float(m2["left_score"]) == 1.0


def test_sorting_does_not_leak_length_into_predict_context():
    """_apply_sorting injects GT lengths into y_pred for ordering only; with
    predict_context=True that entry must NOT be scored as a length head
    (raw labels are not logits)."""
    schema = tiny_schema()
    x = tiny_inputs(schema=schema, lengths=(1, 2, 3, 4))
    seq = M.get_seq_mask(x["length"], schema.max_length)
    masks = M.get_initial_masks(schema, seq)
    for c in schema.modeled:
        if c.is_sequence:
            masks[c.name] = seq
    pred = _perfect_predictions(schema, x)
    assert "length" not in pred
    flag = jnp.ones((x["length"].shape[0],), dtype=bool)

    loss, metrics = L.compute_mfp_loss(
        schema, x, pred, masks, sort_flag=flag, predict_context=True
    )
    assert "length_score" not in metrics
    assert np.isfinite(float(loss))

    # A genuine length head passed by the caller IS still scored.
    pred2 = dict(pred)
    pred2["length"] = 10.0 * jax.nn.one_hot(
        x["length"], schema["length"].input_dim
    )
    _, m2 = L.compute_mfp_loss(
        schema, x, pred2, masks, sort_flag=flag, predict_context=True
    )
    assert float(m2["length_score"]) == 1.0
