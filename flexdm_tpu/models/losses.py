"""Masked-field objective and score accounting.

Counterpart of the reference ``LossLayer``
(``src/mfp/mfp/models/metrics.py:160-299``).  Per field:

* categorical: sparse softmax cross-entropy loss; score = top-1 accuracy
  (metrics.py:36-49);
* numerical: MSE (scaled by the channel count, i.e. summed squared error)
  loss; score = ``0.5 * (1 + cosine similarity)`` (metrics.py:52-57).

Everything is weighted by (a) the per-field mfp mask, (b) the
``loss_condition`` validity gathered from the ground-truth conditioning
column, and (c) the padding sequence mask (metrics.py:251-267).  Losses sum
over timesteps and channels then average over the batch; scores are kept as
(numerator, denominator) pairs so dataset-level normalization is exact
(metrics.py:269-289).

``sort_flag`` reproduces the rico position-task protocol: per-sample, both
ground truth and (argmax-decoded) predictions are lexicographically sorted
before scoring (metrics.py:180-211).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..data.schema import Schema
from .masking import get_seq_mask
from .sorting import sort_inputs

Arrays = Dict[str, jnp.ndarray]


def categorical_loss_and_score(
    labels: jnp.ndarray, logits: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """CE loss and top-1 hit per (B, S, C) entry (metrics.py:36-49)."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(
        log_probs, labels[..., None].astype(jnp.int32), axis=-1
    )[..., 0]
    hit = (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
    return ce, hit


def continuous_loss_and_score(
    y_true: jnp.ndarray, y_pred: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(B, S): MSE and 0.5*(1+cos) (metrics.py:52-57)."""
    mse = jnp.mean(jnp.square(y_true - y_pred), axis=-1)

    def l2norm(x):
        return x * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(jnp.square(x), axis=-1, keepdims=True), 1e-12)
        )

    cos = jnp.sum(l2norm(y_true) * l2norm(y_pred), axis=-1)
    return mse, 0.5 * cos + 0.5


def mae_from_logits(
    y_true: jnp.ndarray, y_pred: jnp.ndarray, from_logits: bool = True
) -> jnp.ndarray:
    """Expected-value MAE over ordinal bins (reference metrics.py:12-33).

    Interprets the C classes as evenly spaced values in [0, 1]; the
    prediction is the softmax-expected value.  Defined by the reference for
    an (unused) font_size scoring hook; provided for parity.
    """
    C = y_pred.shape[-1]
    div = float(C - 1)
    target = y_true.astype(jnp.float32) / div
    probs = jax.nn.softmax(y_pred, axis=-1) if from_logits else y_pred
    values = jnp.arange(C, dtype=jnp.float32) / div
    expected = jnp.sum(probs * values, axis=-1)
    return jnp.abs(target - expected)


def _apply_sorting(
    schema: Schema,
    y_true: Arrays,
    y_pred: Arrays,
    sort_flag: jnp.ndarray,
    ignore_sort: Optional[str],
) -> Tuple[Arrays, Arrays]:
    """Per-sample switch to sorted element order (metrics.py:180-211)."""
    assert ignore_sort in ("gt", "pred", None)
    y_true_sort = y_true if ignore_sort == "gt" else sort_inputs(y_true, schema)

    y_pred = dict(y_pred)
    y_pred["length"] = y_true["length"]
    y_pred_sort = (
        y_pred
        if ignore_sort == "pred"
        else sort_inputs(y_pred, schema, from_logits=True)
    )

    new_true, new_pred = {}, {}
    for name in y_true:
        if name not in schema:
            continue
        column = schema[name]
        if column.demo_only:
            continue
        if column.is_sequence:
            flag = sort_flag[:, None, None]
            new_true[name] = jnp.where(flag, y_true_sort[name], y_true[name])
            pflag = flag[..., None] if column.is_categorical else flag
            new_pred[name] = jnp.where(pflag, y_pred_sort[name], y_pred[name])
        else:
            new_true[name] = y_true[name]
            if name in y_pred:
                new_pred[name] = y_pred[name]
    return new_true, new_pred


def compute_mfp_loss(
    schema: Schema,
    y_true: Arrays,
    y_pred: Arrays,
    masks: Arrays,
    sort_flag: Optional[jnp.ndarray] = None,
    ignore_sort: Optional[str] = None,
    sample_weight: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total loss + metrics dict.

    Metric keys mirror the reference for comparability:
    ``{field}_loss``, ``{field}_score`` (normalized), ``{field}_score_num``,
    ``{field}_score_den``, and ``total_score``.

    ``sample_weight`` (B,) lets the eval harness zero out batch-padding
    samples so num/den sums stay exact with static batch shapes.
    """
    if sort_flag is not None:
        y_true, y_pred = _apply_sorting(
            schema, y_true, y_pred, sort_flag, ignore_sort
        )

    seq_mask = get_seq_mask(y_true["length"], schema.max_length)
    seq_w = seq_mask[..., None].astype(jnp.float32)

    loss_total = jnp.asarray(0.0, dtype=jnp.float32)
    score_total = jnp.asarray(0.0, dtype=jnp.float32)
    metrics: Dict[str, jnp.ndarray] = {}

    for column in schema.columns:
        name = column.name
        # Canvas columns are not predicted by the MFP task
        # (reference metrics.py:226-227, predict_context=False).
        if column.demo_only or not column.is_sequence:
            continue

        # Score in float32 regardless of the model compute dtype.
        prediction = y_pred[name][:, : seq_mask.shape[1]].astype(jnp.float32)
        if column.is_categorical:
            labels = y_true[name].astype(jnp.int32)
            loss, score = categorical_loss_and_score(labels, prediction)
        else:
            loss, score = continuous_loss_and_score(y_true[name], prediction)
            loss = loss[..., None] * float(column.shape[-1])
            score = score[..., None]

        mfp_w = masks[name][..., None].astype(jnp.float32)  # (B, S, 1)
        loss = loss * mfp_w
        score = score * mfp_w
        den = jnp.broadcast_to(mfp_w, loss.shape)

        if column.loss_condition is not None:
            cond = column.loss_condition
            table = jnp.asarray(cond.mask, dtype=jnp.float32)
            w = table[y_true[cond.key].astype(jnp.int32)]  # (B, S, 1)
            loss = loss * w
            score = score * w
            den = den * w

        loss = jnp.sum(loss * seq_w, axis=1)  # sum timesteps -> (B, C)
        score = jnp.sum(score * seq_w, axis=1)
        den = jnp.sum(den * seq_w, axis=1)

        loss = jnp.sum(loss, axis=1)  # sum channels -> (B,)
        score = jnp.sum(score, axis=1)
        den = jnp.sum(den, axis=1)

        if sample_weight is not None:
            w = sample_weight.astype(jnp.float32)
            loss = loss * w
            score = score * w
            den = den * w

        field_loss = jnp.mean(loss)  # average batch
        score_num = jnp.sum(score)
        score_den = jnp.sum(den)
        normalized = jnp.where(score_den == 0.0, 1.0, score_num / score_den)

        loss_total = loss_total + field_loss
        score_total = score_total + normalized
        metrics[f"{name}_loss"] = field_loss
        metrics[f"{name}_score"] = normalized
        metrics[f"{name}_score_num"] = score_num
        metrics[f"{name}_score_den"] = score_den

    # Reference divides by the FULL column count, demo/canvas included
    # (metrics.py:298 with the unfiltered input_columns dict).
    metrics["total_score"] = score_total / len(schema.columns)
    metrics["loss"] = loss_total
    return loss_total, metrics
