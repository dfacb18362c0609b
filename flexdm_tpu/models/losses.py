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
    """CE loss and top-1 hit per (B, S, C) entry (metrics.py:36-49).

    The label logit is picked by a one-hot contraction, not
    ``take_along_axis``: on TPU the gather lowering cost ~1.8 ms of a
    ~6 ms flagship step (measured: gather CE 2.94 ms vs one-hot CE
    1.14 ms over the same vocab buckets, bit-identical results — padding
    lanes hold finite ``-1e9`` so ``0 * pad`` stays exactly 0).
    ``lse - picked`` equals ``-log_softmax(logits)[label]`` (both
    max-shift internally).
    """
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    one_hot = jax.nn.one_hot(labels, logits.shape[-1], dtype=logits.dtype)
    picked = jnp.sum(logits * one_hot, axis=-1)
    ce = lse - picked
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
    # sort_inputs needs lengths; inject the GT ones for ordering only.  The
    # injected entry must not leak into the returned predictions — the
    # predict_context canvas branch would otherwise score raw label values
    # as "logits" for a length head that never existed (or clobber a
    # genuine one; canvas entries are per-document and never sorted).
    orig_length = y_pred.get("length")
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
            if name == "length":
                if orig_length is not None:
                    new_pred[name] = orig_length
            elif name in y_pred:
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
    predict_context: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total loss + metrics dict.

    Metric keys mirror the reference for comparability:
    ``{field}_loss``, ``{field}_score`` (normalized), ``{field}_score_num``,
    ``{field}_score_den``, and ``total_score``.

    ``sample_weight`` (B,) lets the eval harness zero out batch-padding
    samples so num/den sums stay exact with static batch shapes.

    ``predict_context`` additionally scores canvas (non-sequence) columns
    present in ``y_pred``, for ``context='canvas'`` models whose decoder
    emits canvas heads (reference ``metrics.py:165,226``).  The reference's
    branch is a dead flag (never set) and would mis-broadcast its (B, C)
    canvas loss against a (B, C, 1) weight; here the canvas mfp mask
    weights element-wise and the num/den accounting matches the sequence
    columns' (deviation documented in PARITY.md §2.7).
    """
    if sort_flag is not None:
        y_true, y_pred = _apply_sorting(
            schema, y_true, y_pred, sort_flag, ignore_sort
        )

    seq_mask = get_seq_mask(y_true["length"], schema.max_length)
    S = seq_mask.shape[1]
    seq_w = seq_mask.astype(jnp.float32)[..., None]  # (B, S, 1)

    modeled = [
        c for c in schema.columns if c.is_sequence and not c.demo_only
    ]

    def field_weight(column):
        """mfp mask x loss_condition x padding -> (B, S, 1) float32."""
        w = masks[column.name][..., None].astype(jnp.float32)
        if column.loss_condition is not None:
            cond = column.loss_condition
            table = jnp.asarray(cond.mask, dtype=jnp.float32)
            w = w * table[y_true[cond.key].astype(jnp.int32)]
        return w * seq_w

    # --- Categorical columns, vocab-bucketed ------------------------------
    # The per-column form costs ~10 small kernels per column (log_softmax,
    # gather, three weighting passes, staged reductions) — measured ~1.1 ms
    # of an ~8 ms flagship step, almost all launch overhead.  Columns whose
    # vocabularies pad to the same size are stacked on a channel axis and
    # scored by ONE log_softmax/gather/argmax over (B, S, G, Vpad); -1e9
    # logit padding leaves logsumexp, the gathered label logit, and argmax
    # bit-exact vs the unpadded computation (exp underflows to 0 exactly).
    # Per-field metric tensors are slices of the grouped result, so the
    # epoch scan's DCE still strips everything but the total loss.
    def pad_vocab(v: int) -> int:
        for level in (8, 16, 32, 64, 128, 256, 512, 1024):
            if v <= level:
                return level
        return v

    buckets: Dict[int, list] = {}
    for column in modeled:
        if column.is_categorical:
            buckets.setdefault(pad_vocab(column.input_dim), []).append(column)

    # Per-column (B, S, C) pieces, all already weighted where applicable.
    col_loss: Dict[str, jnp.ndarray] = {}
    col_score: Dict[str, jnp.ndarray] = {}
    col_den: Dict[str, jnp.ndarray] = {}
    loss_vec = jnp.zeros(seq_mask.shape[0], dtype=jnp.float32)  # (B,)

    for padV, cols in sorted(buckets.items()):
        logits, labels, weights = [], [], []
        for c in cols:
            pred = y_pred[c.name][:, :S].astype(jnp.float32)  # (B,S,C,V)
            if pred.shape[-1] < padV:
                pred = jnp.pad(
                    pred,
                    [(0, 0)] * (pred.ndim - 1) + [(0, padV - pred.shape[-1])],
                    constant_values=-1e9,
                )
            logits.append(pred)
            labels.append(y_true[c.name].astype(jnp.int32))
            weights.append(
                jnp.broadcast_to(field_weight(c), labels[-1].shape)
            )
        logits = jnp.concatenate(logits, axis=2)  # (B, S, G, padV)
        labels_g = jnp.concatenate(labels, axis=2)  # (B, S, G)
        w_g = jnp.concatenate(weights, axis=2)  # (B, S, G)
        ce, hit = categorical_loss_and_score(labels_g, logits)
        ce_w = ce * w_g
        loss_vec = loss_vec + jnp.sum(
            ce_w.reshape(ce_w.shape[0], -1), axis=1
        )
        offset = 0
        for c, lab in zip(cols, labels):
            C = lab.shape[2]
            sl = slice(offset, offset + C)
            col_loss[c.name] = ce_w[:, :, sl]
            col_score[c.name] = hit[:, :, sl] * w_g[:, :, sl]
            col_den[c.name] = w_g[:, :, sl]
            offset += C

    # --- Numerical columns (few; kept per-column) --------------------------
    for column in modeled:
        if column.is_categorical:
            continue
        name = column.name
        prediction = y_pred[name][:, :S].astype(jnp.float32)
        mse, score = continuous_loss_and_score(y_true[name], prediction)
        w = field_weight(column)  # (B, S, 1)
        col_loss[name] = mse[..., None] * float(column.shape[-1]) * w
        col_score[name] = score[..., None] * w
        col_den[name] = w
        loss_vec = loss_vec + jnp.sum(
            col_loss[name].reshape(mse.shape[0], -1), axis=1
        )

    # --- Canvas columns (predict_context only; reference metrics.py:226) ---
    canvas_cols = []
    if predict_context:
        canvas_cols = [
            c for c in schema.columns
            if not c.is_sequence and not c.demo_only and c.name in y_pred
        ]
    for column in canvas_cols:
        name = column.name
        # Canvas masks are (B,) bools (get_initial_masks); one weight per
        # document.
        w = jnp.asarray(masks[name]).astype(jnp.float32).reshape(-1)
        if column.loss_condition is not None:
            # A canvas condition key is itself a canvas column: one id per
            # document, stored (B, C_key) — condition on channel 0.
            cond = column.loss_condition
            table = jnp.asarray(cond.mask, dtype=jnp.float32)
            cond_ids = jnp.reshape(
                y_true[cond.key].astype(jnp.int32), (w.shape[0], -1)
            )[:, 0]
            w = w * table[cond_ids]
        if column.is_categorical:
            ce, hit = categorical_loss_and_score(
                y_true[name], y_pred[name].astype(jnp.float32)
            )
            # Per-channel weights, like the sequence-categorical path: the
            # denominator must count every scored (B, C) entry.
            wc = jnp.broadcast_to(
                w.reshape(-1, *([1] * (ce.ndim - 1))), ce.shape
            )
            col_loss[name] = wc * ce  # no seq axis to reduce
            col_score[name] = wc * hit
            col_den[name] = wc
        else:
            # continuous_loss_and_score reduces the channel axis: (B,).
            mse, score = continuous_loss_and_score(
                y_true[name], y_pred[name].astype(jnp.float32)
            )
            col_loss[name] = mse * float(column.shape[-1]) * w
            col_score[name] = score * w
            col_den[name] = w
        loss_vec = loss_vec + jnp.sum(
            col_loss[name].reshape(w.shape[0], -1), axis=1
        )

    sw = (
        sample_weight.astype(jnp.float32)
        if sample_weight is not None
        else None
    )
    if sw is not None:
        loss_vec = loss_vec * sw
    loss_total = jnp.mean(loss_vec)

    score_total = jnp.asarray(0.0, dtype=jnp.float32)
    metrics: Dict[str, jnp.ndarray] = {}
    for column in modeled + canvas_cols:
        name = column.name

        def per_sample(x):  # (B, S, C) -> (B,)
            v = jnp.sum(x.reshape(x.shape[0], -1), axis=1)
            return v * sw if sw is not None else v

        field_loss = jnp.mean(per_sample(col_loss[name]))
        score_num = jnp.sum(per_sample(col_score[name]))
        score_den = jnp.sum(per_sample(col_den[name]))
        normalized = jnp.where(score_den == 0.0, 1.0, score_num / score_den)

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
