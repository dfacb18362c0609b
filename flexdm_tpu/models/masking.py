"""Masked-field-prediction task layer, as pure jit-compilable functions.

TPU-native counterpart of reference ``src/mfp/mfp/models/masking.py`` and the
preprocessing halves of ``models/mfp.py``.  Every random draw (MLM Bernoulli
masks, random-token replacement, element selection, task sampling) takes an
explicit ``jax.random`` key, so the whole task layer lives *inside* the
compiled train step — the reference had to run eagerly because its masking
used Python/TF global RNG (reference ``train.py:76``,
``tensor_utils.py:54-74``).

Conventions (identical to the reference):

* an "mfp mask" is a per-column boolean array — ``(B, S)`` for element
  columns (True = this field of this element is hidden and must be
  predicted), ``(B,)`` all-True for canvas columns;
* categorical ``[MASK]`` / ``[NULL]`` ids are ``input_dim`` /
  ``input_dim + 1`` (reference masking.py:82-85);
* numerical sentinels are all-channels ``10.0`` / ``0.0``
  (reference masking.py:8-9);
* BERT-style corruption: of the 15% selected fields, 80% are masked, 10%
  replaced with a random token, 10% left unchanged
  (reference masking.py:11-15).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..data.schema import MASK_VALUE, NULL_VALUE, ColumnSpec, Schema

Arrays = Dict[str, jnp.ndarray]

MASK_PROB = 0.15
REPLACE_PROB = 0.1
UNCHANGE_PROB = 0.1


def get_seq_mask(
    length: jnp.ndarray,
    max_length: int,
    from_logits: bool = False,
) -> jnp.ndarray:
    """(B,) or (B,1) zero-based length -> (B, S) validity mask.

    The ``length`` column is zero-based after vocabulary lookup, hence the
    ``+ 1`` (reference ``architecture/mask.py:21-33``).
    """
    if from_logits:
        length = jnp.argmax(length, axis=-1)
    length = length.reshape(-1) + 1
    positions = jnp.arange(max_length)[None, :]
    return positions < length[:, None]


def apply_token(
    x: jnp.ndarray,
    column: ColumnSpec,
    mask: jnp.ndarray,
    token_type: str,
    key: Optional[jax.Array] = None,
    fast_rng: bool = False,
) -> jnp.ndarray:
    """Write [MASK]/[NULL]/random tokens where ``mask`` is True.

    ``x`` is (B, S, C); ``mask`` is (B, S).  Reference masking.py:68-95.

    ``fast_rng`` draws the random-replacement values through the hardware
    ``rbg`` generator (``ops/rng.py``) instead of threefry — the
    ``(B, S, 512)`` embedding replacements are the largest per-step draws.
    rbg bits are not positionally stable across batch sizes on TPU, so this
    is for the TRAIN path only (full fixed-size batches); validation keeps
    threefry so padded batches reproduce unpadded rows bit-for-bit.
    """
    assert token_type in ("masked", "unused", "random"), token_type
    m = mask[..., None]
    if column.is_categorical:
        if token_type == "masked":
            token = jnp.asarray(column.mask_token_id, dtype=x.dtype)
        elif token_type == "unused":
            token = jnp.asarray(column.null_token_id, dtype=x.dtype)
        elif fast_rng:
            from ..ops import rng as fast

            token = fast.randint(key, x.shape, 0, column.input_dim, x.dtype)
        else:
            token = jax.random.randint(key, x.shape, 0, column.input_dim, x.dtype)
        return jnp.where(m, token, x)
    else:
        if token_type == "masked":
            token = jnp.asarray(MASK_VALUE, dtype=x.dtype)
        elif token_type == "unused":
            token = jnp.asarray(NULL_VALUE, dtype=x.dtype)
        elif fast_rng:
            from ..ops import rng as fast

            token = 0.1 * fast.normal(key, x.shape, dtype=x.dtype)
        else:
            token = 0.1 * jax.random.normal(key, x.shape, dtype=x.dtype)
        return jnp.where(m, token, x)


def filter_padding(
    inputs: Arrays, schema: Schema, seq_mask: jnp.ndarray
) -> Arrays:
    """Set [NULL] on padded slots and loss_condition-invalid slots.

    E.g. a textElement has no image_embedding, so that field is nulled at the
    input.  Reference masking.py:24-53.
    """
    out: Arrays = {}
    unused = ~seq_mask
    for column in schema.modeled:
        x = inputs[column.name]
        if not column.is_sequence:
            out[column.name] = x
            continue
        if column.loss_condition is not None:
            cond = column.loss_condition
            cond_ids = inputs[cond.key][..., 0]  # (B, S)
            valid_table = jnp.asarray(cond.mask, dtype=bool)
            invalid = ~valid_table[cond_ids] | unused
        else:
            invalid = unused
        out[column.name] = apply_token(x, column, invalid, "unused")
    return out


def get_initial_masks(schema: Schema, seq_mask: jnp.ndarray) -> Arrays:
    """All-False element masks; all-True canvas masks (masking.py:56-65)."""
    masks: Arrays = {}
    B = seq_mask.shape[0]
    for column in schema.modeled:
        if column.is_sequence:
            masks[column.name] = jnp.zeros_like(seq_mask)
        else:
            masks[column.name] = jnp.ones((B,), dtype=bool)
    return masks


def random_masking(
    inputs: Arrays,
    schema: Schema,
    seq_mask: jnp.ndarray,
    key: jax.Array,
    mask_prob: float = MASK_PROB,
    replace_prob: float = REPLACE_PROB,
    unchange_prob: float = UNCHANGE_PROB,
) -> Tuple[Arrays, Arrays]:
    """MLM-style per-(element, field) masking (reference masking.py:227-269).

    Pass ``replace_prob=0.0, unchange_prob=0.0`` for pure-mask evaluation
    masking (the reference's eval.py:59-65 intended this but crashed on a
    kwarg mismatch; here it is supported directly).
    """
    change_prob = 1.0 - unchange_prob
    thresh = replace_prob / change_prob if change_prob > 0 else 0.0

    # One fused draw for every column's three (B, S) uniforms (select /
    # change / replace-vs-mask) instead of ~3 kernels per column.  The batch
    # axis LEADS so each sample's stream is independent of the batch size —
    # evaluate_split relies on padded batches reproducing the unpadded rows
    # bit-for-bit.  All masking draws use jax's default threefry (counter-
    # based, hence positionally stable across the leading dim); the faster
    # hardware rbg generator is NOT stable across shapes on TPU (measured)
    # and is reserved for dropout, which never touches val/eval scores.
    # Cost of threefry here: ~0.25 ms of the ~8 ms flagship step.
    n_seq = sum(1 for c in schema.modeled if c.is_sequence)
    B, S = seq_mask.shape
    draws = jax.random.uniform(key, (B, 3, n_seq, S))

    out: Arrays = {}
    masks: Arrays = {}
    si = 0
    for i, column in enumerate(schema.modeled):
        x = inputs[column.name]
        if not column.is_sequence:
            out[column.name] = x
            masks[column.name] = jnp.ones((x.shape[0],), dtype=bool)
            continue
        mfp_mask = seq_mask & (draws[:, 0, si] < mask_prob)
        chg_mask = mfp_mask & (draws[:, 1, si] < change_prob)
        rand_arr = draws[:, 2, si]
        k4 = jax.random.fold_in(key, i)
        y = apply_token(x, column, chg_mask & (rand_arr >= thresh), "masked")
        y = apply_token(y, column, chg_mask & (rand_arr < thresh), "random", k4)
        out[column.name] = y
        masks[column.name] = mfp_mask
        si += 1
    return out, masks


def select_single_element(
    seq_mask: jnp.ndarray, key: jax.Array, select_last: bool = False
) -> jnp.ndarray:
    """One-hot (B, S) mask picking one valid element per sample.

    Reference masking.py:98-113.
    """
    length = jnp.sum(seq_mask.astype(jnp.float32), axis=1)  # (B,)
    if select_last:
        arr = (length - 1.0).astype(jnp.int32)
    else:
        u = jax.random.uniform(key, (seq_mask.shape[0],))
        arr = (u * length).astype(jnp.int32)
    one_hot = jax.nn.one_hot(arr, seq_mask.shape[1], dtype=jnp.int32).astype(bool)
    return one_hot & (length > 0.0)[:, None]


def elem_masking(
    inputs: Arrays,
    schema: Schema,
    seq_mask: jnp.ndarray,
    key: jax.Array,
    select_last: bool = False,
) -> Tuple[Arrays, Arrays]:
    """Mask every field of one randomly chosen element (masking.py:136-155)."""
    masks = get_initial_masks(schema, seq_mask)
    selected = select_single_element(seq_mask, key, select_last)
    out: Arrays = {}
    for column in schema.modeled:
        x = inputs[column.name]
        if not column.is_sequence:
            out[column.name] = x
        else:
            out[column.name] = apply_token(x, column, selected, "masked")
            masks[column.name] = selected
    return out, masks


def feat_masking(
    inputs: Arrays,
    schema: Schema,
    seq_mask: jnp.ndarray,
    feat_group: Tuple[str, ...],
) -> Tuple[Arrays, Arrays]:
    """Mask one attribute group across all elements (masking.py:116-133)."""
    masks = get_initial_masks(schema, seq_mask)
    out = {c.name: inputs[c.name] for c in schema.modeled}
    for name in feat_group:
        column = schema[name]
        out[name] = apply_token(out[name], column, seq_mask, "masked")
        masks[name] = seq_mask
    return out, masks


def unused_masking(
    inputs: Arrays,
    schema: Schema,
    masks: Arrays,
    key: jax.Array,
    drop_ratio: float = 0.1,
) -> Tuple[Arrays, Arrays]:
    """Drop-an-input augmentation: with prob ``drop_ratio`` per (sample,
    column), null the whole column and clear its mfp mask.

    Reference masking.py:158-180 (defined there but never called; kept for
    surface parity).  Note the reference returns the *unmodified* masks —
    here the cleared masks are returned, which is the evident intent.
    """
    out: Arrays = {}
    new_masks: Arrays = {}
    for i, column in enumerate(schema.modeled):
        name = column.name
        if not column.is_sequence:
            out[name] = inputs[name]
            new_masks[name] = masks[name]
            continue
        k = jax.random.fold_in(key, i)
        is_unused = jax.random.uniform(k, (inputs[name].shape[0],)) < drop_ratio
        drop = jnp.broadcast_to(is_unused[:, None], masks[name].shape)
        out[name] = apply_token(inputs[name], column, drop, "unused")
        new_masks[name] = masks[name] & ~drop
    return out, new_masks


def rowcol_random_masking(
    inputs: Arrays,
    schema: Schema,
    seq_mask: jnp.ndarray,
    key: jax.Array,
) -> Tuple[Arrays, Arrays]:
    """Row/column-structured MLM variant: mask whole elements (columns of
    the element-by-field grid) or whole fields (rows) at half MASK_PROB
    each, then apply the 80/10/10 corruption.

    Reference masking.py:183-224 (defined, unused).
    """
    p = MASK_PROB / 2.0
    change_prob = 1.0 - UNCHANGE_PROB
    thresh = REPLACE_PROB / change_prob

    B, S = seq_mask.shape
    k_col, k_row, key = jax.random.split(key, 3)
    seq_cols = [c for c in schema.modeled if c.is_sequence]
    col_mask = jax.random.uniform(k_col, (B, S)) < p
    row_mask = jax.random.uniform(k_row, (B, len(seq_cols))) < p

    out: Arrays = {}
    masks: Arrays = {}
    row_index = 0
    for column in schema.modeled:
        name = column.name
        if not column.is_sequence:
            out[name] = inputs[name]
            masks[name] = jnp.ones((B,), dtype=bool)
            continue
        k1, k2, k3 = jax.random.split(jax.random.fold_in(key, row_index), 3)
        mfp_mask = seq_mask & (col_mask | row_mask[:, row_index : row_index + 1])
        chg = mfp_mask & (jax.random.uniform(k1, (B, S)) < change_prob)
        rand = jax.random.uniform(k2, (B, S))
        y = apply_token(inputs[name], column, chg & (rand >= thresh), "masked")
        y = apply_token(y, column, chg & (rand < thresh), "random", k3)
        out[name] = y
        masks[name] = mfp_mask
        row_index += 1
    return out, masks


def sample_tasks(
    key: jax.Array, batch_size: int, probs: Tuple[float, ...]
) -> jnp.ndarray:
    """Per-sample categorical task draw (reference mfp.py:34-43, 300-301)."""
    logits = jnp.log(jnp.asarray(probs) + 1e-30)
    return jax.random.categorical(key, logits, shape=(batch_size,))


def train_draw_shape(schema: Schema, batch_size: int) -> Tuple[int, ...]:
    """Shape of the fused per-step uniform draw ``preprocess_for_train``
    consumes: (B, 3, #sequence columns, S)."""
    n_seq = sum(1 for c in schema.modeled if c.is_sequence)
    return (batch_size, 3, n_seq, schema.max_length)


def preprocess_for_train(
    inputs: Arrays,
    schema: Schema,
    tasks: jnp.ndarray,
    key: jax.Array,
    is_autoreg: bool = False,
    fast_rng: bool = False,
    draws: Optional[jnp.ndarray] = None,
) -> Tuple[Arrays, Arrays, Arrays]:
    """Per-sample task masking: mux cheap (B, S) masks, touch data once.

    Returns ``(targets, modified_inputs, masks)``; ``modified_inputs`` gains
    a ``"task"`` entry.  Semantics match reference mfp.py:95-138 (compute
    random/elem/feat maskings, select per sample by task id), but where the
    reference materialized every masking of every column and muxed the
    *data* tensors (7 modified copies of each 512-d embedding column per
    step), here only the boolean (B, S) masks are muxed and each column's
    data is rewritten exactly twice ([MASK] slots, then random-replacement
    slots).  That cut the measured train step from 10.4 to ~6 ms on v5e —
    the variant materialization was pure HBM traffic.
    ``is_autoreg`` makes elem masking pick the last valid element.

    ``draws``: optionally pass the fused uniform tensor
    (:func:`train_draw_shape`) precomputed by the caller — e.g. one bulk
    per-epoch draw feeding a ``lax.scan`` over steps — instead of drawing
    per call.  Same semantics for any U[0,1) source; the default per-call
    threefry draw keeps the historical stream.
    """
    seq_mask = get_seq_mask(inputs["length"], schema.max_length)
    filtered = filter_padding(inputs, schema, seq_mask)

    k_random, k_elem = jax.random.split(key)
    elem_sel = select_single_element(seq_mask, k_elem, select_last=is_autoreg)

    # Per-column membership in each feat group, resolved at trace time.
    groups = list(schema.attribute_groups.values())
    is_random = (tasks == 0)[:, None]  # (B, 1)
    is_elem = (tasks == 1)[:, None]

    change_prob = 1.0 - UNCHANGE_PROB
    thresh = REPLACE_PROB / change_prob

    if draws is None:
        draws = jax.random.uniform(
            k_random, train_draw_shape(schema, seq_mask.shape[0])
        )

    modified: Arrays = {}
    masks: Arrays = {}
    si = 0
    for i, column in enumerate(schema.modeled):
        name = column.name
        if not column.is_sequence:
            modified[name] = filtered[name]
            masks[name] = jnp.ones((seq_mask.shape[0],), dtype=bool)
            continue

        # The column's mask under each explicit task (all (B, S) bools).
        variant_mask = jnp.where(is_elem, elem_sel, False)
        for g, group in enumerate(groups):
            if name in group:
                variant_mask = jnp.where(
                    (tasks == g + 2)[:, None], seq_mask, variant_mask
                )

        # MLM randoms for the implicit task (reference masking.py:249-263),
        # sliced from the one fused per-step draw.
        mlm_mask = seq_mask & (draws[:, 0, si] < MASK_PROB)
        chg = mlm_mask & (draws[:, 1, si] < change_prob)
        rand_arr = draws[:, 2, si]
        k4 = jax.random.fold_in(k_random, i)

        mask_tok = jnp.where(
            is_random, chg & (rand_arr >= thresh), variant_mask
        )
        rand_tok = is_random & chg & (rand_arr < thresh)

        y = apply_token(filtered[name], column, mask_tok, "masked")
        y = apply_token(y, column, rand_tok, "random", k4, fast_rng=fast_rng)
        modified[name] = y
        masks[name] = jnp.where(is_random, mlm_mask, variant_mask)
        si += 1

    modified["task"] = tasks[:, None]
    return inputs, modified, masks


def preprocess_for_test(
    inputs: Arrays,
    schema: Schema,
    masks: Arrays,
    tasks: Optional[jnp.ndarray] = None,
) -> Arrays:
    """Apply externally supplied masks (demo/eval path, mfp.py:72-92)."""
    seq_mask = get_seq_mask(inputs["length"], schema.max_length)
    filtered = filter_padding(inputs, schema, seq_mask)
    modified: Arrays = {}
    for column in schema.modeled:
        if not column.is_sequence:
            modified[column.name] = filtered[column.name]
        else:
            modified[column.name] = apply_token(
                filtered[column.name], column, masks[column.name], "masked"
            )
    if tasks is None:
        tasks = jnp.zeros((inputs["length"].shape[0],), dtype=jnp.int32)
    modified["task"] = tasks[:, None]
    return modified


def merge_inputs_and_prediction(
    inputs: Arrays, schema: Schema, masks: Arrays, prediction: Arrays
) -> Arrays:
    """Overwrite predictions with ground truth wherever fields were NOT
    masked, so demo/eval outputs only change masked fields.

    Categorical GT becomes one-hot to match logit shapes.
    Reference mfp.py:46-69.
    """
    out = dict(prediction)
    for column in schema.columns:
        name = column.name
        if column.demo_only:
            if name in inputs:
                out[name] = inputs[name]
            continue
        if not column.is_sequence:
            out[name] = inputs[name]
        elif name not in masks:
            continue
        elif column.is_categorical:
            gt = jax.nn.one_hot(inputs[name], column.input_dim)
            cond = masks[name][:, :, None, None]
            out[name] = jnp.where(cond, prediction[name], gt)
        else:
            cond = masks[name][..., None]
            out[name] = jnp.where(cond, prediction[name], inputs[name])
    return out
