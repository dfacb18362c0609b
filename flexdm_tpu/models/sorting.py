"""Element-set reordering utilities, jit-compilable.

Counterpart of reference ``src/mfp/mfp/models/tensor_utils.py``.  The
reference versions *asserted eager mode* and used Python RNG / numpy loops
(tensor_utils.py:19, 54-74), which is what forced its whole trainer to run
eagerly.  Here sorting is a batched ``lexsort`` and shuffling a per-sample
``argsort`` of random keys, so everything stays inside the compiled graph.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..data.schema import Schema
from .masking import get_seq_mask

# Lexicographic priority used by sorted scoring (reference tensor_utils.py:11).
SORT_KEYS = ("type", "left", "top", "width", "height")


def gather_elements(x: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """Reorder axis 1 of ``x`` (B, S, ...) by per-row ``indices`` (B, S)."""
    idx = indices.reshape(indices.shape + (1,) * (x.ndim - 2))
    return jnp.take_along_axis(x, idx, axis=1)


def sort_inputs(
    inputs: Dict[str, jnp.ndarray],
    schema: Schema,
    from_logits: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Sort elements by (valid, type, left, top, width, height).

    Matches reference ``tensor_utils.py:14-44``, which packs the keys into a
    base-100 integer; a lexsort with invalid-last as the most significant key
    is the same ordering (ties between equal-priority elements are resolved
    stably here, where the reference's quicksort was unspecified).
    """
    assert "length" in inputs
    keys = {}
    for name in SORT_KEYS:
        x = inputs[name]
        if from_logits and schema[name].is_categorical and x.ndim == 4:
            x = jnp.argmax(x, axis=-1)
        keys[name] = x[..., 0].astype(jnp.int32)  # (B, S)

    invalid = (~get_seq_mask(inputs["length"], schema.max_length)).astype(
        jnp.int32
    )
    # jnp.lexsort: last key is the primary sort key.
    indices = jnp.lexsort(
        (
            keys["height"],
            keys["width"],
            keys["top"],
            keys["left"],
            keys["type"],
            invalid,
        ),
        axis=-1,
    )

    out = {}
    for name, x in inputs.items():
        if name in schema and schema[name].is_sequence and x.ndim >= 2:
            out[name] = gather_elements(x, indices)
        else:
            out[name] = x
    return out


def shuffle_inputs(
    inputs: Dict[str, jnp.ndarray],
    schema: Schema,
    key: jax.Array,
) -> Dict[str, jnp.ndarray]:
    """Randomly permute the valid elements of each sample, keeping padding in
    place (reference ``tensor_utils.py:47-78``, eager-only there).

    Valid slots get random sort keys, padded slots keep large ordered keys,
    so a single argsort yields "shuffled valid prefix + untouched tail".
    """
    seq_mask = get_seq_mask(inputs["length"], schema.max_length)
    B, S = seq_mask.shape
    u = jax.random.uniform(key, (B, S))
    pad_rank = 1.0 + jnp.arange(S, dtype=jnp.float32)[None, :]
    sort_key = jnp.where(seq_mask, u, pad_rank)
    indices = jnp.argsort(sort_key, axis=-1)

    out = {}
    for name, x in inputs.items():
        if (
            hasattr(x, "ndim")
            and x.ndim >= 2
            and x.shape[1] == S
            and (name not in schema or schema[name].is_sequence)
        ):
            out[name] = gather_elements(x, indices)
        else:
            out[name] = x
    return out


def merge_dicts(batches, axis: int = 0) -> Dict[str, jnp.ndarray]:
    """Concatenate a list of array-dicts (reference tensor_utils.py:111-117)."""
    return {
        k: jnp.concatenate([b[k] for b in batches], axis=axis)
        for k in batches[0]
    }


def split_dict(
    inputs: Dict[str, jnp.ndarray], num_splits: int, axis: int = 0
):
    """Split an array-dict into equal parts (tensor_utils.py:120-129)."""
    out = [{} for _ in range(num_splits)]
    for k, v in inputs.items():
        for i, piece in enumerate(jnp.split(v, num_splits, axis=axis)):
            out[i][k] = piece
    return out


def reorganize_indices(
    from_inds: jnp.ndarray, n_elems: jnp.ndarray, maxlen: int
) -> jnp.ndarray:
    """Move element ``from_inds[i]`` to position ``n_elems[i]`` in each row,
    shifting the rest (used by autoregressive ``elem`` evaluation; reference
    ``tensor_utils.py:81-108``).

    Args:
      from_inds: (B, 1) source positions.
      n_elems:   (B, 1) insertion positions.
      maxlen:    static row length.

    Returns (B, maxlen) int32 gather indices.
    """
    f = from_inds[:, :1].astype(jnp.int32)  # (B, 1)
    n = n_elems[:, :1].astype(jnp.int32)
    pos = jnp.arange(maxlen, dtype=jnp.int32)[None, :]  # (1, maxlen)
    # The row equals range(maxlen) with f deleted and re-inserted at n:
    # position p reads entry q of the f-less list (q = p before the insertion
    # point, p - 1 after), and the f-less list is q if q < f else q + 1.
    q = jnp.where(pos < n, pos, pos - 1)
    val = jnp.where(q < f, q, q + 1)
    return jnp.where(pos == n, f, val).astype(jnp.int32)
