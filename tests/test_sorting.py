"""Sorting/shuffling utilities vs. straightforward numpy references."""

import jax
import jax.numpy as jnp
import numpy as np

from flexdm_tpu.models import sorting as S
from flexdm_tpu.models.masking import get_seq_mask
from tests.test_masking import tiny_inputs, tiny_schema


def test_sort_inputs_matches_numpy_packing():
    """Replicates the reference's base-100 integer packing semantics
    (reference tensor_utils.py:14-44)."""
    schema = tiny_schema()
    x = tiny_inputs(schema=schema, lengths=(5, 3, 0, 4))
    out = S.sort_inputs(x, schema)

    lengths = np.asarray(x["length"][:, 0]) + 1
    for b in range(4):
        prio = np.zeros(schema.max_length, dtype=np.int64)
        for key in S.SORT_KEYS:
            prio = prio * 100 + np.asarray(x[key][b, :, 0], np.int64)
        prio += (np.arange(schema.max_length) >= lengths[b]) * 100**5
        order = np.argsort(prio, kind="stable")
        for key in S.SORT_KEYS:
            np.testing.assert_array_equal(
                np.asarray(out[key][b, :, 0]),
                np.asarray(x[key][b, :, 0])[order],
            )


def test_sort_inputs_from_logits():
    schema = tiny_schema()
    x = tiny_inputs(schema=schema, lengths=(3, 3, 3, 3))
    pred = {"length": x["length"]}
    for c in schema.modeled:
        if c.is_sequence and c.is_categorical:
            pred[c.name] = 5.0 * jax.nn.one_hot(x[c.name], c.input_dim)
        elif c.is_sequence:
            pred[c.name] = x[c.name]
    out_logits = S.sort_inputs(pred, schema, from_logits=True)
    out_labels = S.sort_inputs(x, schema)
    np.testing.assert_array_equal(
        np.argmax(np.asarray(out_logits["left"]), -1),
        np.asarray(out_labels["left"]),
    )


def test_shuffle_inputs_permutes_only_valid_prefix():
    schema = tiny_schema()
    x = tiny_inputs(schema=schema, lengths=(5, 2, 0, 3))
    out = S.shuffle_inputs(x, schema, jax.random.PRNGKey(0))
    lengths = np.asarray(x["length"][:, 0]) + 1
    for b in range(4):
        n = lengths[b]
        orig = np.asarray(x["left"][b, :, 0])
        got = np.asarray(out["left"][b, :, 0])
        # valid prefix is a permutation of the original prefix
        np.testing.assert_array_equal(np.sort(got[:n]), np.sort(orig[:n]))
        # padding untouched
        np.testing.assert_array_equal(got[n:], orig[n:])
    # all sequence columns get the SAME permutation
    t_out = np.asarray(out["type"][0, :, 0])
    l_out = np.asarray(out["left"][0, :, 0])
    t_in = np.asarray(x["type"][0, :, 0])
    l_in = np.asarray(x["left"][0, :, 0])
    for i in range(6):
        j = int(np.nonzero(l_in == l_out[i])[0][0]) if (l_in == l_out[i]).sum() == 1 else None
        if j is not None:
            assert t_out[i] == t_in[j]


def test_reorganize_indices_matches_reference_algorithm():
    maxlen = 7
    from_inds = jnp.asarray([[2], [0], [6]])
    n_elems = jnp.asarray([[4], [3], [0]])
    got = np.asarray(S.reorganize_indices(from_inds, n_elems, maxlen))
    for row, (f, n) in enumerate([(2, 4), (0, 3), (6, 0)]):
        ids = list(range(maxlen))
        del ids[f]
        expect = ids[:n] + [f] + ids[n:]
        np.testing.assert_array_equal(got[row], expect)
