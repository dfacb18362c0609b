"""Layout-quality metric tests with hand-computed expectations."""

import jax.numpy as jnp
import numpy as np
import jax
import pytest

from flexdm_tpu.evaluation import layout_metrics as LM
from flexdm_tpu.models import masking as M
from flexdm_tpu.models.losses import mae_from_logits
from tests.test_masking import tiny_inputs, tiny_schema


def _example(schema, boxes, types, length):
    """boxes: list of (left, top, width, height) in bin units."""
    S = schema.max_length
    x = {
        "length": jnp.asarray([[length - 1]], jnp.int32),
        "type": jnp.zeros((1, S, 1), jnp.int32),
        "left": jnp.zeros((1, S, 1), jnp.int32),
        "top": jnp.zeros((1, S, 1), jnp.int32),
        "width": jnp.zeros((1, S, 1), jnp.int32),
        "height": jnp.zeros((1, S, 1), jnp.int32),
        "emb": jnp.zeros((1, S, 4), jnp.float32),
    }
    for i, ((l, t, w, h), ty) in enumerate(zip(boxes, types)):
        x["left"] = x["left"].at[0, i, 0].set(l)
        x["top"] = x["top"].at[0, i, 0].set(t)
        x["width"] = x["width"].at[0, i, 0].set(w)
        x["height"] = x["height"].at[0, i, 0].set(h)
        x["type"] = x["type"].at[0, i, 0].set(ty)
    return x


def test_gridmap_paint_and_overwrite():
    schema = tiny_schema()  # left/top bins = 8, type vocab = 3
    x = _example(schema, [(0, 0, 3, 3), (1, 1, 2, 2)], [1, 2], 2)
    mask = M.get_seq_mask(x["length"], schema.max_length)
    gmap = LM.compute_gridmaps(x, mask, schema, from_logits=False, label_name="type")
    g = np.asarray(gmap[0])
    assert g.shape == (8, 8)
    assert g[0, 0] == 1  # first box only
    assert g[2, 2] == 2  # second box painted later wins
    assert g[7, 7] == 0  # default label (schema primary default is None -> 0)


def test_layout_acc_miou_identical_maps():
    m = jnp.asarray(np.random.default_rng(0).integers(0, 3, (2, 8, 8)))
    acc, miou = LM.layout_acc_miou(m, m, 3)
    np.testing.assert_allclose(np.asarray(acc), 1.0)
    np.testing.assert_allclose(np.asarray(miou), 1.0)


def test_layout_acc_half_wrong():
    a = jnp.zeros((1, 4, 4), jnp.int32)
    b = jnp.zeros((1, 4, 4), jnp.int32).at[0, :2].set(1)
    acc, miou = LM.layout_acc_miou(a, b, 2)
    np.testing.assert_allclose(float(acc[0]), 0.5)
    # classes: 0 -> inter 8, union 16 -> 0.5; 1 -> inter 0, union 8 -> 0
    np.testing.assert_allclose(float(miou[0]), 0.25, atol=1e-6)


def test_layout_metrics_end_to_end():
    schema = tiny_schema()
    x = _example(schema, [(0, 0, 3, 3), (4, 4, 2, 2)], [1, 2], 2)
    out = LM.layout_metrics(x, x, schema, from_logits=False, use_true_length=True)
    np.testing.assert_allclose(float(out["layout_acc"]), 1.0)
    np.testing.assert_allclose(float(out["layout_miou"]), 1.0)


def test_alignment_overlap_perfectly_aligned():
    schema = tiny_schema()
    # Two boxes sharing a left edge -> perfect alignment -> score 0.
    x = _example(schema, [(2, 0, 2, 2), (2, 4, 3, 2)], [1, 1], 2)
    mask = M.get_seq_mask(x["length"], schema.max_length)
    s = LM.alignment_overlap_scores(x, mask, schema, from_logits=False)
    np.testing.assert_allclose(float(s["alignment_num"]), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(s["overlap_num"]), 0.0, atol=1e-6)
    assert float(s["alignment_den"]) == 1.0


def test_overlap_detects_overlapping_boxes():
    schema = tiny_schema()
    x = _example(schema, [(0, 0, 4, 4), (0, 0, 4, 4)], [1, 1], 2)
    mask = M.get_seq_mask(x["length"], schema.max_length)
    s = LM.alignment_overlap_scores(x, mask, schema, from_logits=False)
    assert float(s["overlap_num"]) > 0.5  # identical boxes fully overlap


def test_single_element_document_excluded():
    schema = tiny_schema()
    x = _example(schema, [(0, 0, 3, 3)], [1], 1)
    mask = M.get_seq_mask(x["length"], schema.max_length)
    s = LM.alignment_overlap_scores(x, mask, schema, from_logits=False)
    assert float(s["alignment_den"]) == 0.0


def test_mae_from_logits():
    logits = jnp.asarray([[[0.0, 100.0, 0.0]]])  # argmax/softmax -> class 1
    # expected value = 0.5 of [0, 0.5, 1]; target class 1 -> 0.5 -> mae 0
    np.testing.assert_allclose(
        float(mae_from_logits(jnp.asarray([[1]]), logits)[0, 0]), 0.0, atol=1e-6
    )
    np.testing.assert_allclose(
        float(mae_from_logits(jnp.asarray([[0]]), logits)[0, 0]), 0.5, atol=1e-6
    )


def test_unused_masking_clears_masks():
    schema = tiny_schema()
    x = tiny_inputs(schema=schema, lengths=(3, 3, 3, 3))
    seq = M.get_seq_mask(x["length"], schema.max_length)
    masks = {c.name: (seq if c.is_sequence else jnp.ones((4,), bool))
             for c in schema.modeled}
    out, new_masks = M.unused_masking(x, schema, masks, jax.random.PRNGKey(0),
                                      drop_ratio=1.0)
    # drop_ratio 1: every column nulled, every mask cleared
    assert not np.any(np.asarray(new_masks["left"]))
    assert np.all(np.asarray(out["left"][..., 0]) == schema["left"].null_token_id)


def test_rowcol_random_masking_shapes_and_padding():
    schema = tiny_schema()
    x = tiny_inputs(schema=schema, lengths=(5, 5, 5, 5))
    seq = M.get_seq_mask(x["length"], schema.max_length)
    out, masks = M.rowcol_random_masking(x, schema, seq, jax.random.PRNGKey(0))
    assert masks["left"].shape == seq.shape
    assert not np.any(np.asarray(masks["left"]) & ~np.asarray(seq))
