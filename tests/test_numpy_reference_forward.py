"""Differential test: an independent NumPy forward pass of the oneshot model.

Reimplements the reference architecture's exact math (sum-fusion embedding
encoder with sentinel substitution, pre-norm DeepSVG blocks with additive
-1e9 padding mask, per-field Dense heads — reference encoder.py:147-265,
transformer.py:60-229, decoder.py:72-111) directly in NumPy from the flax
parameter tree, and checks the flax model produces the same logits.  This
catches wiring mistakes (wrong norm placement, wrong axis sums, one-hot vs
gather discrepancies, head reshapes) that unit tests of individual pieces
cannot.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdm_tpu.data.schema import MASK_VALUE, NULL_VALUE
from flexdm_tpu.models import MFPModel
from flexdm_tpu.models.masking import (
    get_initial_masks,
    get_seq_mask,
    preprocess_for_test,
)
from flexdm_tpu.train import init_params
from flexdm_tpu.data import split_device_batch


def layer_norm(x, scale, bias, eps=1e-3):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * scale + bias


def dense(x, p):
    return x @ np.asarray(p["kernel"]) + np.asarray(p["bias"])


def attention(x, p, mask, num_heads):
    B, S, D = x.shape
    dh = D // num_heads

    def heads(t):
        return t.reshape(B, S, num_heads, dh).transpose(0, 2, 1, 3)

    q, k, v = heads(dense(x, p["query"])), heads(dense(x, p["key"])), heads(
        dense(x, p["value"])
    )
    scores = q @ k.transpose(0, 1, 3, 2) / np.sqrt(dh)
    scores = scores + np.where(mask, 0.0, -1e9)[:, None, None, :]
    scores = scores - scores.max(-1, keepdims=True)
    probs = np.exp(scores)
    probs = probs / probs.sum(-1, keepdims=True)
    o = (probs @ v).transpose(0, 2, 1, 3).reshape(B, S, D)
    return dense(o, p["out"])


def deepsvg_block(x, p, mask, num_heads):
    y = layer_norm(x, np.asarray(p["norm1"]["scale"]), np.asarray(p["norm1"]["bias"]))
    x = x + attention(y, p["attn"], mask, num_heads)
    y = layer_norm(x, np.asarray(p["norm2"]["scale"]), np.asarray(p["norm2"]["bias"]))
    y = dense(y, p["mlp_0"])
    y = np.maximum(y, 0.0)
    y = dense(y, p["mlp_1"])
    return x + y


def numpy_forward(params, modified, schema, num_heads, num_blocks):
    p = params["params"]
    enc = p["encoder"]
    seq_mask = np.asarray(get_seq_mask(modified["length"], schema.max_length))

    seq = 0.0
    for column in schema.valid_columns():
        x = np.asarray(modified[column.name])
        if column.is_categorical:
            table = np.asarray(enc[f"input_{column.name}"])
            seq = seq + table[x].sum(axis=2)  # gather formulation
        else:
            special = np.asarray(enc[f"input_{column.name}_special"])
            h = dense(x, enc[f"input_{column.name}"])
            is_masked = np.all(x == MASK_VALUE, axis=-1)
            is_unused = np.all(x == NULL_VALUE, axis=-1)
            h = np.where(is_masked[..., None], special[0][None, None], h)
            h = np.where(is_unused[..., None], special[1][None, None], h)
            seq = seq + h

    for i in range(num_blocks):
        seq = deepsvg_block(seq, p["blocks"][f"seq2seq_{i}"], seq_mask, num_heads)

    outputs = {}
    B = seq.shape[0]
    for column in schema.valid_columns():
        head = p["decoder"][f"decoder_{column.name}"]
        out = dense(seq, head)
        if column.is_categorical:
            out = out.reshape(B, -1, column.shape[-1], column.input_dim)
        else:
            out = out.reshape(B, -1, column.shape[-1])
        outputs[column.name] = out
    return outputs


@pytest.mark.parametrize("fixture", ["crello_spec", "rico_spec"])
def test_flax_forward_matches_numpy_reference(request, fixture):
    spec = request.getfixturevalue(fixture)
    schema = spec.schema
    model = MFPModel(
        schema, latent_dim=32, num_blocks=2, num_heads=4, attention_impl="xla"
    )
    host = next(iter(spec.make_dataset("val", batch_size=4)))
    batch = {k: jnp.asarray(v) for k, v in split_device_batch(host).items()}
    params = init_params(model, batch, seed=0)

    # Mask a couple of fields so sentinel substitution paths are exercised.
    seq_mask = get_seq_mask(batch["length"], schema.max_length)
    masks = get_initial_masks(schema, seq_mask)
    masks["left"] = seq_mask
    if "image_embedding" in schema:
        masks["image_embedding"] = seq_mask
    modified = preprocess_for_test(batch, schema, masks)

    got = model.apply(params, modified, deterministic=True)
    expect = numpy_forward(
        jax.device_get(params), jax.device_get(modified), schema,
        num_heads=4, num_blocks=2,
    )
    for name, ref in expect.items():
        np.testing.assert_allclose(
            np.asarray(got[name]), ref, rtol=5e-4, atol=5e-5,
            err_msg=f"column {name}",
        )


def numpy_forward_canvas(params, modified, schema, num_heads, num_blocks):
    """Independent NumPy forward for context='canvas': canvas-column
    embeddings aggregate into a global token prepended to the sequence
    (reference encoder.py:228-249), and the decoder splits it back off for
    the canvas-level heads (reference decoder.py:74-78)."""
    p = params["params"]
    enc = p["encoder"]
    S = schema.max_length
    length = np.asarray(modified["length"]).reshape(-1)

    seq, canvas = 0.0, 0.0
    for column in schema.valid_columns(True):
        x = np.asarray(modified[column.name])
        if column.is_categorical:
            table = np.asarray(enc[f"input_{column.name}"])
            h = table[x].sum(axis=2 if column.is_sequence else 1)
        else:
            special = np.asarray(enc[f"input_{column.name}_special"])
            h = dense(x, enc[f"input_{column.name}"])
            h = np.where(np.all(x == MASK_VALUE, -1)[..., None],
                         special[0][None, None], h)
            h = np.where(np.all(x == NULL_VALUE, -1)[..., None],
                         special[1][None, None], h)
        if column.is_sequence:
            seq = seq + h
        else:
            canvas = canvas + h

    seq = np.concatenate([canvas[:, None, :], seq], axis=1)  # (B, S+1, D)
    pos = np.arange(S + 1)[None, :]
    seq_mask = pos < (length + 2)[:, None]  # canvas token + zero-based len

    for i in range(num_blocks):
        seq = deepsvg_block(seq, p["blocks"][f"seq2seq_{i}"], seq_mask, num_heads)

    outputs = {}
    B = seq.shape[0]
    canvas_h, body = seq[:, :1], seq[:, 1:]
    for column in schema.valid_columns(True):
        head = p["decoder"][f"decoder_{column.name}"]
        src = body if column.is_sequence else canvas_h
        out = dense(src, head)
        if column.is_categorical:
            shape = (column.shape[-1], column.input_dim)
        else:
            shape = (column.shape[-1],)
        if column.is_sequence:
            out = out.reshape((B, -1) + shape)
        else:
            out = out.reshape((B,) + shape)
        outputs[column.name] = out
    return outputs


@pytest.mark.parametrize("fixture", ["crello_spec"])  # rico has no canvas columns
def test_flax_canvas_context_matches_numpy_reference(request, fixture):
    spec = request.getfixturevalue(fixture)
    schema = spec.schema
    model = MFPModel(
        schema, latent_dim=32, num_blocks=2, num_heads=4,
        attention_impl="xla", context="canvas",
    )
    host = next(iter(spec.make_dataset("val", batch_size=4)))
    batch = {k: jnp.asarray(v) for k, v in split_device_batch(host).items()}
    params = init_params(model, batch, seed=0)

    seq_mask = get_seq_mask(batch["length"], schema.max_length)
    masks = get_initial_masks(schema, seq_mask)
    masks["left"] = seq_mask
    modified = preprocess_for_test(batch, schema, masks)

    got = model.apply(params, modified, deterministic=True)
    expect = numpy_forward_canvas(
        jax.device_get(params), jax.device_get(modified), schema,
        num_heads=4, num_blocks=2,
    )
    assert set(expect) <= set(got)
    for name, ref in expect.items():
        np.testing.assert_allclose(
            np.asarray(got[name]), ref, rtol=5e-4, atol=5e-5,
            err_msg=f"column {name}",
        )


def postnorm_block(x, p, mask, num_heads):
    """Post-norm TransformerBlock (reference transformer.py:141-205)."""
    y = attention(x, p["attn"], mask, num_heads)
    x = layer_norm(x + y, np.asarray(p["norm1"]["scale"]),
                   np.asarray(p["norm1"]["bias"]))
    y = dense(x, p["mlp_0"])
    y = np.maximum(y, 0.0)
    y = dense(y, p["mlp_1"])
    return layer_norm(x + y, np.asarray(p["norm2"]["scale"]),
                      np.asarray(p["norm2"]["bias"]))


def test_flax_postnorm_block_matches_numpy(crello_spec):
    """block_type='transformer' (post-norm) wiring vs independent NumPy."""
    schema = crello_spec.schema
    model = MFPModel(
        schema, latent_dim=32, num_blocks=2, num_heads=4,
        attention_impl="xla", block_type="transformer",
    )
    host = next(iter(crello_spec.make_dataset("val", batch_size=4)))
    batch = {k: jnp.asarray(v) for k, v in split_device_batch(host).items()}
    params = init_params(model, batch, seed=0)

    seq_mask = get_seq_mask(batch["length"], schema.max_length)
    masks = get_initial_masks(schema, seq_mask)
    masks["top"] = seq_mask
    modified = preprocess_for_test(batch, schema, masks)
    got = model.apply(params, modified, deterministic=True)

    # Reuse the default-mode oracle but swap the block function.
    p = jax.device_get(params)["params"]
    md = jax.device_get(modified)
    sm = np.asarray(seq_mask)
    seq = 0.0
    for column in schema.valid_columns():
        x = np.asarray(md[column.name])
        if column.is_categorical:
            seq = seq + np.asarray(p["encoder"][f"input_{column.name}"])[x].sum(axis=2)
        else:
            e = p["encoder"]
            special = np.asarray(e[f"input_{column.name}_special"])
            h = dense(x, e[f"input_{column.name}"])
            h = np.where(np.all(x == MASK_VALUE, -1)[..., None],
                         special[0][None, None], h)
            h = np.where(np.all(x == NULL_VALUE, -1)[..., None],
                         special[1][None, None], h)
            seq = seq + h
    for i in range(2):
        seq = postnorm_block(seq, p["blocks"][f"seq2seq_{i}"], sm, 4)
    ref = dense(seq, p["decoder"]["decoder_top"]).reshape(4, -1, 1, 64)
    np.testing.assert_allclose(
        np.asarray(got["top"]), ref, rtol=5e-4, atol=5e-5
    )


def numpy_forward_flat(params, modified, schema, num_heads, num_blocks):
    """Independent NumPy forward for seq_type='flat' (VanillaTransformer,
    reference model.py:55-71): one token per (element, field) with a learned
    position embedding (encoder.py:126-135, 200-212), blocks over the S*F
    stream, per-field head on the split-back tokens (decoder.py:84-89)."""
    p = params["params"]
    enc = p["encoder"]
    seq_mask = np.asarray(get_seq_mask(modified["length"], schema.max_length))
    B = seq_mask.shape[0]
    D = None

    fields = []
    for column in schema.valid_columns():
        x = np.asarray(modified[column.name])
        if column.is_categorical:
            table = np.asarray(enc[f"input_{column.name}"])
            h = table[x].sum(axis=2)
        else:
            special = np.asarray(enc[f"input_{column.name}_special"])
            h = dense(x, enc[f"input_{column.name}"])
            h = np.where(np.all(x == MASK_VALUE, -1)[..., None],
                         special[0][None, None], h)
            h = np.where(np.all(x == NULL_VALUE, -1)[..., None],
                         special[1][None, None], h)
        fields.append(h)
        D = h.shape[-1]
    F = len(fields)

    seq = np.stack(fields, axis=2).reshape(B, -1, D)  # (B, S*F, D)
    mask = np.repeat(seq_mask, F, axis=1)
    pos = np.asarray(enc["emb_seq_pos"]["embeddings"])[None, : seq.shape[1]]
    seq = seq + pos

    for i in range(num_blocks):
        seq = deepsvg_block(seq, p["blocks"][f"seq2seq_{i}"], mask, num_heads)

    outputs = {}
    per_field = seq.reshape(B, -1, F, D)
    for fi, column in enumerate(schema.valid_columns()):
        head = p["decoder"][f"decoder_{column.name}"]
        out = dense(per_field[:, :, fi, :], head)
        if column.is_categorical:
            out = out.reshape(B, -1, column.shape[-1], column.input_dim)
        else:
            out = out.reshape(B, -1, column.shape[-1])
        outputs[column.name] = out
    return outputs


@pytest.mark.parametrize("fixture", ["crello_spec", "rico_spec"])
@pytest.mark.slow
def test_flax_flat_seq_matches_numpy_reference(request, fixture):
    spec = request.getfixturevalue(fixture)
    schema = spec.schema
    model = MFPModel(
        schema, latent_dim=32, num_blocks=2, num_heads=4,
        attention_impl="xla", seq_type="flat", input_dtype="shuffled_set",
    )
    host = next(iter(spec.make_dataset("val", batch_size=4)))
    batch = {k: jnp.asarray(v) for k, v in split_device_batch(host).items()}
    params = init_params(model, batch, seed=0)

    seq_mask = get_seq_mask(batch["length"], schema.max_length)
    masks = get_initial_masks(schema, seq_mask)
    masks["width"] = seq_mask
    modified = preprocess_for_test(batch, schema, masks)

    got = model.apply(params, modified, deterministic=True)
    expect = numpy_forward_flat(
        jax.device_get(params), jax.device_get(modified), schema,
        num_heads=4, num_blocks=2,
    )
    for name, ref in expect.items():
        np.testing.assert_allclose(
            np.asarray(got[name]), ref, rtol=5e-4, atol=5e-5,
            err_msg=f"column {name}",
        )
