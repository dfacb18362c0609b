"""Autoregressive element decoders: AutoReg and BART.

Counterparts of reference ``src/mfp/mfp/models/model.py:74-220`` (AutoReg)
and ``model.py:332-401`` (BART).  Both predict elements left-to-right with a
learned BOS embedding; training is teacher-forced on ground-truth
embeddings, evaluation re-encodes each step's committed prediction
(``_compute_next``, model.py:108-141).

TPU-first restructuring: the reference grew its hidden sequence with a
dynamic ``tf.concat`` per step (model.py:202-215), a shape-changing loop XLA
cannot compile.  Here decoding keeps a **static** ``(B, S, D)`` buffer —
causal attention guarantees positions ``> t`` cannot influence position
``t``, so the not-yet-generated tail can hold anything — and each step
writes one slot.  The whole decode therefore jit-compiles with fixed shapes.

Note: the reference's BART is unreachable *and* broken (it requests a
``"deepsvg_cross"`` block type that ``get_seq_block`` cannot resolve,
model.py:359 + transformer.py:232-236).  :class:`CrossBlock` here is a
working pre-norm decoder block: causal self-attention, cross-attention over
the encoder memory, MLP.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn

from ...ops.rng import FastDropout
import jax.numpy as jnp

from ...data.schema import Schema
from ..decoder import Decoder
from ..encoder import Encoder
from ..transformer import (
    Blocks,
    MultiHeadAttention,
    make_dense,
    make_layernorm,
)

Arrays = Dict[str, jnp.ndarray]


class CrossBlock(nn.Module):
    """Pre-norm decoder block: causal self-attn + cross-attn + MLP."""

    emb_size: int
    num_heads: int = 8
    dropout: float = 0.1
    attention_impl: str = "auto"

    @nn.compact
    def __call__(self, x, memory, tgt_mask, memory_mask, deterministic=True):
        y = make_layernorm("norm1")(x)
        y = MultiHeadAttention(
            self.emb_size, self.num_heads, lookahead=False,
            attention_impl=self.attention_impl, name="self_attn",
        )(y, tgt_mask)
        x = x + FastDropout(self.dropout)(y, deterministic=deterministic)

        y = make_layernorm("norm2")(x)
        y = MultiHeadAttention(
            self.emb_size, self.num_heads, lookahead=True,
            attention_impl=self.attention_impl, name="cross_attn",
        )(y, memory_mask, kv=memory)
        x = x + FastDropout(self.dropout)(y, deterministic=deterministic)

        y = make_layernorm("norm3")(x)
        y = make_dense(2 * self.emb_size, "mlp_0")(y)
        y = make_dense(self.emb_size, "mlp_1")(nn.relu(y))
        return x + FastDropout(self.dropout)(y, deterministic=deterministic)


class CrossBlocks(nn.Module):
    """Stack of decoder blocks (working version of reference CrossBlocks,
    transformer.py:283-298)."""

    latent_dim: int
    num_blocks: int = 2
    num_heads: int = 8
    dropout: float = 0.1
    attention_impl: str = "auto"

    @nn.compact
    def __call__(self, x, memory, tgt_mask, memory_mask, deterministic=True):
        for i in range(self.num_blocks):
            x = CrossBlock(
                self.latent_dim, self.num_heads, self.dropout,
                self.attention_impl, name=f"cross_{i}",
            )(x, memory, tgt_mask, memory_mask, deterministic)
        return x


class _ARBase(nn.Module):
    """Shared pieces: encoder, decoder heads, BOS, step re-encoding."""

    schema: Schema
    latent_dim: int = 256
    num_blocks: int = 4
    block_type: str = "deepsvg"
    num_heads: int = 8
    dropout: float = 0.1
    input_dtype: str = "shuffled_set"
    attention_impl: str = "auto"

    # Autoregressive models shuffle inputs and elem-mask the LAST element
    # during training preprocessing (reference mfp.py:105-108, 239).
    is_autoreg: bool = True

    def setup(self):
        self.encoder = Encoder(
            self.schema,
            latent_dim=self.latent_dim,
            input_dtype=self.input_dtype,
            dropout=self.dropout,
            name="encoder",
        )
        self.decoder = Decoder(
            self.schema, latent_dim=self.latent_dim, name="decoder"
        )
        self.bos = self.param(
            "bos", nn.initializers.normal(stddev=0.05), (1, 1, self.latent_dim)
        )

    def _next_embedding(self, h_t, inputs, mfp_masks, t):
        """Decode step t, merge with GT on unmasked fields, re-encode.

        Reference model.py:108-141.  ``t`` may be a traced scalar (the
        decode loop is an ``nn.scan``), so slices are dynamic.
        """
        import jax

        def slice1(x):
            return jax.lax.dynamic_slice_in_dim(x, t, 1, axis=1)

        outputs_t = self.decoder(h_t, deterministic=True)
        new_inputs: Arrays = {}
        for c in self.schema.modeled:
            if not c.is_sequence:
                continue
            out = outputs_t[c.name]
            if c.is_categorical:
                out = jnp.argmax(out, axis=-1).astype(inputs[c.name].dtype)
            new_inputs[c.name] = jnp.where(
                slice1(mfp_masks[c.name])[..., None],
                out[:, :1],
                slice1(inputs[c.name]),
            )
        B = h_t.shape[0]
        new_inputs["length"] = jnp.zeros((B, 1), dtype=jnp.int32)
        next_emb, _ = self.encoder(new_inputs, deterministic=True)
        return next_emb  # (B, 1, D)


class AutoReg(_ARBase):
    """Causal transformer over element embeddings (model.py:144-220)."""

    def setup(self):
        super().setup()
        self.blocks = Blocks(
            latent_dim=self.latent_dim,
            num_blocks=self.num_blocks,
            block_type=self.block_type,
            num_heads=self.num_heads,
            dropout=self.dropout,
            lookahead=False,
            attention_impl=self.attention_impl,
        )

    def __call__(
        self,
        inputs: Arrays,
        targets: Arrays,
        mfp_masks: Arrays,
        deterministic: bool = True,
    ) -> Tuple[Arrays, Dict[str, jnp.ndarray]]:
        blocks = self.blocks
        B = inputs["length"].shape[0]
        bos = jnp.broadcast_to(self.bos, (B, 1, self.latent_dim))

        if not deterministic:
            # Teacher forcing: [BOS, gt_1..gt_{S-1}] predicts [e_1..e_S].
            _, mask = self.encoder(inputs, deterministic=False)
            h_tgt, _ = self.encoder(targets, deterministic=False)
            h = jnp.concatenate([bos, h_tgt[:, :-1]], axis=1)
            h = blocks(h, mask, deterministic=False)
            return self.decoder(h, deterministic=False), {}

        # Sequential decode over a static (B, S, D) buffer; the per-step
        # loop is an nn.scan (params broadcast), not a Python unroll —
        # S-1 unrolled transformer passes made a giant HLO whose remote
        # XLA compile took tens of minutes.
        import jax
        import flax.linen as nn

        _, mask = self.encoder(inputs, deterministic=True)
        S = mask.shape[1]
        buf = jnp.concatenate(
            [bos, jnp.zeros((B, S - 1, self.latent_dim))], axis=1
        )

        def step(mdl, buf, t):
            h = mdl.blocks(buf, mask, deterministic=True)
            h_t = jax.lax.dynamic_slice_in_dim(h, t, 1, axis=1)
            nxt = mdl._next_embedding(h_t, inputs, mfp_masks, t)
            buf = jax.lax.dynamic_update_slice_in_dim(buf, nxt, t + 1, axis=1)
            return buf, None

        scan = nn.scan(
            step, variable_broadcast="params",
            split_rngs={"params": False},
        )
        buf, _ = scan(self, buf, jnp.arange(S - 1))
        h = blocks(buf, mask, deterministic=True)
        return self.decoder(h, deterministic=True), {}


class BART(_ARBase):
    """Bidirectional encoder over the masked set + causal cross-attention
    decoder (model.py:332-401, repaired)."""

    def setup(self):
        super().setup()
        self.enc_blocks = Blocks(
            latent_dim=self.latent_dim,
            num_blocks=max(self.num_blocks // 2, 1),
            block_type=self.block_type,
            num_heads=self.num_heads,
            dropout=self.dropout,
            attention_impl=self.attention_impl,
        )
        self.dec_blocks = CrossBlocks(
            latent_dim=self.latent_dim,
            num_blocks=max(self.num_blocks // 2, 1),
            num_heads=self.num_heads,
            dropout=self.dropout,
            attention_impl=self.attention_impl,
        )

    def __call__(
        self,
        inputs: Arrays,
        targets: Arrays,
        mfp_masks: Arrays,
        deterministic: bool = True,
    ) -> Tuple[Arrays, Dict[str, jnp.ndarray]]:
        enc_blocks = self.enc_blocks
        dec_blocks = self.dec_blocks
        B = inputs["length"].shape[0]
        bos = jnp.broadcast_to(self.bos, (B, 1, self.latent_dim))

        h_masked, mask = self.encoder(inputs, deterministic=deterministic)
        memory = enc_blocks(h_masked, mask, deterministic=deterministic)

        if not deterministic:
            h_tgt, _ = self.encoder(targets, deterministic=False)
            h = jnp.concatenate([bos, h_tgt[:, :-1]], axis=1)
            h = dec_blocks(h, memory, mask, mask, deterministic=False)
            return self.decoder(h, deterministic=False), {}

        # Scanned sequential decode (see AutoReg.__call__).
        import jax
        import flax.linen as nn

        S = mask.shape[1]
        buf = jnp.concatenate(
            [bos, jnp.zeros((B, S - 1, self.latent_dim))], axis=1
        )

        def step(mdl, buf, t):
            h = mdl.dec_blocks(buf, memory, mask, mask, deterministic=True)
            h_t = jax.lax.dynamic_slice_in_dim(h, t, 1, axis=1)
            nxt = mdl._next_embedding(h_t, inputs, mfp_masks, t)
            buf = jax.lax.dynamic_update_slice_in_dim(buf, nxt, t + 1, axis=1)
            return buf, None

        scan = nn.scan(
            step, variable_broadcast="params",
            split_rngs={"params": False},
        )
        buf, _ = scan(self, buf, jnp.arange(S - 1))
        h = dec_blocks(buf, memory, mask, mask, deterministic=True)
        return self.decoder(h, deterministic=True), {}
