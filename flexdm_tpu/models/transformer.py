"""Transformer building blocks (flax.linen).

Counterpart of reference ``src/mfp/mfp/models/architecture/transformer.py``:
learned position embeddings (transformer.py:5-30), multi-head self/cross
attention with additive padding mask (transformer.py:33-138), the post-norm
``TransformerBlock`` (transformer.py:141-205) and the pre-norm
``DeepSVGBlock`` (transformer.py:208-229, the default), stacked by
:class:`Blocks` (transformer.py:239-298).

Initialization and normalization match keras defaults so training dynamics
are comparable: Dense = glorot-uniform kernel + zero bias, Embedding =
uniform(-0.05, 0.05), LayerNorm epsilon = 1e-3.  The attention core is the
fused TPU kernel from :mod:`flexdm_tpu.ops.attention`.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import dot_product_attention
from ..ops.rng import FastDropout

dense_kernel_init = nn.initializers.glorot_uniform()


def keras_embed_init(key, shape, dtype=jnp.float32):
    """keras Embedding default: uniform(-0.05, 0.05)."""
    import jax

    return jax.random.uniform(key, shape, dtype, minval=-0.05, maxval=0.05)


def make_dense(
    features: int, name: Optional[str] = None, dtype=None
) -> nn.Dense:
    return nn.Dense(
        features, kernel_init=dense_kernel_init, name=name, dtype=dtype
    )


def make_layernorm(name: Optional[str] = None, dtype=None) -> nn.LayerNorm:
    return nn.LayerNorm(epsilon=1e-3, name=name, dtype=dtype)


class DenseParams(nn.Module):
    """Kernel/bias parameters with nn.Dense's exact tree layout, exposed
    for fused (concatenated) application by the parent module."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", dense_kernel_init, (in_features, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class PositionEmbedding(nn.Module):
    """Learned positional table + dropout (reference transformer.py:5-30)."""

    output_dim: int
    maxlen: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, seq_len: int, batch: int, deterministic: bool = True):
        table = self.param(
            "embeddings", keras_embed_init, (self.maxlen + 1, self.output_dim)
        )
        emb = table[None, :seq_len, :]
        emb = jnp.broadcast_to(emb, (batch, seq_len, self.output_dim))
        return FastDropout(self.dropout)(emb, deterministic=deterministic)


class MultiHeadAttention(nn.Module):
    """QKV projections around the fused attention core.

    Covers both the self-attention (reference transformer.py:33-99) and
    cross-attention (transformer.py:102-138) variants: pass ``kv`` for cross.
    """

    emb_size: int
    num_heads: int = 8
    lookahead: bool = True
    attention_impl: str = "auto"
    dtype: str = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        key_mask: Optional[jnp.ndarray] = None,
        kv: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        if self.emb_size % self.num_heads != 0:
            raise ValueError(
                f"emb_size {self.emb_size} not divisible by "
                f"num_heads {self.num_heads}"
            )
        head_dim = self.emb_size // self.num_heads
        source = x if kv is None else kv
        b, s_q = x.shape[:2]
        s_kv = source.shape[1]

        def split_heads(t, s):
            return t.reshape(b, s, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        if kv is None:
            # Self-attention: Q/K/V share the input, so the three (D, D)
            # projections concatenate into ONE (D, 3D) matmul.  Parameters
            # keep the per-projection nn.Dense tree layout (query/key/value)
            # for checkpoint-converter parity; they are concatenated at
            # apply time like the fused decoder heads.
            kbs = [
                DenseParams(self.emb_size, name=name)(self.emb_size)
                for name in ("query", "key", "value")
            ]
            kernel = jnp.concatenate([w for w, _ in kbs], axis=1)
            bias = jnp.concatenate([c for _, c in kbs], axis=0)
            if self.dtype is not None:
                kernel = kernel.astype(self.dtype)
                bias = bias.astype(self.dtype)
                x = x.astype(self.dtype)
            qkv = x @ kernel + bias
            q, k, v = (
                split_heads(t, s_q)
                for t in jnp.split(qkv, 3, axis=-1)
            )
        else:
            q = split_heads(make_dense(self.emb_size, "query", self.dtype)(x), s_q)
            k = split_heads(make_dense(self.emb_size, "key", self.dtype)(source), s_kv)
            v = split_heads(make_dense(self.emb_size, "value", self.dtype)(source), s_kv)

        o = dot_product_attention(
            q,
            k,
            v,
            key_mask=key_mask,
            causal=not self.lookahead,
            impl=self.attention_impl,
        )
        o = o.transpose(0, 2, 1, 3).reshape(b, s_q, self.emb_size)
        return make_dense(self.emb_size, "out", self.dtype)(o)


class _BlockBase(nn.Module):
    emb_size: int = 64
    num_heads: int = 8
    ff_dim: Optional[int] = None
    dropout: float = 0.1
    conditional: bool = False
    lookahead: bool = True
    attention_impl: str = "auto"
    dtype: str = None

    def _mlp(self, x):
        h = make_dense(self.ff_dim or 2 * self.emb_size, "mlp_0", self.dtype)(x)
        h = nn.relu(h)
        return make_dense(self.emb_size, "mlp_1", self.dtype)(h)

    def _attn(self, name="attn"):
        return MultiHeadAttention(
            self.emb_size,
            self.num_heads,
            lookahead=self.lookahead,
            attention_impl=self.attention_impl,
            dtype=self.dtype,
            name=name,
        )

    def _norm(self, name):
        return make_layernorm(name, self.dtype)


class TransformerBlock(_BlockBase):
    """Post-norm block (reference transformer.py:141-205)."""

    @nn.compact
    def __call__(self, x, key_mask=None, z=None, deterministic=True):
        y = self._attn()(x, key_mask)
        y = FastDropout(self.dropout)(y, deterministic=deterministic)
        x = self._norm("norm1")(x + y)
        if self.conditional:
            zc = make_dense(self.emb_size, "conditional", self.dtype)(z)[:, None, :]
            x = self._norm("norm3")(x + zc)
        y = self._mlp(x)
        y = FastDropout(self.dropout)(y, deterministic=deterministic)
        return self._norm("norm2")(x + y)


class DeepSVGBlock(_BlockBase):
    """Pre-norm block, the default (reference transformer.py:208-229)."""

    @nn.compact
    def __call__(self, x, key_mask=None, z=None, deterministic=True):
        y = self._norm("norm1")(x)
        y = self._attn()(y, key_mask)
        y = FastDropout(self.dropout)(y, deterministic=deterministic)
        x = x + y
        if self.conditional:
            x = x + make_dense(self.emb_size, "conditional", self.dtype)(z)[:, None, :]
        y = self._norm("norm2")(x)
        y = self._mlp(y)
        y = FastDropout(self.dropout)(y, deterministic=deterministic)
        return x + y


BLOCK_TYPES = {
    "transformer": TransformerBlock,
    "deepsvg": DeepSVGBlock,
}


class Blocks(nn.Module):
    """Stack of N blocks (reference transformer.py:239-280)."""

    latent_dim: int = 128
    num_blocks: int = 1
    block_type: str = "deepsvg"
    num_heads: int = 8
    conditional: bool = False
    lookahead: bool = True
    dropout: float = 0.1
    attention_impl: str = "auto"
    dtype: str = None
    remat: bool = False  # rematerialize block activations in the backward

    @nn.compact
    def __call__(self, seq, key_mask=None, z=None, deterministic=True):
        block_cls = BLOCK_TYPES[self.block_type]
        if self.remat:
            # Trade FLOPs for HBM: recompute each block's activations in
            # the backward pass (jax.checkpoint) — matters for the scaled
            # 2x depth/width configs on long sequences.
            block_cls = nn.remat(block_cls, static_argnums=(4,))
        for i in range(self.num_blocks):
            seq = block_cls(
                emb_size=self.latent_dim,
                num_heads=self.num_heads,
                dropout=self.dropout,
                conditional=self.conditional,
                lookahead=self.lookahead,
                attention_impl=self.attention_impl,
                dtype=self.dtype,
                name=f"seq2seq_{i}",
            )(seq, key_mask, z, deterministic)
        return seq


def masked_average_pool(seq: jnp.ndarray, key_mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over valid positions (keras GlobalAveragePooling1D with mask)."""
    w = key_mask.astype(seq.dtype)[..., None]
    return jnp.sum(seq * w, axis=1) / jnp.maximum(jnp.sum(w, axis=1), 1.0)
