"""CanvasVAE baseline: a document-level VAE.

Counterpart of reference ``src/mfp/mfp/models/canvasvae.py``: encode the
whole (sorted) document conditioned on a length-context token, pool into a
reparameterized latent ``z``, predict the sequence length from ``z``, then
decode the full element set from learned constant embeddings conditioned on
``z`` (canvasvae.py:80-116).

Deviations from the reference, both deliberate:

* the reference computes ``h = enc_blocks(...)`` and then pools the
  *untransformed* embeddings (canvasvae.py:91-95, ``h`` is never used);
  here the transformed sequence is pooled, which is clearly the intent;
* BatchNorm before pooling becomes LayerNorm (stateless, SPMD-friendly;
  keras BatchNorm would add cross-batch state for no modeling benefit at
  this scale).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...data.schema import Schema
from ..decoder import Decoder
from ..encoder import Encoder
from ..masking import get_seq_mask
from ..transformer import (
    Blocks,
    PositionEmbedding,
    make_dense,
    make_layernorm,
    masked_average_pool,
)
from .cvae import Head

Arrays = Dict[str, jnp.ndarray]


class CanvasVAE(nn.Module):
    schema: Schema
    latent_dim: int = 256
    num_blocks: int = 4
    block_type: str = "deepsvg"
    num_heads: int = 8
    dropout: float = 0.1
    kl: float = 1.0
    attention_impl: str = "auto"
    input_dtype: str = "sorted_set"  # reference canvasvae.py:30

    @nn.compact
    def __call__(
        self,
        inputs: Arrays,
        targets: Optional[Arrays] = None,
        masks: Optional[Arrays] = None,
        deterministic: bool = True,
    ) -> Tuple[Arrays, Dict[str, jnp.ndarray]]:
        schema = self.schema
        aux: Dict[str, jnp.ndarray] = {}

        # Length-context token prepended by the encoder (context='length').
        h, enc_mask = Encoder(
            schema,
            latent_dim=self.latent_dim,
            context="length",
            input_dtype="sorted_set",
            dropout=self.dropout,
            name="encoder",
        )(inputs, deterministic)
        canvas = h[:, 0]
        sequence = h[:, 1:]
        seq_valid = enc_mask[:, 1:]

        h_enc = Blocks(
            latent_dim=self.latent_dim,
            num_blocks=max(self.num_blocks // 2, 1),
            block_type=self.block_type,
            num_heads=self.num_heads,
            dropout=self.dropout,
            conditional=True,
            attention_impl=self.attention_impl,
            name="enc_blocks",
        )(sequence, seq_valid, z=canvas, deterministic=deterministic)

        pooled = make_layernorm("pool_norm")(h_enc)
        pooled = masked_average_pool(nn.relu(pooled), seq_valid)
        z_out, kl_aux = Head(self.latent_dim, compute_kl=True, name="prior_head")(
            pooled, deterministic
        )
        z = z_out["z"]
        if "kl_divergence" in kl_aux:
            aux["kl_divergence"] = kl_aux["kl_divergence"]
            aux["kl_loss"] = self.kl * kl_aux["kl_divergence"]

        length_logits = make_dense(schema["length"].input_dim, "length_fc")(z)
        if deterministic:
            # Predict the length; decode that many constant tokens.
            mask = get_seq_mask(
                jnp.argmax(length_logits, axis=-1)[:, None], schema.max_length
            )
        else:
            labels = inputs["length"].reshape(-1)
            log_probs = jnp.take_along_axis(
                nn.log_softmax(length_logits), labels[:, None], axis=-1
            )
            aux["length_loss"] = -jnp.mean(log_probs)
            mask = get_seq_mask(inputs["length"], schema.max_length)

        sequence = PositionEmbedding(
            self.latent_dim,
            schema["length"].input_dim,
            dropout=self.dropout,
            name="embedding_const",
        )(mask.shape[1], mask.shape[0], deterministic)
        h_dec = Blocks(
            latent_dim=self.latent_dim,
            num_blocks=max(self.num_blocks // 2, 1),
            block_type=self.block_type,
            num_heads=self.num_heads,
            dropout=self.dropout,
            conditional=True,
            attention_impl=self.attention_impl,
            name="blocks",
        )(sequence, mask, z=z, deterministic=deterministic)
        outputs = Decoder(
            schema, latent_dim=self.latent_dim, name="decoder"
        )(h_dec, deterministic)
        return outputs, aux
