"""LayoutVAE baseline: per-attribute autoregressive conditional VAE.

Counterpart of reference ``src/mfp/mfp/models/layoutvae.py``: elements are
predicted one at a time; at step ``i`` a transformer context ``c_i`` is
computed from [committed elements 0..i-1, masked inputs i..S-1], each
attribute gets a posterior (training, from the GT attribute embedding) or
prior (inference) latent, a per-attribute CVAE decoder produces features,
and the KL between posterior and prior — weighted by the mfp mask — joins
the loss (layoutvae.py:46-126).

TPU-first restructuring: the reference concatenated growing prefixes
(``h_targets[:, :i]`` + ``h_inputs[:, i:]``, layoutvae.py:67-69), a dynamic
shape per step.  Here the fusion is a fixed-shape ``where(pos < i, ...)``
select over two precomputed (B, S, D) tensors, so every step has identical
shapes and the loop compiles as a single XLA program.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...data.schema import Schema
from ..decoder import Decoder
from ..encoder import Encoder
from ..transformer import Blocks
from .cvae import MACVAEDecoder, MACVAEEncoder, MAPrior, gaussian_kl

Arrays = Dict[str, jnp.ndarray]


class LayoutVAE(nn.Module):
    schema: Schema
    latent_dim: int = 256
    num_blocks: int = 4
    block_type: str = "deepsvg"
    num_heads: int = 8
    dropout: float = 0.1
    kl: float = 1.0
    attention_impl: str = "auto"
    is_autoreg: bool = True  # reference layoutvae.py:27

    @property
    def _keys(self) -> Tuple[str, ...]:
        return tuple(c.name for c in self.schema.valid_columns())

    @nn.compact
    def __call__(
        self,
        inputs: Arrays,
        targets: Optional[Arrays] = None,
        mfp_masks: Optional[Arrays] = None,
        deterministic: bool = True,
    ) -> Tuple[Arrays, Dict[str, jnp.ndarray]]:
        schema = self.schema
        keys = self._keys
        S = schema.max_length

        encoder = Encoder(
            schema, latent_dim=self.latent_dim, dropout=self.dropout,
            name="encoder",
        )
        encoder_gt = Encoder(
            schema, latent_dim=self.latent_dim, dropout=self.dropout,
            fusion="none", name="encoder_gt",
        )
        blocks = Blocks(
            latent_dim=self.latent_dim,
            num_blocks=self.num_blocks,
            block_type=self.block_type,
            num_heads=self.num_heads,
            dropout=self.dropout,
            attention_impl=self.attention_impl,
            name="blocks",
        )
        enc_cvae = MACVAEEncoder(keys, name="encoder_cvae")
        dec_cvae = MACVAEDecoder(keys, name="decoder_cvae")
        prior = MAPrior(keys, name="prior")
        head_decoder = Decoder(
            schema, latent_dim=self.latent_dim, detachment="none",
            name="decoder",
        )

        h_inputs, mask = encoder(inputs, deterministic)
        train = not deterministic
        if train:
            h_targets, _ = encoder(targets, deterministic)
            h_gts, _ = encoder_gt(targets, deterministic)

        pos = jnp.arange(S)[None, :, None]  # (1, S, 1)
        committed = jnp.zeros_like(h_inputs)  # eval: re-encoded predictions
        stacks: Dict[str, list] = {k: [] for k in keys}
        buffer: Dict[str, list] = {}

        for i in range(S):
            prefix = h_targets if train else committed
            h_fused = jnp.where(pos < i, prefix, h_inputs)
            c = blocks(h_fused, mask, deterministic=deterministic)[:, i : i + 1]

            if train:
                h_i = {k: h_gts[k][:, i : i + 1] for k in keys}
                zs = enc_cvae(h_i, c, deterministic)
                zs_p = prior(c, deterministic)
                for k in keys:
                    buffer.setdefault(k, []).append(
                        (zs[k]["z_mean"], zs[k]["z_log_sigma"],
                         zs_p[k]["z_mean"], zs_p[k]["z_log_sigma"])
                    )
                z = {k: zs[k]["z"] for k in keys}
            else:
                zs = prior(c, deterministic)
                z = {k: zs[k]["z"] for k in keys}

            feats = dec_cvae(z, c, deterministic)
            for k in keys:
                stacks[k].append(feats[k])

            if not train:
                # Decode step i, merge with GT on unmasked fields, re-encode.
                outputs_i = head_decoder(
                    {k: feats[k] for k in keys}, deterministic=True
                )
                new_inputs: Arrays = {}
                for c_spec in schema.modeled:
                    if not c_spec.is_sequence:
                        continue
                    k = c_spec.name
                    out = outputs_i[k]
                    if c_spec.is_categorical:
                        out = jnp.argmax(out, -1).astype(inputs[k].dtype)
                    new_inputs[k] = jnp.where(
                        mfp_masks[k][:, i : i + 1, None],
                        out[:, :1],
                        inputs[k][:, i : i + 1],
                    )
                new_inputs["length"] = jnp.zeros(
                    (h_inputs.shape[0], 1), dtype=jnp.int32
                )
                elem, _ = encoder(new_inputs, deterministic=True)
                committed = committed.at[:, i : i + 1].set(elem)

        aux: Dict[str, jnp.ndarray] = {}
        if train:
            kl_total = jnp.asarray(0.0)
            for k in keys:
                mq = jnp.concatenate([b[0] for b in buffer[k]], axis=1)
                lq = jnp.concatenate([b[1] for b in buffer[k]], axis=1)
                mp = jnp.concatenate([b[2] for b in buffer[k]], axis=1)
                lp = jnp.concatenate([b[3] for b in buffer[k]], axis=1)
                kl = gaussian_kl(mq, lq, mp, lp)  # (B, S)
                kl = self.kl * kl * mfp_masks[k].astype(jnp.float32)
                kl = jnp.mean(kl)
                aux[f"{k}_kl"] = kl  # metric only; summed into kl_loss below
                kl_total = kl_total + kl
            aux["kl_loss"] = kl_total

        features = {k: jnp.concatenate(v, axis=1) for k, v in stacks.items()}
        outputs = head_decoder(features, deterministic=deterministic)
        return outputs, aux
