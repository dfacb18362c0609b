"""LayoutVAE baseline: per-attribute autoregressive conditional VAE.

Counterpart of reference ``src/mfp/mfp/models/layoutvae.py``: elements are
predicted one at a time; at step ``i`` a transformer context ``c_i`` is
computed from [committed elements 0..i-1, masked inputs i..S-1], each
attribute gets a posterior (training, from the GT attribute embedding) or
prior (inference) latent, a per-attribute CVAE decoder produces features,
and the KL between posterior and prior — weighted by the mfp mask — joins
the loss (layoutvae.py:46-126).

TPU-first restructuring (two layers of it):

* The reference concatenated growing prefixes (``h_targets[:, :i]`` +
  ``h_inputs[:, i:]``, layoutvae.py:67-69), a dynamic shape per step.  Here
  the fusion is a fixed-shape ``where(pos < i, ...)`` select over two
  precomputed (B, S, D) tensors, so every step has identical shapes.
* The per-element loop itself is an ``nn.scan`` (params broadcast, per-step
  dropout/vae rngs), NOT a Python loop: unrolling S=50 full transformer
  passes into one graph produced an HLO whose (remote) XLA compile ran tens
  of minutes; the scanned body compiles once.  Same math, same parameter
  tree.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
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

    def setup(self):
        self.encoder = Encoder(
            self.schema, latent_dim=self.latent_dim, dropout=self.dropout,
        )
        self.encoder_gt = Encoder(
            self.schema, latent_dim=self.latent_dim, dropout=self.dropout,
            fusion="none",
        )
        self.blocks = Blocks(
            latent_dim=self.latent_dim,
            num_blocks=self.num_blocks,
            block_type=self.block_type,
            num_heads=self.num_heads,
            dropout=self.dropout,
            attention_impl=self.attention_impl,
        )
        self.encoder_cvae = MACVAEEncoder(self._keys)
        self.decoder_cvae = MACVAEDecoder(self._keys)
        self.prior = MAPrior(self._keys)
        self.decoder = Decoder(
            self.schema, latent_dim=self.latent_dim, detachment="none",
        )

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

        h_inputs, mask = self.encoder(inputs, deterministic)
        train = not deterministic
        pos = jnp.arange(S)[None, :, None]  # (1, S, 1)

        def slice1(x, i):
            return jax.lax.dynamic_slice_in_dim(x, i, 1, axis=1)

        aux: Dict[str, jnp.ndarray] = {}
        if train:
            h_targets, _ = self.encoder(targets, deterministic)
            h_gts, _ = self.encoder_gt(targets, deterministic)

            def step(mdl, carry, i):
                h_fused = jnp.where(pos < i, h_targets, h_inputs)
                c = slice1(
                    mdl.blocks(h_fused, mask, deterministic=deterministic), i
                )
                h_i = {k: slice1(h_gts[k], i) for k in keys}
                zs = mdl.encoder_cvae(h_i, c, deterministic)
                zs_p = mdl.prior(c, deterministic)
                feats = mdl.decoder_cvae(
                    {k: zs[k]["z"] for k in keys}, c, deterministic
                )
                stats = {
                    k: (zs[k]["z_mean"], zs[k]["z_log_sigma"],
                        zs_p[k]["z_mean"], zs_p[k]["z_log_sigma"])
                    for k in keys
                }
                return carry, (feats, stats)

            scan = nn.scan(
                step,
                variable_broadcast="params",
                split_rngs={"params": False, "dropout": True, "vae": True},
                in_axes=0,
                out_axes=1,
            )
            _, (feats_seq, stats_seq) = scan(self, 0, jnp.arange(S))
            # scan stacks the (B, 1, ...) per-step outputs on axis 1 ->
            # (B, S, 1, ...); drop the singleton step axis.
            features = {k: feats_seq[k][:, :, 0] for k in keys}

            kl_total = jnp.asarray(0.0)
            for k in keys:
                mq, lq, mp, lp = (s[:, :, 0] for s in stats_seq[k])
                kl = gaussian_kl(mq, lq, mp, lp)  # (B, S)
                kl = self.kl * kl * mfp_masks[k].astype(jnp.float32)
                kl = jnp.mean(kl)
                aux[f"{k}_kl"] = kl  # metric only; summed into kl_loss below
                kl_total = kl_total + kl
            aux["kl_loss"] = kl_total
        else:
            committed0 = jnp.zeros_like(h_inputs)
            B = h_inputs.shape[0]

            def step(mdl, committed, i):
                h_fused = jnp.where(pos < i, committed, h_inputs)
                c = slice1(mdl.blocks(h_fused, mask, deterministic=True), i)
                zs = mdl.prior(c, True)
                feats = mdl.decoder_cvae(
                    {k: zs[k]["z"] for k in keys}, c, True
                )
                # Decode step i, merge with GT on unmasked fields, re-encode.
                outputs_i = mdl.decoder(
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
                        slice1(mfp_masks[k], i)[..., None],
                        out[:, :1],
                        slice1(inputs[k], i),
                    )
                new_inputs["length"] = jnp.zeros((B, 1), dtype=jnp.int32)
                elem, _ = mdl.encoder(new_inputs, deterministic=True)
                committed = jax.lax.dynamic_update_slice_in_dim(
                    committed, elem, i, axis=1
                )
                return committed, feats

            scan = nn.scan(
                step,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=0,
                out_axes=1,
            )
            _, feats_seq = scan(self, committed0, jnp.arange(S))
            features = {k: feats_seq[k][:, :, 0] for k in keys}

        outputs = self.decoder(features, deterministic=deterministic)
        return outputs, aux
