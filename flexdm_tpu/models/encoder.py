"""Schema-driven multi-attribute encoder (flax.linen).

Counterpart of reference ``src/mfp/mfp/models/architecture/encoder.py``.
For every valid column the encoder produces a ``(B, S, D)`` embedding:

* categorical: ``Embedding(input_dim + 2, D)`` — two extra rows for the
  ``[MASK]``/``[NULL]`` tokens — summed over the channel axis so e.g. RGB
  becomes a single vector (reference encoder.py:72-79, 157-160);
* numerical: ``Dense(D)`` of the raw vector, with a 2-row special embedding
  substituted wherever the input equals the all-channel ``MASK_VALUE`` /
  ``NULL_VALUE`` sentinel (reference encoder.py:80-92, 164-175).

Fusion modes: ``add`` (sum per-attribute embeddings -> one token per element,
the default), ``flat`` (one token per (element, field) with a learned
position embedding -> S*F sequence, for the VanillaTransformer baseline),
``none`` (per-attribute dict, for LayoutVAE).  Context modes prepend or add a
global token (encoder.py:228-249).  Positional embeddings only exist when
``input_dtype != 'set'`` — the default model is permutation-equivariant over
elements (encoder.py:41, 251-252).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..data.schema import MASK_VALUE, NULL_VALUE, Schema
from .masking import get_seq_mask
from ..ops.rng import FastDropout
from .transformer import (
    DenseParams,
    PositionEmbedding,
    keras_embed_init,
    make_dense,
)

CONTEXT_NAMES = (None, "id", "canvas", "length", "canvas_add")


class Encoder(nn.Module):
    schema: Schema
    latent_dim: int = 128
    context: Optional[str] = None
    input_dtype: str = "set"
    fusion: str = "add"
    dropout: float = 0.1
    use_elemwise_noise: bool = False
    noise_size: int = 4
    dtype: str = None  # computation dtype (params stay float32)

    def setup(self):
        assert self.context in CONTEXT_NAMES, self.context
        assert self.fusion in ("add", "concat", "flat", "none"), self.fusion

    @property
    def use_canvas(self) -> bool:
        return self.context is not None and "canvas" in self.context

    @property
    def use_pos_token(self) -> bool:
        return self.input_dtype != "set"

    @nn.compact
    def __call__(
        self, inputs: Dict[str, jnp.ndarray], deterministic: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        schema = self.schema
        B = inputs["length"].shape[0]
        seq_mask = get_seq_mask(inputs["length"], schema.max_length)

        # ALL sequence columns fuse into ONE matmul.  Categorical: each
        # column's channel-summed one-hot (vocabularies are tiny, <= ~66
        # ids) concatenated along the vocab axis against the stacked
        # embedding tables (reference encoder.py:72-79, 157-160).
        # Numerical: the raw vector — zeroed wherever the all-channel
        # MASK/NULL sentinel fires — against the stacked Dense kernels,
        # plus a 3-way indicator (normal/mask/null) whose table rows are
        # {bias, special[0], special[1]}, which reproduces the reference's
        # Dense + sentinel-substitution chain (encoder.py:80-92, 164-175)
        # exactly: normal*(xW+b) + mask*sp0 + null*sp1 with disjoint
        # selectors.  Sum-fusion over columns falls out of the same
        # contraction, the backward is a single MXU matmul (no scatters),
        # and ~20 small kernels collapse into one.  Parameters stay
        # per-column (concatenated at apply time) for checkpoint parity.
        cat_seq = [
            c for c in schema.valid_columns(self.use_canvas)
            if c.is_categorical and c.is_sequence
        ]
        num_seq = [
            c for c in schema.valid_columns(self.use_canvas)
            if not c.is_categorical and c.is_sequence
        ]
        data_s, data_c = [], []
        keys_s = []
        if self.fusion == "add" and (cat_seq or num_seq):
            tables = [
                self.param(
                    f"input_{c.name}",
                    keras_embed_init,
                    (c.input_dim + 2, self.latent_dim),
                )
                for c in cat_seq
            ]
            cdt = self.dtype or (
                tables[0].dtype if tables else jnp.float32
            )
            feats = [
                jnp.sum(
                    jax.nn.one_hot(
                        inputs[c.name], c.input_dim + 2, dtype=cdt
                    ),
                    axis=2,
                )
                for c in cat_seq
            ]
            rows = [t.astype(cdt) for t in tables]
            for c in num_seq:
                x = inputs[c.name]
                kernel, bias = DenseParams(
                    self.latent_dim, name=f"input_{c.name}"
                )(x.shape[-1])
                special = self.param(
                    f"input_{c.name}_special",
                    keras_embed_init,
                    (2, self.latent_dim),
                )
                is_masked = jnp.all(x == MASK_VALUE, axis=-1)
                is_unused = jnp.all(x == NULL_VALUE, axis=-1)
                normal = jnp.logical_not(is_masked | is_unused)
                feats.append(x.astype(cdt) * normal[..., None].astype(cdt))
                rows.append(kernel.astype(cdt))
                feats.append(
                    jnp.stack(
                        [normal, is_masked, is_unused], axis=-1
                    ).astype(cdt)
                )
                rows.append(
                    jnp.stack(
                        [bias, special[0], special[1]], axis=0
                    ).astype(cdt)
                )
            data_s.append(
                jnp.concatenate(feats, axis=-1)
                @ jnp.concatenate(rows, axis=0)
            )
            keys_s.append("__fused_sequence__")

        for column in schema.valid_columns(self.use_canvas):
            if self.fusion == "add" and column.is_sequence:
                continue  # every sequence column is in the fused matmul
            x = inputs[column.name]
            if column.is_categorical:
                table = self.param(
                    f"input_{column.name}",
                    keras_embed_init,
                    (column.input_dim + 2, self.latent_dim),
                )
                cdt = self.dtype or table.dtype
                onehot = jax.nn.one_hot(x, table.shape[0], dtype=cdt)
                onehot = jnp.sum(onehot, axis=2 if column.is_sequence else 1)
                h = onehot @ table.astype(cdt)
            else:
                special = self.param(
                    f"input_{column.name}_special",
                    keras_embed_init,
                    (2, self.latent_dim),
                )
                is_masked = jnp.all(x == MASK_VALUE, axis=-1)
                is_unused = jnp.all(x == NULL_VALUE, axis=-1)
                h = make_dense(self.latent_dim, f"input_{column.name}", self.dtype)(x)
                h = jnp.where(is_masked[..., None], special[0][None, None], h)
                h = jnp.where(is_unused[..., None], special[1][None, None], h)
            if column.is_sequence:
                data_s.append(h)
                keys_s.append(column.name)
            else:
                data_c.append(h)

        if self.use_canvas:
            assert data_c, "context='canvas' requires canvas columns"
        if self.fusion != "add":
            assert not data_c, "non-add fusion with canvas columns unsupported"

        if self.fusion == "add":
            seq = sum(data_s)
            canvas = sum(data_c) if data_c else None
        elif self.fusion == "concat":
            # Concatenate per-attribute embeddings, project back to D
            # (reference encoder.py:112-124).
            seq = jnp.concatenate(data_s, axis=-1)
            seq = make_dense(self.latent_dim, "fusion_fc", self.dtype)(seq)
            seq = nn.LayerNorm(epsilon=1e-3, name="fusion_norm")(seq)
            seq = FastDropout(self.dropout)(seq, deterministic=deterministic)
            canvas = None
        elif self.fusion == "flat":
            # (B, S, F, D) -> (B, S*F, D): one token per (element, field).
            F = len(data_s)
            seq = jnp.stack(data_s, axis=2).reshape(B, -1, self.latent_dim)
            seq_mask = jnp.repeat(seq_mask, F, axis=1)
            pos = PositionEmbedding(
                self.latent_dim,
                schema.max_length * F + 1,
                dropout=self.dropout,
                name="emb_seq_pos",
            )(seq.shape[1], B, deterministic)
            seq = seq + pos
            canvas = None
        elif self.fusion == "none":
            return {k: v for k, v in zip(keys_s, data_s)}, seq_mask
        else:
            raise NotImplementedError(self.fusion)

        if self.context == "canvas_add":
            seq = seq + canvas[:, None, :]
        elif self.context is not None:
            assert self.fusion == "add", self.fusion
            if self.context == "id":
                task_table = self.param(
                    "input_task",
                    keras_embed_init,
                    (len(schema.task_names), self.latent_dim),
                )
                task = inputs["task"].reshape(-1).astype(jnp.int32)
                canvas = task_table[task]
            elif self.context == "length":
                len_table = self.param(
                    "input_length",
                    keras_embed_init,
                    (schema["length"].input_dim, self.latent_dim),
                )
                canvas = len_table[inputs["length"].reshape(-1)]
            elif self.context == "canvas":
                pass  # canvas token already aggregated above
            # Prepend the global token; lengthen the mask by one.
            seq = jnp.concatenate([canvas[:, None, :], seq], axis=1)
            seq_mask = get_seq_mask(
                inputs["length"] + 1, schema.max_length + 1
            )

        if self.use_pos_token and self.fusion != "flat":
            seq = seq + PositionEmbedding(
                self.latent_dim,
                schema["length"].input_dim,
                dropout=self.dropout,
                name="input_const",
            )(seq.shape[1], B, deterministic)

        if self.use_elemwise_noise:
            # Per-element Gaussian noise projected into the latent space
            # (reference encoder.py:254-258), for stochastic generation.
            assert self.fusion == "add"
            noise = jax.random.normal(
                self.make_rng("noise"),
                seq.shape[:2] + (self.noise_size,),
                dtype=seq.dtype,
            )
            seq = seq + make_dense(self.latent_dim, "input_noise", self.dtype)(noise)

        return seq, seq_mask
