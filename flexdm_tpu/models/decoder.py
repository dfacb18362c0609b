"""Per-field decoder heads (flax.linen).

Counterpart of reference ``src/mfp/mfp/models/architecture/decoder.py``:
each valid column gets a Dense head over the transformed sequence —
categorical heads emit ``shape[-1] * input_dim`` units reshaped to
``(B, S, C, input_dim)`` logits (decoder.py:33-43, 96-110); numerical heads
regress the raw vector (e.g. the 512-d embeddings) directly.  With a context
token the first position is split off for canvas-level heads
(decoder.py:74-78); ``detachment='flat'`` splits an S*F token stream back
into per-field sequences (decoder.py:84-89).
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..data.schema import Schema
from .masking import get_seq_mask
from .transformer import DenseParams, make_dense


class Decoder(nn.Module):
    schema: Schema
    latent_dim: int = 256
    context: Optional[str] = None
    detachment: str = "default"
    dtype: str = None

    def setup(self):
        assert self.detachment in ("default", "flat", "none"), self.detachment
        if self.context is not None:
            assert self.detachment == "default"

    @property
    def use_canvas(self) -> bool:
        return self.context == "canvas"

    def predict_mask(self, z: jnp.ndarray) -> jnp.ndarray:
        """Infer the validity mask from length logits (decoder.py:68-70)."""
        logits = make_dense(
            self.schema["length"].input_dim, "decoder_length"
        )(z)
        return get_seq_mask(logits, self.schema.max_length, from_logits=True)

    @nn.compact
    def __call__(self, inputs, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        schema = self.schema
        valid = schema.valid_columns(self.use_canvas)

        if self.context in ("id", "length", "canvas"):
            canvas_h = inputs[:, :1]
            seq = inputs[:, 1:]
        else:
            canvas_h = None
            seq = inputs

        if self.detachment == "flat":
            # (B, S*F, D) -> per-field (B, S, D)
            B = seq.shape[0]
            F = len(valid)
            seq = seq.reshape(B, -1, F, self.latent_dim)
            per_field = {
                c.name: seq[:, :, i, :] for i, c in enumerate(valid)
            }
        elif self.detachment == "none":
            per_field = inputs  # already a dict of per-field features
            B = next(iter(inputs.values())).shape[0]
        else:
            per_field = None
            B = seq.shape[0]

        def head_shapes(column):
            if column.is_categorical:
                units = column.shape[-1] * column.input_dim
                out_shape = (column.shape[-1], column.input_dim)
            else:
                units = column.shape[-1]
                out_shape = (column.shape[-1],)
            return units, out_shape

        outputs: Dict[str, jnp.ndarray] = {}

        if self.detachment == "default":
            # All sequence heads share the same input, so their Dense
            # kernels concatenate into ONE (D, sum units) matmul — ~15
            # small kernels collapse into a single MXU-friendly one.
            # Parameter layout stays identical to per-head nn.Dense.
            seq_cols = [c for c in valid if c.is_sequence]
            kbs = []
            for column in seq_cols:
                units, _ = head_shapes(column)
                kbs.append(
                    DenseParams(units, name=f"decoder_{column.name}")(
                        self.latent_dim
                    )
                )
            kernel = jnp.concatenate([k for k, _ in kbs], axis=1)
            bias = jnp.concatenate([b for _, b in kbs], axis=0)
            if self.dtype is not None:
                kernel = kernel.astype(self.dtype)
                bias = bias.astype(self.dtype)
                seq = seq.astype(self.dtype)
            fused = seq @ kernel + bias
            offset = 0
            for column in seq_cols:
                units, out_shape = head_shapes(column)
                outputs[column.name] = fused[
                    ..., offset : offset + units
                ].reshape((B, -1) + out_shape)
                offset += units
            for column in valid:
                if not column.is_sequence:
                    units, out_shape = head_shapes(column)
                    head = make_dense(
                        units, f"decoder_{column.name}", self.dtype
                    )
                    outputs[column.name] = head(canvas_h).reshape(
                        (B,) + out_shape
                    )
            return outputs

        for column in valid:
            units, out_shape = head_shapes(column)
            head = make_dense(units, f"decoder_{column.name}", self.dtype)
            if column.is_sequence:
                h = seq if per_field is None else per_field[column.name]
                outputs[column.name] = head(h).reshape((B, -1) + out_shape)
            else:
                outputs[column.name] = head(canvas_h).reshape((B,) + out_shape)
        return outputs
