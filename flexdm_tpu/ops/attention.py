"""Fused multi-head attention for TPU: flash forward AND backward.

The reference computes attention with separate matmul/softmax ops in TF eager
(reference ``src/mfp/mfp/models/architecture/transformer.py:60-76``): scores
``q @ k^T / sqrt(d)``, additive ``-1e9`` padding mask, optional causal band,
softmax, then ``p @ v``.  Here both passes are blockwise Pallas kernels with
online softmax, so the ``(B, H, S, S)`` probability tensor never exists in
HBM on either pass — HBM traffic is O(S·Dh):

* forward: grid ``(B, H, S/Bq)``; each cell streams K/V in ``Bk`` blocks
  through an online-softmax accumulator and emits the output block plus the
  row logsumexp (the flash residual).
* backward: ``delta = rowsum(dO·O)`` is one cheap fused XLA reduction; a
  ``dq`` kernel (grid over query blocks) and a ``dk``/``dv`` kernel (grid
  over key blocks) each rebuild probabilities blockwise from the saved
  logsumexp — recompute instead of an O(S²) residual.

K/V (and Q/dO in the key-grid kernel) for one ``(batch, head)`` stay VMEM
resident: at Dh ≤ 128 that bounds S at several thousand — far beyond
document scale — while keeping every matmul an MXU-shaped ``(128, Dh)``
tile.  Document sequences are tiny (S <= 50, padded to a lane-friendly
size), so one grid cell handles the whole sequence; at S > 128 the same
kernels tile with 128-row blocks.

``impl='xla'`` is the portable reference path (used on CPU and in parity
tests); ``impl='pallas'`` is the TPU fast path; ``impl='auto'`` picks by
backend and S (measured crossover: XLA fusion wins at document scale,
Pallas from S >= 512 up unless tile padding would waste >12.5% of the
kernel — see the dispatch rule in ``dot_product_attention``).  From S=4096 the backward switches to 4D-grid
streaming kernels whose buffers are all block-sized — the resident form
above overflows the 16 MB VMEM scoped limit there.
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


def _causal_neg(qi, j, bq, bk):
    """(bq, bk) additive mask for causal attention between blocks."""
    row = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    col = j * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    return jnp.where(col <= row, 0.0, NEG_INF)


def _flash_fwd_kernel(
    q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *, scale, causal, block_k
):
    """One (batch, head, q-block) per grid cell; online softmax over K."""
    qi = pl.program_id(2)
    bq = q_ref.shape[2]
    s = k_ref.shape[2]
    nk = s // block_k
    q = q_ref[0, 0].astype(jnp.float32) * scale  # (Bq, Dh)

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[0, 0, pl.ds(j * block_k, block_k)].astype(jnp.float32)
        v = v_ref[0, 0, pl.ds(j * block_k, block_k)].astype(jnp.float32)
        sc = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sc = sc + bias_ref[0, :, pl.ds(j * block_k, block_k)]
        if causal:
            sc = sc + _causal_neg(qi, j, bq, block_k)
        m_new = jnp.maximum(m, jnp.max(sc, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(sc - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(
            p, v, preferred_element_type=jnp.float32
        )
        return m_new, l, acc

    m0 = jnp.full((bq, 1), -jnp.inf, dtype=jnp.float32)
    l0 = jnp.zeros((bq, 1), dtype=jnp.float32)
    a0 = jnp.zeros((bq, q_ref.shape[3]), dtype=jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nk, body, (m0, l0, a0))
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0, 0] = (m + jnp.log(l)).astype(jnp.float32)


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref, dq_ref,
    *, scale, causal, block_k,
):
    """dq for one (batch, head, q-block): stream K/V, rebuild p from lse."""
    qi = pl.program_id(2)
    bq = q_ref.shape[2]
    s = k_ref.shape[2]
    nk = s // block_k
    q = q_ref[0, 0].astype(jnp.float32) * scale
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0]  # (Bq, 1)
    delta = delta_ref[0, 0]  # (Bq, 1)

    def body(j, acc):
        k = k_ref[0, 0, pl.ds(j * block_k, block_k)].astype(jnp.float32)
        v = v_ref[0, 0, pl.ds(j * block_k, block_k)].astype(jnp.float32)
        sc = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sc = sc + bias_ref[0, :, pl.ds(j * block_k, block_k)]
        if causal:
            sc = sc + _causal_neg(qi, j, bq, block_k)
        p = jnp.exp(sc - lse)
        dp = jax.lax.dot_general(
            do, v,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)
        return acc + jnp.dot(ds, k, preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(
        0, nk, body, jnp.zeros((bq, q_ref.shape[3]), dtype=jnp.float32)
    )
    dq_ref[0, 0] = (acc * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref, *, scale, causal, block_q,
):
    """dk/dv for one (batch, head, k-block): stream Q/dO blocks."""
    ki = pl.program_id(2)
    bk = k_ref.shape[2]
    s = q_ref.shape[2]
    nq = s // block_q
    k = k_ref[0, 0].astype(jnp.float32)  # (Bk, Dh)
    v = v_ref[0, 0].astype(jnp.float32)
    bias = bias_ref[0, :, pl.ds(ki * bk, bk)]  # (1, Bk)

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, 0, pl.ds(i * block_q, block_q)].astype(jnp.float32)
        do = do_ref[0, 0, pl.ds(i * block_q, block_q)].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(i * block_q, block_q)]  # (Bq, 1)
        delta = delta_ref[0, 0, pl.ds(i * block_q, block_q)]
        sc = jax.lax.dot_general(
            q * scale, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sc = sc + bias
        if causal:
            sc = sc + _causal_neg(i, ki, block_q, bk)
        p = jnp.exp(sc - lse)  # (Bq, Bk)
        dv = dv + jax.lax.dot_general(
            p, do,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)
        dk = dk + jax.lax.dot_general(
            ds, q,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk, dv

    dh = k_ref.shape[3]
    z = jnp.zeros((bk, dh), dtype=jnp.float32)
    dk, dv = jax.lax.fori_loop(0, nq, body, (z, z))
    dk_ref[0, 0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


# From this sequence length on, the backward runs as 4D-grid streaming
# kernels: the resident-K/V backward kernels keep whole (S, Dh) arrays
# double-buffered in VMEM and overflow the 16 MB scoped limit at S=4096
# (measured 17-18 MB).  Below it, the resident kernels are faster (fewer,
# larger grid cells).
_BWD_STREAM_MIN_S = 4096


def _flash_bwd_dq_stream_kernel(
    q_ref, k_ref, v_ref, bias_ref, lse_ref, delta_ref, do_ref, dq_ref,
    *, scale, causal,
):
    """dq for one (batch, head, q-block, k-block) cell; dq block accumulates
    across the innermost (k-block) grid dim.  Every buffer is block-sized,
    so VMEM stays O(block·Dh) at any S."""
    qi, j = pl.program_id(2), pl.program_id(3)
    q = q_ref[0, 0].astype(jnp.float32) * scale  # (Bq, Dh)
    k = k_ref[0, 0].astype(jnp.float32)  # (Bk, Dh)
    v = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0]  # (Bq, 1)
    delta = delta_ref[0, 0]
    sc = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    sc = sc + bias_ref[0]
    if causal:
        sc = sc + _causal_neg(qi, j, q.shape[0], k.shape[0])
    p = jnp.exp(sc - lse)
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta)

    @pl.when(j == 0)
    def _():
        dq_ref[0, 0] = jnp.zeros_like(dq_ref[0, 0])

    dq_ref[0, 0] += scale * jnp.dot(
        ds, k, preferred_element_type=jnp.float32
    )


def _flash_bwd_dkv_stream_kernel(
    q_ref, k_ref, v_ref, bias_ref, lse_ref, delta_ref, do_ref,
    dk_ref, dv_ref, *, scale, causal,
):
    """dk/dv for one (batch, head, k-block, q-block) cell; dk/dv blocks
    accumulate across the innermost (q-block) grid dim."""
    ki, i = pl.program_id(2), pl.program_id(3)
    q = q_ref[0, 0].astype(jnp.float32)  # (Bq, Dh)
    k = k_ref[0, 0].astype(jnp.float32)  # (Bk, Dh)
    v = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0]  # (Bq, 1)
    delta = delta_ref[0, 0]
    sc = jax.lax.dot_general(
        q * scale, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    sc = sc + bias_ref[0]
    if causal:
        sc = sc + _causal_neg(i, ki, q.shape[0], k.shape[0])
    p = jnp.exp(sc - lse)  # (Bq, Bk)
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta)

    @pl.when(i == 0)
    def _():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    dv_ref[0, 0] += jax.lax.dot_general(
        p, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk_ref[0, 0] += scale * jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _block_size(s_pad: int) -> int:
    """Largest supported block dividing the (padded) sequence length.

    Measured on v5e (B=4, H=8, Dh=64, fwd+bwd, fetch-verified): 512-row
    blocks are ~2x faster than 128-row blocks (bigger tiles amortize
    grid-cell dispatch and fill the MXU); 1024-row blocks exceed the 16 MB
    VMEM scoped limit.
    """
    for b in (512, 256, 128):
        if s_pad % b == 0:
            return b
    return s_pad  # s_pad <= 128: one block (multiple of 8)


def _full_spec(b_block, s, dh):
    """(1, 1, S, Dh) block resident across the innermost grid dim."""
    del b_block
    return pl.BlockSpec((1, 1, s, dh), lambda b, h, i: (b, h, 0, 0))


def _row_spec(block, dh):
    return pl.BlockSpec((1, 1, block, dh), lambda b, h, i: (b, h, i, 0))


def _flash_forward(q, k, v, bias, causal, interpret):
    b, h, s, dh = q.shape
    scale = 1.0 / math.sqrt(dh)
    block = _block_size(s)
    bias3 = bias.astype(jnp.float32)[:, None, :]
    kernel = functools.partial(
        _flash_fwd_kernel, scale=scale, causal=causal, block_k=block
    )
    bias_spec = pl.BlockSpec((1, 1, s), lambda bb, hh, i: (bb, 0, 0))
    o, lse = pl.pallas_call(
        kernel,
        grid=(b, h, s // block),
        in_specs=[
            _row_spec(block, dh),
            _full_spec(block, s, dh),
            _full_spec(block, s, dh),
            bias_spec,
        ],
        out_specs=[
            _row_spec(block, dh),
            pl.BlockSpec((1, 1, block, 1), lambda bb, hh, i: (bb, hh, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, s, dh), q.dtype),
            jax.ShapeDtypeStruct((b, h, s, 1), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s * s * dh,
            bytes_accessed=4 * b * h * s * dh * 4,
            transcendentals=b * h * s * s,
        ),
    )(q, k, v, bias3)
    return o, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _attention_pallas(q, k, v, bias, causal, interpret):
    return _flash_forward(q, k, v, bias, causal, interpret)[0]


def _attention_pallas_fwd(q, k, v, bias, causal, interpret):
    o, lse = _flash_forward(q, k, v, bias, causal, interpret)
    return o, (q, k, v, bias, o, lse)


def _attention_pallas_bwd(causal, interpret, residuals, do):
    q, k, v, bias, o, lse = residuals
    b, h, s, dh = q.shape
    scale = 1.0 / math.sqrt(dh)
    block = _block_size(s)
    bias3 = bias.astype(jnp.float32)[:, None, :]
    bias_spec = pl.BlockSpec((1, 1, s), lambda bb, hh, i: (bb, 0, 0))
    # delta = rowsum(dO * O): one fused XLA elementwise+reduce, O(S·Dh).
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
    )

    if s >= _BWD_STREAM_MIN_S:
        return _attention_pallas_bwd_stream(
            q, k, v, bias3, lse, delta, do, scale, causal, interpret, block
        ) + (jnp.zeros_like(bias),)

    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel, scale=scale, causal=causal, block_k=block
        ),
        grid=(b, h, s // block),
        in_specs=[
            _row_spec(block, dh),          # q
            _full_spec(block, s, dh),      # k
            _full_spec(block, s, dh),      # v
            bias_spec,
            _row_spec(block, dh),          # do
            pl.BlockSpec((1, 1, block, 1), lambda bb, hh, i: (bb, hh, i, 0)),
            pl.BlockSpec((1, 1, block, 1), lambda bb, hh, i: (bb, hh, i, 0)),
        ],
        out_specs=_row_spec(block, dh),
        out_shape=jax.ShapeDtypeStruct((b, h, s, dh), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * b * h * s * s * dh,
            bytes_accessed=4 * b * h * s * dh * 4,
            transcendentals=b * h * s * s,
        ),
    )(q, k, v, bias3, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, scale=scale, causal=causal, block_q=block
        ),
        grid=(b, h, s // block),
        in_specs=[
            _full_spec(block, s, dh),      # q (full, streamed in blocks)
            _row_spec(block, dh),          # k block
            _row_spec(block, dh),          # v block
            bias_spec,
            _full_spec(block, s, dh),      # do (full)
            pl.BlockSpec((1, 1, s, 1), lambda bb, hh, i: (bb, hh, 0, 0)),
            pl.BlockSpec((1, 1, s, 1), lambda bb, hh, i: (bb, hh, 0, 0)),
        ],
        out_specs=[_row_spec(block, dh), _row_spec(block, dh)],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, s, dh), k.dtype),
            jax.ShapeDtypeStruct((b, h, s, dh), v.dtype),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * b * h * s * s * dh,
            bytes_accessed=4 * b * h * s * dh * 4,
            transcendentals=b * h * s * s,
        ),
    )(q, k, v, bias3, do, lse, delta)

    return dq, dk, dv, jnp.zeros_like(bias)


def _attention_pallas_bwd_stream(
    q, k, v, bias3, lse, delta, do, scale, causal, interpret, block
):
    """Backward via the 4D-grid streaming kernels (block-sized VMEM only)."""
    b, h, s, dh = q.shape
    n = s // block

    def rblk(pos):  # (1, 1, block, Dh) at the given grid position
        return pl.BlockSpec((1, 1, block, dh), pos)

    def sblk(pos):  # (1, 1, block, 1) scalar column at the given position
        return pl.BlockSpec((1, 1, block, 1), pos)

    common = dict(interpret=interpret)
    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_stream_kernel, scale=scale, causal=causal
        ),
        grid=(b, h, n, n),
        in_specs=[
            rblk(lambda bb, hh, i, j: (bb, hh, i, 0)),  # q
            rblk(lambda bb, hh, i, j: (bb, hh, j, 0)),  # k
            rblk(lambda bb, hh, i, j: (bb, hh, j, 0)),  # v
            pl.BlockSpec((1, 1, block), lambda bb, hh, i, j: (bb, 0, j)),
            sblk(lambda bb, hh, i, j: (bb, hh, i, 0)),  # lse
            sblk(lambda bb, hh, i, j: (bb, hh, i, 0)),  # delta
            rblk(lambda bb, hh, i, j: (bb, hh, i, 0)),  # do
        ],
        out_specs=rblk(lambda bb, hh, i, j: (bb, hh, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, s, dh), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=5 * b * h * s * s * dh,
            bytes_accessed=4 * b * h * s * dh * 4,
            transcendentals=b * h * s * s,
        ),
        **common,
    )(q, k, v, bias3, lse, delta, do)

    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_stream_kernel, scale=scale, causal=causal
        ),
        grid=(b, h, n, n),
        in_specs=[
            rblk(lambda bb, hh, ki, i: (bb, hh, i, 0)),  # q
            rblk(lambda bb, hh, ki, i: (bb, hh, ki, 0)),  # k
            rblk(lambda bb, hh, ki, i: (bb, hh, ki, 0)),  # v
            pl.BlockSpec((1, 1, block), lambda bb, hh, ki, i: (bb, 0, ki)),
            sblk(lambda bb, hh, ki, i: (bb, hh, i, 0)),  # lse
            sblk(lambda bb, hh, ki, i: (bb, hh, i, 0)),  # delta
            rblk(lambda bb, hh, ki, i: (bb, hh, i, 0)),  # do
        ],
        out_specs=[
            rblk(lambda bb, hh, ki, i: (bb, hh, ki, 0)),
            rblk(lambda bb, hh, ki, i: (bb, hh, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, s, dh), jnp.float32),
            jax.ShapeDtypeStruct((b, h, s, dh), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=5 * b * h * s * s * dh,
            bytes_accessed=4 * b * h * s * dh * 4,
            transcendentals=b * h * s * s,
        ),
        **common,
    )(q, k, v, bias3, lse, delta, do)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_attention_pallas.defvjp(_attention_pallas_fwd, _attention_pallas_bwd)


def _pad_len(s: int) -> int:
    """Pad S to a tile-friendly size: multiples of 8 up to 128 (min 16),
    then multiples of 128 up to 512, multiples of 256 beyond (so
    ``_block_size`` can pick large blocks with bounded padding waste)."""
    if s <= 128:
        return max(16, -(-s // 8) * 8)
    if s <= 512:
        return -(-s // 128) * 128
    return -(-s // 256) * 256


def _prefer_pallas(s: int) -> bool:
    """The measured dispatch rule (see the comment in
    ``dot_product_attention``): flash kernels from S >= 512, unless tile
    padding would waste more than 12.5% of the kernel's rows."""
    return s >= 512 and _pad_len(s) * 8 <= s * 9


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
        # Measured on v5e, fwd + FULL bwd (all three gradients consumed),
        # fetch-verified via tools/bench_attention.py (ms/iter,
        # pallas vs XLA).  B=8/H=8/Dh=64: S=256 1.67/1.84, S=512 1.84/1.87,
        # S=1024 2.89/5.01, S=2048 6.31/14.81, S=4096 21.4/53.4.
        # B=64/H=8/Dh=32 (the flat-seq family): S=512 6.61/8.61,
        # S=650 16.48/14.65, S=768 14.05/16.65, S=1024 15.09/29.1.
        # Two rules fall out: (a) XLA's fused attention wins at document
        # scale (S < 512); (b) past that the flash kernels win EXCEPT when
        # ``_pad_len`` forces large padding waste — the kernel runs the
        # padded shape while XLA runs the exact one (S=650 pads to 768:
        # +18% rows made pallas 0.89x there, while exact-tile 512/768/1024
        # are 1.2-1.9x wins).  So: pallas from S >= 512 when padding waste
        # is <= 12.5%, else XLA.  Either way the kernels remain the
        # memory-scaling path (O(S*Dh) HBM on both passes; XLA's S^2
        # probabilities stop fitting long before the kernels do).
        use_pallas = (
            pltpu is not None
            and jax.default_backend() == "tpu"
            and _prefer_pallas(s)
        )
        impl = "pallas" if use_pallas else "xla"
    if impl == "xla":
        return _attention_xla(q, k, v, bias, causal)

    # Pallas path: pad S up to a tile-friendly size; padded keys get -inf
    # bias, padded query rows are sliced away (their cotangents are zero,
    # so padding contributes nothing to any gradient either).
    s_pad = _pad_len(s)
    if s_pad != s:
        pad = [(0, 0), (0, 0), (0, s_pad - s), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        bias = jnp.pad(bias, [(0, 0), (0, s_pad - s)], constant_values=NEG_INF)
    out = _attention_pallas(q, k, v, bias, causal, interpret)
    return out[:, :, :s, :]
