"""Profiling helpers.

The reference's only profiling support was a TensorBoard callback with
``profile_batch=2`` behind ``--enable_profile`` (reference
``helpers/callbacks.py:44-48``).  Here: a ``jax.profiler`` trace context and
a steps/sec / docs/sec counter usable from any loop.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace_context(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax profiler trace into ``log_dir`` (no-op when None)."""
    import jax

    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def analytic_train_flops(
    schema,
    batch_size: int,
    latent_dim: int,
    num_blocks: int,
    seq_type: str = "default",
    ff_dim: Optional[int] = None,
    context: Optional[str] = None,
) -> float:
    """Analytic FLOPs of ONE training step (fwd + bwd, matmul terms).

    Counts the MXU work actually dispatched by the flagship architecture:

    * encoder embeddings as one-hot matmuls ``2·B·T·C·(V+2)·D`` — that is
      how this implementation executes lookups (one-hot matmul beats the
      gather by ~20% on TPU; PARITY.md), so it is real device work, and
      numerical inputs as ``2·B·T·F·D``;
    * per transformer block ``16·B·T·D²`` (fused QKV ``6``, out ``2``,
      2-layer MLP with ``ff=2D`` → ``8``) plus attention ``4·B·T²·D``;
    * fused decoder heads ``2·B·T·D·Σunits``.

    ``T`` is the token count: ``S`` for the default set model, ``S·F`` for
    ``seq_type='flat'`` (VanillaTransformer), ``S(+1)`` with a prepended
    context token.  The total is multiplied by 3 for the backward pass
    (standard fwd + 2x bwd convention).  Elementwise/normalization/loss and
    optimizer work is excluded (sub-1% at these shapes).
    """
    S = schema.max_length
    seq_cols = [c for c in schema.columns if c.is_sequence and not c.demo_only]
    F = len(seq_cols)
    T = S * F if seq_type == "flat" else S
    if context in ("id", "canvas", "length"):
        T += 1
    B, D = batch_size, latent_dim

    flops = 0.0
    # Encoder inputs (per sequence column; canvas columns are ~1 token)
    for c in seq_cols:
        channels = c.shape[-1]
        if c.is_categorical:
            flops += 2.0 * B * S * channels * (c.input_dim + 2) * D
        else:
            flops += 2.0 * B * S * channels * D
    # Transformer blocks
    ff = ff_dim or 2 * D
    per_block = (
        6.0 * B * T * D * D          # fused QKV
        + 4.0 * B * T * T * D        # scores + attn·V
        + 2.0 * B * T * D * D        # output projection
        + 2.0 * B * T * D * ff * 2   # two-layer MLP
    )
    flops += num_blocks * per_block
    # Decoder heads (fused single matmul over all sequence heads)
    units = sum(
        c.shape[-1] * c.input_dim if c.is_categorical else c.shape[-1]
        for c in seq_cols
    )
    flops += 2.0 * B * S * D * units
    return 3.0 * flops


# v5e headline peak (bf16 matmul); used as the MFU denominator.
TPU_V5E_PEAK_FLOPS = 197.3e12


def mfu(
    flops_per_step: float,
    steps_per_sec: float,
    num_chips: int = 1,
    peak_flops: float = TPU_V5E_PEAK_FLOPS,
) -> float:
    """Model FLOPs utilization in percent vs the bf16 headline peak.

    f32 runs pass through the same MXU via multi-pass decomposition, so
    their value understates hardware utilization by design — compare MFU
    across rounds at fixed dtype.
    """
    return 100.0 * flops_per_step * steps_per_sec / (num_chips * peak_flops)


class StepTimer:
    """Throughput counter: steps/sec and items/sec over a sliding window."""

    def __init__(self, items_per_step: int = 1):
        self.items_per_step = items_per_step
        self.reset()

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self._steps = 0

    def tick(self, n: int = 1) -> None:
        self._steps += n

    @property
    def steps_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._steps / dt if dt > 0 else 0.0

    @property
    def items_per_sec(self) -> float:
        return self.steps_per_sec * self.items_per_step
