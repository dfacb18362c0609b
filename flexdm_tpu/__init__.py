"""flexdm_tpu: a TPU-native framework for flexible multi-modal document models.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
CyberAgentAILab/flex-dm (CVPR 2023, "Towards Flexible Multi-modal Document
Models"): masked-field prediction over vector-graphic documents (crello) and
UI layouts (rico), with schema-programmable models driven by a frozen,
hashable dataset :class:`~flexdm_tpu.data.Schema`.

Design stance (vs. the TF2-eager reference):

* one jit-compiled train step containing *all* per-step randomness (task
  sampling, MLM masking, token replacement) via explicit ``jax.random`` keys;
* static ``(B, max_length, C)`` shapes everywhere;
* SPMD data parallelism via ``jax.sharding`` over a device mesh;
* Pallas TPU kernels for the attention hot path;
* a TensorFlow-free host data pipeline (C++ fast path + numpy fallback).
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("FLEXDM_PLATFORM"):
    # Deterministic platform override for CLI/scripted runs.  The standard
    # JAX_PLATFORMS env var cannot serve this role on images whose
    # sitecustomize exports it (e.g. a preloaded TPU plugin): user intent is
    # indistinguishable from the image default there.  FLEXDM_PLATFORM=cpu
    # forces the CPU backend for fast local verification.  Updating the
    # config after backend initialization does NOT raise — it silently has
    # no effect — so detect a prior backend explicitly and warn (ADVICE r2).
    import jax as _jax

    _requested = _os.environ["FLEXDM_PLATFORM"]
    try:
        from jax._src import xla_bridge as _xb

        _initialized = _xb.backends_are_initialized()
    except Exception:  # pragma: no cover - private API moved
        _initialized = False
    if _initialized and _jax.default_backend() != _requested.split(",")[0]:
        import warnings as _warnings

        _warnings.warn(
            "FLEXDM_PLATFORM=%r ignored: the JAX backend was already "
            "initialized as %r before flexdm_tpu was imported"
            % (_requested, _jax.default_backend())
        )
    else:
        _jax.config.update("jax_platforms", _requested)

from . import data  # noqa: F401
