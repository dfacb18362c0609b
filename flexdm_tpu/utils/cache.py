"""Persistent XLA compilation cache.

First compilation of the full train step through the TPU tunnel is slow
(minutes); the persistent cache makes subsequent processes start in seconds.
Safe to call multiple times.
"""

from __future__ import annotations

import os
import tempfile


def enable_persistent_compilation_cache(path: str | None = None) -> str:
    import jax

    path = path or os.environ.get(
        "FLEXDM_JAX_CACHE",
        os.path.join(tempfile.gettempdir(), "flexdm_jax_cache"),
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
    return path
