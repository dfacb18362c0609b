"""Make ``flexdm_tpu`` importable when a tools/ script runs from a fresh
checkout without ``pip install -e .``.

``python tools/<script>.py`` puts ``tools/`` (not the repo root) at
``sys.path[0]``, so the package resolves only when pip-installed — which a
fresh VM isn't (this bit an on-hardware remeasure run: every
``tools/profile_step.py`` invocation died with ModuleNotFoundError while
``python bench.py`` — repo root as ``sys.path[0]`` — worked).  Each script
imports this module first; when imported as part of the ``tools`` package
(tests do ``from tools.x import ...``) the repo root is already on the
path and this is a no-op.
"""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
