"""Shared plumbing for golden tests that import the reference package.

The reference checkout at ``/root/reference/src/mfp`` is keras-2-era code
whose modules import tensorflow_probability at module level (absent here);
a bare module stub with placeholder distribution classes satisfies every
import on the oracle paths — none of the TFP symbols execute.  Bytecode
writing is disabled while importing so the read-only checkout is never
written to.

Usage::

    from tests.ref_oracle import REF_PATH, reference_imports, make_tf_root

    with reference_imports():
        from mfp.models.model import Model as RefModel
"""

import contextlib
import os
import sys
import types

REF_PATH = "/root/reference/src/mfp"


def reference_available() -> bool:
    return os.path.isdir(REF_PATH)


@contextlib.contextmanager
def reference_imports():
    """Context for importing ``mfp.*`` from the reference checkout."""
    assert os.environ.get("TF_USE_LEGACY_KERAS") == "1", (
        "reference keras-2 code needs the legacy shim (set in conftest)"
    )
    had_flag = sys.dont_write_bytecode
    sys.dont_write_bytecode = True
    stub = sys.modules.setdefault(
        "tensorflow_probability", types.ModuleType("tensorflow_probability")
    )
    if not hasattr(stub, "distributions"):
        # canvasvae.py dereferences these at import time; none of them runs
        # on any oracle path, so inert placeholders do.
        dists = types.ModuleType("tensorflow_probability.distributions")
        for name in ("Bernoulli", "Categorical", "MultivariateNormalDiag"):
            setattr(dists, name, type(name, (), {}))
        stub.distributions = dists
    sys.path.insert(0, REF_PATH)
    try:
        yield
    finally:
        sys.path.remove(REF_PATH)
        sys.dont_write_bytecode = had_flag


def make_tf_root(tf, inner):
    """Wrap a reference network the way its trainer checkpoints it: a root
    keras model whose ``.model`` attribute holds the network (reference
    mfp.py:249, train.py:97), so ``save_weights`` writes the genuine
    ``model/...`` variable paths."""

    class _Root(tf.keras.Model):
        def __init__(self):
            super().__init__()
            self.model = inner

        def call(self, inputs):
            return self.model(inputs, training=False)

    return _Root()
