"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is exercised without TPU hardware by forcing the host
platform and splitting it into 8 XLA devices.

Note: this image boots an `axon` TPU plugin from sitecustomize and pins
``jax_platforms="axon,cpu"`` at interpreter start, so the JAX_PLATFORMS env
var alone is NOT enough — the config must be updated before first backend
use.
"""

import os

# Golden tests instantiate the reference's keras-2-era model/data code; with
# TF >= 2.16 `tf.keras` is Keras 3 unless the legacy shim is selected BEFORE
# tensorflow's lazy keras loader first resolves (tf_keras is installed).
os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")

# Pin TF-CPU to one thread so golden oracles are bit-deterministic
# run-to-run regardless of machine load (oneDNN reductions otherwise vary
# with thread scheduling).  One core on this host anyway.
os.environ.setdefault("TF_NUM_INTRAOP_THREADS", "1")
os.environ.setdefault("TF_NUM_INTEROP_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def crello_dir(tmp_path_factory):
    from flexdm_tpu.data import synthetic

    out = tmp_path_factory.mktemp("crello_data")
    return synthetic.generate("crello", str(out), 96, 32, 32, seed=0)


@pytest.fixture(scope="session")
def rico_dir(tmp_path_factory):
    from flexdm_tpu.data import synthetic

    out = tmp_path_factory.mktemp("rico_data")
    return synthetic.generate("rico", str(out), 96, 32, 32, seed=1)


@pytest.fixture(scope="session")
def crello_spec(crello_dir):
    from flexdm_tpu.data import DatasetSpec

    return DatasetSpec("crello", crello_dir, batch_size=8)


@pytest.fixture(scope="session")
def rico_spec(rico_dir):
    from flexdm_tpu.data import DatasetSpec

    return DatasetSpec("rico", rico_dir, batch_size=8)


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)
