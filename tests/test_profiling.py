"""Analytic FLOPs model vs XLA's own cost analysis."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdm_tpu.data import split_device_batch
from flexdm_tpu.models import MFPModel, make_task_config
from flexdm_tpu.train import (
    TrainState,
    init_params,
    make_optimizer,
    make_train_step,
)
from flexdm_tpu.utils.profiling import analytic_train_flops, mfu


@pytest.mark.slow
def test_analytic_flops_close_to_xla_cost_analysis(crello_spec):
    """The hand model must track what XLA actually schedules (it powers the
    MFU number in bench.py)."""
    spec = crello_spec
    loader = spec.make_dataset("train", batch_size=16)
    batch = {
        k: jnp.asarray(v)
        for k, v in split_device_batch(next(iter(loader))).items()
    }
    model = MFPModel(
        spec.schema, latent_dim=32, num_blocks=1, num_heads=4,
        attention_impl="xla",
    )
    params = init_params(model, batch, seed=0)
    tx = make_optimizer(1e-4)
    state = TrainState(
        params=params, opt_state=tx.init(params), step=jnp.asarray(0)
    )
    step = make_train_step(
        model, make_task_config(spec.schema, "random"), tx, l2=1e-2
    )
    compiled = jax.jit(step).lower(
        state, batch, jax.random.PRNGKey(0)
    ).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    xla_flops = float(ca["flops"])
    mine = analytic_train_flops(spec.schema, 16, 32, 1)
    # Matmul terms dominate; the analytic model skips elementwise/loss work,
    # XLA's estimate includes it.  Keep the ratio pinned to a tight band so
    # architecture drift shows up here.
    assert 0.6 < mine / xla_flops < 1.15, (mine, xla_flops)


def test_mfu_formula():
    # 98.65 TFLOP/step at 1 step/s on one 197.3 TFLOPS chip = 50%
    np.testing.assert_allclose(mfu(98.65e12, 1.0, num_chips=1), 50.0)
    np.testing.assert_allclose(mfu(98.65e12, 2.0, num_chips=2), 50.0)
