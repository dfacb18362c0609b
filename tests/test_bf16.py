"""bfloat16 compute-dtype training: converges like f32, params stay f32."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from flexdm_tpu.data import split_device_batch
from flexdm_tpu.models import MFPModel, make_task_config
from flexdm_tpu.train import TrainState, init_params, make_optimizer, make_train_step


@pytest.fixture(scope="module")
def setup(request):
    spec = request.getfixturevalue("rico_spec")
    batch = split_device_batch(
        next(iter(spec.make_dataset("train", batch_size=16)))
    )
    return spec, batch


def _train_losses(spec, batch, dtype, steps=30):
    model = MFPModel(
        spec.schema, latent_dim=32, num_blocks=1, num_heads=4,
        attention_impl="xla", dtype=dtype,
    )
    params = init_params(model, batch, seed=0)
    tc = make_task_config(spec.schema, "random")
    tx = make_optimizer(1e-3)
    state = TrainState(
        params=params, opt_state=tx.init(params), step=jnp.asarray(0)
    )
    step = jax.jit(make_train_step(model, tc, tx, l2=1e-2))
    losses = []
    for i in range(steps):
        state, metrics = step(state, batch, jax.random.PRNGKey(7))
        losses.append(float(metrics["loss"]))
    return losses, state


def test_bf16_params_stay_f32(setup):
    spec, batch = setup
    _, state = _train_losses(spec, batch, "bfloat16", steps=2)
    for leaf in jax.tree.leaves(state.params):
        assert leaf.dtype == jnp.float32


def test_bf16_training_tracks_f32(setup):
    """Mixed-precision compute must not change training dynamics materially:
    same init, same data, same keys -> loss curves track within a few %."""
    spec, batch = setup
    f32, _ = _train_losses(spec, batch, None)
    bf16, _ = _train_losses(spec, batch, "bfloat16")
    assert all(np.isfinite(bf16))
    # both learn (loss drops), and the curves stay close throughout
    assert f32[-1] < f32[0] * 0.9
    assert bf16[-1] < bf16[0] * 0.9
    for a, b in zip(f32, bf16):
        assert abs(a - b) / abs(a) < 0.05, (a, b)
