"""Baseline model families: CanvasVAE, LayoutVAE, AutoReg, BART."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdm_tpu.models.baselines import BART, AutoReg, CanvasVAE, LayoutVAE
from flexdm_tpu.models.baselines.cvae import Head, gaussian_kl
from flexdm_tpu.models.mfp import apply_model, forward_train
from flexdm_tpu.models import make_task_config
from flexdm_tpu.models.masking import get_initial_masks, get_seq_mask
from tests.test_masking import tiny_inputs, tiny_schema


def _common(schema):
    return dict(
        schema=schema, latent_dim=16, num_blocks=2, num_heads=2,
        attention_impl="xla",
    )


def _init(model, x, masks):
    rngs = {
        "params": jax.random.PRNGKey(0),
        "noise": jax.random.PRNGKey(1),
        "vae": jax.random.PRNGKey(2),
        "dropout": jax.random.PRNGKey(3),
    }
    return model.init(rngs, x, x, masks, deterministic=False)


@pytest.fixture(scope="module")
def data():
    schema = tiny_schema()
    x = tiny_inputs(schema=schema, lengths=(2, 3, 1, 4))
    seq = get_seq_mask(x["length"], schema.max_length)
    masks = get_initial_masks(schema, seq)
    for c in schema.modeled:
        if c.is_sequence:
            masks[c.name] = seq
    return schema, x, masks


def test_head_reparameterization():
    head = Head(latent_dim=4, compute_kl=True)
    h = jnp.ones((2, 8))
    params = head.init(
        {"params": jax.random.PRNGKey(0), "vae": jax.random.PRNGKey(1)},
        h, False,
    )
    out_d, aux_d = head.apply(params, h, True)
    np.testing.assert_allclose(
        np.asarray(out_d["z"]), np.asarray(out_d["z_mean"])
    )
    assert not aux_d
    out_s, aux_s = head.apply(
        params, h, False, rngs={"vae": jax.random.PRNGKey(5)}
    )
    assert not np.allclose(np.asarray(out_s["z"]), np.asarray(out_s["z_mean"]))
    assert "kl_divergence" in aux_s


def test_gaussian_kl_zero_for_identical():
    m = jnp.asarray([[0.3, -0.2]])
    ls = jnp.asarray([[0.1, -0.5]])
    np.testing.assert_allclose(float(gaussian_kl(m, ls, m, ls)[0]), 0.0, atol=1e-6)
    # KL(N(0,1) || N(1,1)) = 0.5 per dim
    z = jnp.zeros((1, 1))
    np.testing.assert_allclose(
        float(gaussian_kl(z, z, jnp.ones((1, 1)), z)[0]), 0.5, atol=1e-6
    )


@pytest.mark.parametrize("cls", [CanvasVAE, LayoutVAE, AutoReg, BART])
@pytest.mark.slow
def test_baseline_train_and_eval_paths(cls, data):
    schema, x, masks = data
    model = cls(**_common(schema))
    params = _init(model, x, masks)

    # training path
    out, aux = apply_model(
        model, params, x, x, masks, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
              "vae": jax.random.PRNGKey(2)},
    )
    assert out["left"].shape == (4, schema.max_length, 1, 8)
    assert out["emb"].shape == (4, schema.max_length, 4)
    if cls in (CanvasVAE, LayoutVAE):
        assert "kl_loss" in aux
    for v in out.values():
        assert np.all(np.isfinite(np.asarray(v)))

    # eval (decode) path
    out_e, _ = apply_model(
        model, params, x, x, masks, deterministic=True,
        rngs={"noise": jax.random.PRNGKey(1), "vae": jax.random.PRNGKey(2)},
    )
    assert out_e["left"].shape == (4, schema.max_length, 1, 8)
    for v in out_e.values():
        assert np.all(np.isfinite(np.asarray(v)))


@pytest.mark.parametrize("cls", [AutoReg, BART])
@pytest.mark.slow
def test_autoreg_is_causal(cls, data):
    """Changing element j>t must not change the decode at steps <= t when
    that element is masked (fed through mfp mask merge)."""
    schema, x, masks = data
    model = cls(**_common(schema))
    params = _init(model, x, masks)

    out1, _ = apply_model(model, params, x, x, masks, True,
                          {"noise": jax.random.PRNGKey(1)})
    # jit/eager parity of the static-buffer decode
    out2, _ = jax.jit(
        lambda p, a, b: apply_model(model, p, a, a, b, True,
                                    {"noise": jax.random.PRNGKey(1)})
    )(params, x, masks)
    for k in out1:
        np.testing.assert_allclose(
            np.asarray(out1[k]), np.asarray(out2[k]), rtol=5e-4, atol=5e-5
        )


@pytest.mark.slow
def test_baseline_forward_train_integration(data):
    schema, x, masks = data
    tc = make_task_config(schema, "elem_pos")
    for cls in (CanvasVAE, AutoReg):
        model = cls(**_common(schema))
        params = _init(model, x, masks)
        loss, metrics = forward_train(
            model, params, x, jax.random.PRNGKey(0), tc, train=True
        )
        assert np.isfinite(float(loss))
        assert "total_score" in metrics


def test_trainer_builds_all_arch_types(data):
    from flexdm_tpu.train.trainer import TrainConfig, build_model

    schema, _, _ = data
    for arch in ("oneshot", "canvasvae", "layoutvae", "autoreg", "bart_autoreg"):
        config = TrainConfig(arch_type=arch, latent_dim=16, num_blocks=2,
                             num_heads=2, attention_impl="xla")
        model = build_model(config, schema)
        assert model is not None
