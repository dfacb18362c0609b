"""Unit tests for the TPU-fast RNG helpers (flexdm_tpu/ops/rng.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from flexdm_tpu.ops import rng as fast_rng
from flexdm_tpu.ops.rng import FastDropout


def test_draws_deterministic_per_key():
    k = jax.random.PRNGKey(7)
    a = fast_rng.uniform(k, (32, 16))
    b = fast_rng.uniform(k, (32, 16))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # different keys -> different streams
    c = fast_rng.uniform(jax.random.PRNGKey(8), (32, 16))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_uniform_range_and_moments():
    u = np.asarray(fast_rng.uniform(jax.random.PRNGKey(0), (200, 200)))
    assert u.min() >= 0.0 and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 0.01
    u2 = np.asarray(
        fast_rng.uniform(jax.random.PRNGKey(0), (1000,), minval=-2.0, maxval=4.0)
    )
    assert u2.min() >= -2.0 and u2.max() < 4.0


def test_normal_moments():
    n = np.asarray(fast_rng.normal(jax.random.PRNGKey(1), (300, 300)))
    assert abs(n.mean()) < 0.02
    assert abs(n.std() - 1.0) < 0.02


def test_bernoulli_rate():
    b = np.asarray(fast_rng.bernoulli(jax.random.PRNGKey(2), 0.9, (100_000,)))
    assert b.dtype == bool
    assert abs(b.mean() - 0.9) < 0.01


def test_randint_range():
    r = np.asarray(fast_rng.randint(jax.random.PRNGKey(3), (10_000,), 0, 7))
    assert r.min() >= 0 and r.max() < 7
    assert len(np.unique(r)) == 7


def test_draws_jit_compatible():
    @jax.jit
    def f(k):
        return fast_rng.uniform(k, (8, 8)) + fast_rng.normal(k, (8, 8))

    out = f(jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out)).all()


class _Wrap:
    """Tiny flax harness for FastDropout."""

    def __init__(self, rate):
        import flax.linen as nn

        class M(nn.Module):
            @nn.compact
            def __call__(self, x, deterministic):
                return FastDropout(rate)(x, deterministic=deterministic)

        self.m = M()

    def __call__(self, x, deterministic, seed=0):
        return self.m.apply(
            {}, x, deterministic, rngs={"dropout": jax.random.PRNGKey(seed)}
        )


def test_dropout_deterministic_mode_is_identity():
    x = jnp.arange(24.0).reshape(4, 6)
    out = _Wrap(0.5)(x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    # rate 0 is identity even in train mode
    out = _Wrap(0.0)(x, deterministic=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_dropout_inverted_scaling_and_rate():
    rate = 0.25
    x = jnp.ones((400, 400))
    out = np.asarray(_Wrap(rate)(x, deterministic=False))
    kept = out != 0.0
    # survivors are scaled by 1/keep
    np.testing.assert_allclose(out[kept], 1.0 / (1.0 - rate), rtol=1e-6)
    # drop rate matches
    assert abs((~kept).mean() - rate) < 0.01
    # expectation preserved
    assert abs(out.mean() - 1.0) < 0.02


def test_dropout_same_key_same_mask():
    x = jnp.ones((32, 32))
    a = np.asarray(_Wrap(0.5)(x, deterministic=False, seed=3))
    b = np.asarray(_Wrap(0.5)(x, deterministic=False, seed=3))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(_Wrap(0.5)(x, deterministic=False, seed=4))
    assert not np.array_equal(a, c)


def test_threefry_is_prefix_stable_rbg_is_not_guaranteed():
    """The masking layer's batch-size-invariance rests on threefry's
    counter-based layout: row i of a (B, ...) draw must not depend on B.
    rbg carries NO such guarantee (measured unstable on TPU), which is why
    masking draws use plain jax.random and rbg is dropout-only."""
    k = jax.random.PRNGKey(11)
    a = jax.random.uniform(k, (32, 3, 7, 50))
    b = jax.random.uniform(k, (48, 3, 7, 50))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b)[:32])
    n1 = jax.random.normal(k, (8, 50, 512))
    n2 = jax.random.normal(k, (12, 50, 512))
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2)[:8])
