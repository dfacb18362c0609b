"""Attention kernel parity: Pallas (interpret mode on CPU) vs XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdm_tpu.ops.attention import dot_product_attention


def make_qkv(rng, b=2, h=4, s=50, dh=32):
    q = jnp.asarray(rng.normal(size=(b, h, s, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, s, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, s, dh)), jnp.float32)
    return q, k, v


def test_xla_matches_manual(rng):
    q, k, v = make_qkv(rng, s=7)
    mask = jnp.asarray(np.array([[1] * 4 + [0] * 3, [1] * 7]), bool)
    out = dot_product_attention(q, k, v, key_mask=mask, impl="xla")
    # manual per-sample computation
    for b in range(2):
        for h in range(4):
            scores = np.asarray(q[b, h]) @ np.asarray(k[b, h]).T / np.sqrt(32)
            scores = scores + np.where(np.asarray(mask[b]), 0.0, -1e9)[None, :]
            p = np.exp(scores - scores.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            np.testing.assert_allclose(
                np.asarray(out[b, h]), p @ np.asarray(v[b, h]), rtol=2e-5, atol=2e-5
            )


def test_pallas_interpret_matches_xla(rng):
    q, k, v = make_qkv(rng, s=50)
    mask = jnp.asarray(rng.integers(0, 2, (2, 50)), bool).at[:, 0].set(True)
    ref = dot_product_attention(q, k, v, key_mask=mask, impl="xla")
    out = dot_product_attention(
        q, k, v, key_mask=mask, impl="pallas", interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_pallas_causal_matches_xla(rng):
    q, k, v = make_qkv(rng, s=16)
    ref = dot_product_attention(q, k, v, causal=True, impl="xla")
    out = dot_product_attention(q, k, v, causal=True, impl="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_pallas_gradients_match_xla(rng):
    q, k, v = make_qkv(rng, b=1, h=2, s=10, dh=8)
    mask = jnp.ones((1, 10), bool).at[0, 7:].set(False)

    def loss(fn):
        def inner(q, k, v):
            o = fn(q, k, v)
            return jnp.sum(o**2)

        return inner

    f_ref = loss(lambda q, k, v: dot_product_attention(q, k, v, key_mask=mask, impl="xla"))
    f_pal = loss(
        lambda q, k, v: dot_product_attention(
            q, k, v, key_mask=mask, impl="pallas", interpret=True
        )
    )
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    g_pal = jax.grad(f_pal, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_pallas_long_sequence_regime(rng):
    """S > 128 is where auto dispatch selects the Pallas kernel on TPU;
    verify correctness at that scale (interpret mode on CPU)."""
    q, k, v = make_qkv(rng, b=1, h=2, s=200, dh=16)
    mask = jnp.ones((1, 200), bool).at[0, 150:].set(False)
    ref = dot_product_attention(q, k, v, key_mask=mask, impl="xla")
    out = dot_product_attention(
        q, k, v, key_mask=mask, impl="pallas", interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fully_masked_rows_do_not_nan(rng):
    q, k, v = make_qkv(rng, b=1, h=1, s=4, dh=8)
    mask = jnp.zeros((1, 4), bool)  # nothing attendable
    out = dot_product_attention(q, k, v, key_mask=mask, impl="xla")
    assert np.all(np.isfinite(np.asarray(out)))


def test_flash_gradients_match_xla_long_sequence(rng):
    """Blockwise backward at S=512 (multi-block grid, padding-free) and
    S=200 (padded tail): gradients must match XLA (VERDICT round 1 #4)."""
    for s, valid in ((512, 400), (200, 150)):
        q, k, v = make_qkv(rng, b=1, h=2, s=s, dh=32)
        mask = jnp.ones((1, s), bool).at[0, valid:].set(False)

        def f(impl):
            def inner(q, k, v):
                o = dot_product_attention(
                    q, k, v, key_mask=mask, impl=impl,
                    interpret=(impl == "pallas"),
                )
                # position-weighted loss so dq/dk/dv all get rich signal
                w = jnp.arange(s, dtype=jnp.float32)[None, None, :, None]
                return jnp.sum((o * w) ** 2) / s
            return inner

        g_ref = jax.grad(f("xla"), argnums=(0, 1, 2))(q, k, v)
        g_pal = jax.grad(f("pallas"), argnums=(0, 1, 2))(q, k, v)
        for name, a, b in zip("qkv", g_ref, g_pal):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
                err_msg=f"S={s} d{name}",
            )


def test_flash_causal_gradients_match_xla(rng):
    q, k, v = make_qkv(rng, b=1, h=2, s=160, dh=16)

    def f(impl):
        return lambda q, k, v: jnp.sum(
            dot_product_attention(
                q, k, v, causal=True, impl=impl,
                interpret=(impl == "pallas"),
            ) ** 2
        )

    g_ref = jax.grad(f("xla"), argnums=(0, 1, 2))(q, k, v)
    g_pal = jax.grad(f("pallas"), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        )


def test_flash_forward_multiblock_matches_xla(rng):
    """S=512 exercises a 4x4 block grid with online softmax accumulation."""
    q, k, v = make_qkv(rng, b=2, h=2, s=512, dh=32)
    mask = jnp.asarray(rng.integers(0, 2, (2, 512)), bool).at[:, 0].set(True)
    ref = dot_product_attention(q, k, v, key_mask=mask, impl="xla")
    out = dot_product_attention(
        q, k, v, key_mask=mask, impl="pallas", interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_streaming_backward_matches_xla(monkeypatch):
    """The 4D-grid streaming backward (used from S=4096 on hardware, where
    the resident-K/V form overflows VMEM) must produce the same gradients
    as XLA; forced on at a small S via the dispatch constant."""
    import flexdm_tpu.ops.attention as A

    monkeypatch.setattr(A, "_BWD_STREAM_MIN_S", 1)
    B, H, S, Dh = 2, 2, 256, 32
    key = jax.random.PRNGKey(3)
    q, k, v = (
        jax.random.normal(jax.random.fold_in(key, i), (B, H, S, Dh))
        for i in range(3)
    )
    mask = jnp.ones((B, S), bool).at[:, 200:].set(False)

    def make_loss(impl):
        def loss(q, k, v):
            o = A.dot_product_attention(
                q, k, v, key_mask=mask, causal=True, impl=impl,
                interpret=(impl == "pallas"),
            )
            return jnp.sum(o * jnp.cos(o))
        return loss

    gx = jax.grad(make_loss("xla"), argnums=(0, 1, 2))(q, k, v)
    gp = jax.grad(make_loss("pallas"), argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gx, gp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=f"d{name}",
        )


def test_auto_dispatch_rule():
    """Pin the measured dispatch table (tools/bench_attention.py, v5e):
    flash kernels from S >= 512 EXCEPT when tile padding wastes >12.5%
    of the kernel's rows (S=650 pads to 768 and measured 0.89x vs XLA;
    exact-tile 512/768/1024 measured 1.2-1.9x wins)."""
    from flexdm_tpu.ops.attention import _pad_len, _prefer_pallas

    expected = {
        50: False,    # document scale: XLA fusion wins
        256: False,
        511: False,
        512: True,    # exact tile
        576: False,   # pads to 768: 33% waste
        650: False,   # the flat-seq shape: pads to 768, 18% waste
        704: True,    # pads to 768: 9% waste
        768: True,
        1024: True,
        2048: True,
        4096: True,   # streaming-backward regime, still pallas
    }
    for s, want in expected.items():
        assert _prefer_pallas(s) == want, (s, _pad_len(s))
