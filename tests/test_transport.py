"""Packed float32 transport: losslessness, guards, jit-side symmetry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdm_tpu import transport


def _tree():
    rng = np.random.default_rng(0)
    return {
        "ids": rng.integers(0, 60_000, size=(4, 7)).astype(np.int32),
        "length": np.array([[3], [5], [1], [7]], dtype=np.int64),
        "emb": rng.standard_normal((4, 7, 16)).astype(np.float32),
        "flag": np.array(2.5, dtype=np.float32),  # scalar, shape ()
    }


def test_host_round_trip_is_exact():
    tree = _tree()
    spec = transport.batch_spec(tree)
    flat = transport.pack(tree, spec)
    assert flat.dtype == np.float32 and flat.ndim == 1
    out = transport.unpack(flat, spec)
    assert set(out) == set(tree)
    for k in tree:
        assert out[k].dtype == tree[k].dtype, k
        np.testing.assert_array_equal(out[k], tree[k], err_msg=k)


def test_jit_side_matches_host_side():
    tree = _tree()
    spec = transport.batch_spec(tree)
    flat = transport.pack(tree, spec)

    @jax.jit
    def round_trip(flat):
        unpacked = transport.unpack_in_jit(flat, spec)
        return transport.pack_in_jit(unpacked, spec)

    flat2 = np.asarray(round_trip(jnp.asarray(flat)))
    np.testing.assert_array_equal(flat2, flat)


def test_bfloat16_values_survive():
    tree = {"h": jnp.arange(12, dtype=jnp.bfloat16).reshape(3, 4) / 7}
    spec = transport.batch_spec(tree)
    out = transport.unpack(transport.pack(jax.device_get(tree), spec), spec)
    assert str(out["h"].dtype) == "bfloat16"
    np.testing.assert_array_equal(out["h"], np.asarray(tree["h"]))


def test_int_overflow_guard():
    tree = {"big": np.array([1 << 24], dtype=np.int64)}
    with pytest.raises(ValueError, match="2\\^24"):
        transport.pack(tree, transport.batch_spec(tree))
    ok = {"edge": np.array([(1 << 24) - 1], dtype=np.int64)}
    spec = transport.batch_spec(ok)
    np.testing.assert_array_equal(
        transport.unpack(transport.pack(ok, spec), spec)["edge"], ok["edge"]
    )


def test_float64_rejected():
    tree = {"x": np.array([0.1], dtype=np.float64)}
    with pytest.raises(TypeError, match="float64"):
        transport.pack(tree, transport.batch_spec(tree))


def test_empty_tree():
    spec = transport.batch_spec({})
    flat = transport.pack({}, spec)
    assert flat.size == 0
    assert transport.unpack(flat, spec) == {}


def test_eval_spec_and_abstract_tree():
    tree = _tree()
    spec = transport.batch_spec(tree)

    def fn(flat):
        t = transport.unpack_in_jit(flat, spec)
        return {"sum": t["emb"].sum(-1), "ids2": t["ids"] * 2}

    out_spec = transport.eval_spec(
        fn, jax.ShapeDtypeStruct((transport.pack(tree, spec).size,), jnp.float32)
    )
    names = [n for n, _, _ in out_spec]
    assert names == sorted(names) == ["ids2", "sum"]
    shapes = dict((n, s) for n, s, _ in out_spec)
    assert shapes["sum"] == (4, 7) and shapes["ids2"] == (4, 7)
    abstract = transport.abstract_tree(spec)
    assert abstract["emb"].shape == (4, 7, 16)
    assert str(abstract["emb"].dtype) == "float32"
