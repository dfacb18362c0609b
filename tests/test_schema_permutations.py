"""Shape tests over the model-configuration lattice (SURVEY §4).

The reference maintained correctness of its config space only via runtime
asserts (reference ``encoder.py:28``, ``mfp.py:230``); here every
supported (context x seq_type x block_type x input_dtype) combination is
init'd and applied under ``jax.eval_shape`` — tracing the full forward
without running any FLOPs — so a shape or wiring bug in ANY combination
fails fast on CPU.  Heavier numeric checks for the flagship combos live
in test_model.py.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import pytest

from flexdm_tpu.data import split_device_batch, synthetic
from flexdm_tpu.models import MFPModel

CONTEXTS = [None, "id", "canvas", "length", "canvas_add"]
SEQ_BLOCK = [("default", "deepsvg"), ("default", "transformer"),
             ("flat", "deepsvg")]
# The reference restricts every non-None context to fusion='add'
# (reference encoder.py:191-192 asserts no canvas columns for non-add
# fusion, encoder.py:233 asserts fusion=='add' for token contexts), so
# the supported lattice excludes flat+context combinations.
SUPPORTED = [
    (ctx, sb) for ctx, sb in itertools.product(CONTEXTS, SEQ_BLOCK)
    if sb[0] == "default" or ctx is None
]
UNSUPPORTED = [
    (ctx, sb) for ctx, sb in itertools.product(CONTEXTS, SEQ_BLOCK)
    if (ctx, sb) not in SUPPORTED
]


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("perm")
    data_dir = synthetic.generate("crello", str(d), 12, 4, 4, seed=0)
    spec = synthetic.cached_spec("crello", 4)
    loader = spec.make_dataset("train", batch_size=4)
    batch = {
        k: jnp.asarray(v)
        for k, v in split_device_batch(next(iter(loader))).items()
    }
    return spec.schema, batch


def _make(schema, context, seq_type, block_type):
    return MFPModel(
        schema,
        latent_dim=32,
        num_blocks=1,
        num_heads=2,
        block_type=block_type,
        seq_type=seq_type,
        context=context,
        input_dtype="shuffled_set" if seq_type == "flat" else "set",
        attention_impl="xla",
    )


@pytest.mark.parametrize("context,seq_block", SUPPORTED)
def test_forward_shapes_all_configs(setup, context, seq_block):
    schema, batch = setup
    seq_type, block_type = seq_block
    model = _make(schema, context, seq_type, block_type)
    if context == "id":
        # Task-conditioned models read the per-sample task id that
        # preprocess_for_train/-test append (reference mfp.py:137).
        batch = dict(batch)
        batch["task"] = jnp.zeros(batch["length"].shape[0], jnp.int32)

    def init_and_apply():
        params = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            batch, True,
        )
        return model.apply(params, batch, True)

    out = jax.eval_shape(init_and_apply)

    B, S = batch["length"].shape[0], schema.max_length
    for column in schema.columns:
        if column.demo_only or not column.is_sequence:
            continue
        shape = out[column.name].shape
        if column.is_categorical:
            assert shape == (B, S, column.shape[-1], column.input_dim), (
                column.name, shape)
        else:
            assert shape == (B, S, column.shape[-1]), (column.name, shape)


@pytest.mark.parametrize("context,seq_block", UNSUPPORTED)
def test_unsupported_configs_fail_fast(setup, context, seq_block):
    """Flat fusion with a context must raise at trace time, like the
    reference's asserts — not produce silently wrong shapes."""
    schema, batch = setup
    seq_type, block_type = seq_block
    model = _make(schema, context, seq_type, block_type)

    with pytest.raises((AssertionError, NotImplementedError)):
        jax.eval_shape(
            lambda: model.init(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)},
                batch, True,
            )
        )
