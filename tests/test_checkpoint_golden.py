"""Checkpoint-parity golden: a REAL reference TF checkpoint round-trips.

The bit-parity north star (SURVEY §7 stage 2): instantiate the reference's
own keras MFP architecture (imported from ``/root/reference/src/mfp`` as a
golden oracle — reference model.py:33-52, architecture/{encoder,decoder,
transformer}.py), save a genuine keras ``save_weights`` TF checkpoint
(reference train.py:97), run ``tools/convert_tf_checkpoint.py`` on the file,
and assert the converted flexdm_tpu model reproduces the TF logits on a
fixed batch for BOTH dataset schemas.

This exercises the real checkpoint reader plus every name-mapping rule, and
pins the keras variable tree the released checkpoints use.  The reference
package's masking module imports tensorflow_probability (unavailable here);
a bare module stub satisfies the import — none of its TFP symbols are used
on the forward path.
"""

import numpy as np
import pytest

from tests.ref_oracle import reference_available, reference_imports

tf = pytest.importorskip("tensorflow")

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)]


@pytest.fixture(scope="module")
def ref_modules():
    """Import the reference architecture (golden oracle, never shipped)."""
    with reference_imports():
        from mfp.data.spec import DataSpec as RefDataSpec
        from mfp.models.model import Model as RefModel
    return RefDataSpec, RefModel


def _modified_inputs(spec, batch_size=4):
    """A fixed eval-path batch (padding filtered, no fields masked)."""
    import jax.numpy as jnp

    from flexdm_tpu.data import split_device_batch
    from flexdm_tpu.models.masking import (
        get_initial_masks,
        get_seq_mask,
        preprocess_for_test,
    )

    batch = split_device_batch(
        next(iter(spec.make_dataset("test", batch_size=batch_size)))
    )
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    seq_mask = get_seq_mask(batch["length"], spec.schema.max_length)
    masks = get_initial_masks(spec.schema, seq_mask)
    modified = preprocess_for_test(batch, spec.schema, masks)
    # The reference pads ragged batches to the max IN-BATCH length, while our
    # tensors are statically padded to schema.max_length.  Stretch one
    # document to full length so both paddings coincide: the stretched slots
    # already hold the NULL ("unused") token from filter_padding, which both
    # models embed identically, so this is a valid document either way.
    modified["length"] = modified["length"].at[0, 0].set(
        spec.schema.max_length - 1
    )
    return modified


@pytest.mark.parametrize("dataset", ["crello", "rico"])
def test_tf_checkpoint_round_trip(dataset, request, tmp_path, ref_modules):
    import jax.numpy as jnp

    from flexdm_tpu.data import DatasetSpec, split_device_batch
    from flexdm_tpu.models import MFPModel
    from flexdm_tpu.train import init_params
    from tools.convert_tf_checkpoint import convert, load_tf_variables

    RefDataSpec, RefModel = ref_modules
    data_dir = request.getfixturevalue(f"{dataset}_dir")

    # The reference DataSpec consumes OUR synthetic data dir directly —
    # count.json / vocabulary.json / tfrecords are the declared contract.
    ref_spec = RefDataSpec(dataset, data_dir, batch_size=4)
    input_columns = ref_spec.make_input_columns()

    latent_dim, num_blocks = 32, 2
    ref_model = RefModel(
        input_columns=input_columns,
        num_blocks=num_blocks,
        block_type="deepsvg",
        context=None,
        input_dtype="set",
        latent_dim=latent_dim,
        dropout=0.1,
        l2=None,
    )

    spec = DatasetSpec(dataset, data_dir, batch_size=4)
    modified = _modified_inputs(spec)
    tf_inputs = {
        k: tf.convert_to_tensor(np.asarray(v)) for k, v in modified.items()
    }
    out_tf = ref_model(tf_inputs, training=False)

    # Genuine reference checkpoint artifact (see ref_oracle.make_tf_root).
    from tests.ref_oracle import make_tf_root

    root = make_tf_root(tf, ref_model)
    _ = root(tf_inputs)
    ckpt_prefix = str(tmp_path / "ref_ckpt")
    root.save_weights(ckpt_prefix)

    # Convert the real checkpoint file into our parameter tree.
    variables = load_tf_variables(ckpt_prefix)
    model = MFPModel(
        spec.schema, latent_dim=latent_dim, num_blocks=num_blocks,
        num_heads=8, attention_impl="xla",
    )
    sample = split_device_batch(
        next(iter(spec.make_dataset("test", batch_size=2)))
    )
    template = init_params(model, sample, seed=0)
    params, report = convert(variables, template)
    assert report["unfilled"] == [], report["unfilled"]

    out_jax = model.apply(params, modified, True)

    tf_keys = set(out_tf.keys())
    jax_keys = {k for k in out_jax if k in spec.schema}
    assert tf_keys == jax_keys, (tf_keys, jax_keys)
    for key in sorted(tf_keys):
        np.testing.assert_allclose(
            np.asarray(out_jax[key]),
            out_tf[key].numpy(),
            atol=1e-4,
            rtol=1e-4,
            err_msg=f"{dataset}/{key}",
        )


@pytest.mark.parametrize("context", ["canvas", "id"])
def test_tf_checkpoint_round_trip_context_models(
    context, request, tmp_path, ref_modules
):
    """Context-conditioned variants also round-trip: the converter maps the
    canvas-aggregation / task-embedding variables (reference
    encoder.py:228-249) and logits match the reference keras model."""
    import jax.numpy as jnp

    from flexdm_tpu.data import DatasetSpec, split_device_batch
    from flexdm_tpu.models import MFPModel
    from flexdm_tpu.train import init_params
    from tools.convert_tf_checkpoint import convert, load_tf_variables

    RefDataSpec, RefModel = ref_modules
    data_dir = request.getfixturevalue("crello_dir")
    tf.random.set_seed(5)

    ref_spec = RefDataSpec("crello", data_dir, batch_size=4)
    input_columns = ref_spec.make_input_columns()
    ref_model = RefModel(
        input_columns=input_columns,
        num_blocks=2,
        block_type="deepsvg",
        context=context,
        input_dtype="set",
        latent_dim=32,
        dropout=0.1,
        l2=None,
    )

    spec = DatasetSpec("crello", data_dir, batch_size=4)
    modified = dict(_modified_inputs(spec))
    if context == "id":
        # task-id conditioning consumes the `task` input (reference
        # encoder.py:243-249); preprocess emits it as a (B, 1) float.
        modified["task"] = jnp.zeros((4, 1), jnp.float32)
    tf_inputs = {
        k: tf.convert_to_tensor(np.asarray(v)) for k, v in modified.items()
    }
    out_tf = ref_model(tf_inputs, training=False)

    from tests.ref_oracle import make_tf_root

    prefix = str(tmp_path / "ck")
    make_tf_root(tf, ref_model).save_weights(prefix)

    model = MFPModel(
        spec.schema, latent_dim=32, num_blocks=2, num_heads=8,
        context=context, attention_impl="xla",
    )
    sample = split_device_batch(
        next(iter(spec.make_dataset("test", batch_size=2)))
    )
    template = init_params(model, sample, seed=0)
    params, report = convert(load_tf_variables(prefix), template)
    assert report["unfilled"] == [], report["unfilled"]

    out_jax = model.apply(params, modified, True)
    for key in sorted(out_tf.keys()):
        np.testing.assert_allclose(
            np.asarray(out_jax[key]),
            out_tf[key].numpy(),
            atol=1e-4,
            rtol=1e-4,
            err_msg=f"{context}/{key}",
        )


def test_unmatched_reference_variables_are_only_bookkeeping(
    request, tmp_path, ref_modules
):
    """Every model variable in the checkpoint maps; leftovers are keras
    bookkeeping (save_counter / object graph), not missed weights."""
    from flexdm_tpu.data import DatasetSpec, split_device_batch
    from flexdm_tpu.models import MFPModel
    from flexdm_tpu.train import init_params
    from tools.convert_tf_checkpoint import (
        convert,
        load_tf_variables,
        map_variable,
    )

    RefDataSpec, RefModel = ref_modules
    data_dir = request.getfixturevalue("crello_dir")
    ref_spec = RefDataSpec("crello", data_dir, batch_size=2)
    ref_model = RefModel(
        input_columns=ref_spec.make_input_columns(),
        num_blocks=1,
        block_type="deepsvg",
        latent_dim=16,
        dropout=0.1,
        l2=None,
    )

    spec = DatasetSpec("crello", data_dir, batch_size=2)
    modified = _modified_inputs(spec, batch_size=2)
    tf_inputs = {
        k: tf.convert_to_tensor(np.asarray(v)) for k, v in modified.items()
    }
    _ = ref_model(tf_inputs, training=False)

    ckpt = tf.train.Checkpoint(model=ref_model)
    prefix = ckpt.write(str(tmp_path / "ck"))
    variables = load_tf_variables(prefix)
    n_model_vars = sum(
        1 for k in variables if map_variable(k) is not None
    )
    n_ref_vars = len(ref_model.variables)
    assert n_model_vars == n_ref_vars, (n_model_vars, n_ref_vars)

    model = MFPModel(
        spec.schema, latent_dim=16, num_blocks=1, num_heads=8,
        attention_impl="xla",
    )
    sample = split_device_batch(
        next(iter(spec.make_dataset("test", batch_size=2)))
    )
    _, report = convert(variables, init_params(model, sample, seed=0))
    for leftover in report["unmatched_tf"]:
        assert "OBJECT_GRAPH" in leftover or "save_counter" in leftover, (
            leftover
        )


@pytest.mark.parametrize("dataset", ["crello", "rico"])
def test_reference_pipeline_batch_golden(dataset, request, ref_modules):
    """End-to-end input-pipeline parity: the reference's tf.data pipeline
    (reference data/spec.py:226-287 — parse_sequence_example + lookups +
    discretizers) and our DataLoader must produce the SAME preprocessed
    records from the same data dir.

    The reference pads ragged batches to the in-batch max length while we pad
    statically to schema.max_length, so records are compared trimmed to their
    own length and matched as sorted multisets (shard order differs).
    """
    import numpy as np

    from flexdm_tpu.data import DatasetSpec

    RefDataSpec, _ = ref_modules
    data_dir = request.getfixturevalue(f"{dataset}_dir")
    ref_spec = RefDataSpec(dataset, data_dir, batch_size=8)
    spec = DatasetSpec(dataset, data_dir, batch_size=8)
    schema = spec.schema

    def canonical(rec):
        """Trim sequence columns to the record's length; serialize."""
        n = int(np.asarray(rec["length"]).reshape(-1)[0]) + 1
        parts = []
        for c in sorted(schema.columns, key=lambda c: c.name):
            if c.name not in rec:
                continue
            v = np.asarray(rec[c.name])
            if c.is_sequence:
                v = v[:n]
            if v.dtype.kind in ("U", "S", "O"):  # demo-only string columns
                key = "|".join(
                    x.decode() if isinstance(x, bytes) else str(x)
                    for x in v.reshape(-1)
                )
            else:
                key = v.astype(np.float64).round(5).tobytes()
            parts.append((c.name, key))
        return repr(parts)

    ours = []
    for batch in spec.make_dataset("test", batch_size=8, pad_final_batch=False):
        n_valid = batch["num_valid"]
        for i in range(n_valid):
            ours.append(canonical({k: v[i] for k, v in batch.items()
                                   if k != "num_valid"}))

    theirs = []
    for batch in ref_spec.make_dataset("test", batch_size=8, shuffle=False):
        B = int(batch["length"].shape[0])
        for i in range(B):
            theirs.append(canonical(
                {k: v[i].numpy() for k, v in batch.items()}
            ))

    assert len(ours) == len(theirs)
    assert sorted(ours) == sorted(theirs)
