"""MaskGIT iterative-decode golden vs the reference's own implementation.

Runs the reference's eager ``iterative_decode`` (reference mfp.py:141-207)
on the reference keras model, and our static-unroll ``iterative_decode``
on the SAME weights (via the real checkpoint converter), from the SAME
inputs and masks — then asserts the decode trajectories agree: identical
committed labels on every masked categorical field and matching final
logits.  This pins the subtlest semantics in the framework (per-sample
commit quota, channel-mean confidence, threshold indexing, round-wise
final-output freezing) against the executable reference, not a reading
of it.

The reference masking module imports tensorflow_probability at module
level but ``iterative_decode`` itself never touches it, so a bare module
stub suffices (same trick as test_checkpoint_golden.py).

Reference-defect note (PARITY.md §2.7): the reference decode contains a
latent broadcast bug — ``threshold`` has shape (B,) but is compared
against (B, S) confidences (reference mfp.py:178-184), which TF rejects
whenever S != B.  It is reachable upstream via ``eval.py --num_iter N``
(eval.py:98), but only survives in ``elem`` mode, where eval.py forces
batch_size=1 (eval.py:140-142) and the (1,) threshold broadcasts; any
group-task eval with B > 1 crashes, and the shipped demo notebooks never
set ``num_iter`` (default 1 → decode off).  The oracle here is the
reference's own source with the one evidently-intended repair
(``threshold[:, None]``), applied textually at import time so everything
else executes verbatim — which also lets this golden run at B=4.
"""

import numpy as np
import pytest

from tests.ref_oracle import reference_available, reference_imports

tf = pytest.importorskip("tensorflow")

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)


@pytest.fixture(scope="module")
def ref_mfp_modules():
    with reference_imports():
        import inspect

        from mfp.data.spec import DataSpec as RefDataSpec
        from mfp.models import mfp as ref_mfp_mod
        from mfp.models.mfp import (
            preprocess_for_test as ref_preprocess_for_test,
        )
        from mfp.models.model import Model as RefModel

    # Repair the one broadcast bug in the reference decode loop — see
    # module docstring — and execute the rest verbatim.
    src = inspect.getsource(ref_mfp_mod.iterative_decode)
    patched = src.replace(
        "confidence[key] >= threshold)", "confidence[key] >= threshold[:, None])"
    )
    assert patched != src, "reference iterative_decode source changed"
    ns = dict(vars(ref_mfp_mod))
    exec(compile(patched, "<patched reference iterative_decode>", "exec"), ns)
    ref_iterative_decode = ns["iterative_decode"]
    return RefDataSpec, RefModel, ref_iterative_decode, ref_preprocess_for_test


def test_maskgit_decode_matches_reference(request, tmp_path, ref_mfp_modules):
    import jax.numpy as jnp

    from flexdm_tpu.data import DatasetSpec, split_device_batch
    from flexdm_tpu.models import MFPModel
    from flexdm_tpu.models.masking import (
        get_initial_masks,
        get_seq_mask,
        preprocess_for_test,
    )
    from flexdm_tpu.models.mfp import iterative_decode
    from flexdm_tpu.train import init_params
    from tools.convert_tf_checkpoint import convert, load_tf_variables

    RefDataSpec, RefModel, ref_iterative_decode, ref_preprocess = (
        ref_mfp_modules
    )
    data_dir = request.getfixturevalue("crello_dir")
    tf.random.set_seed(7)

    ref_spec = RefDataSpec("crello", data_dir, batch_size=4)
    input_columns = ref_spec.make_input_columns()
    # The reference's MFP wrapper strips demo_only columns before calling
    # preprocess_for_test / iterative_decode (reference mfp.py:235-237) —
    # filter_padding would KeyError on the absent id/uuid tensors otherwise.
    model_columns = {
        k: v for k, v in input_columns.items() if not v.get("demo_only", False)
    }
    ref_model = RefModel(
        input_columns=input_columns,
        num_blocks=2,
        block_type="deepsvg",
        latent_dim=32,
        dropout=0.1,
        l2=None,
    )

    spec = DatasetSpec("crello", data_dir, batch_size=4)
    schema = spec.schema
    batch = split_device_batch(
        next(iter(spec.make_dataset("test", batch_size=4)))
    )
    inputs = {k: jnp.asarray(v) for k, v in batch.items()}
    # Static padding == in-batch padding (see test_checkpoint_golden.py).
    inputs["length"] = inputs["length"].at[0, 0].set(schema.max_length - 1)

    # 'pos' task masks: every geometry field of every valid element —
    # enough categorical fields for several non-trivial commit rounds.
    seq_mask = get_seq_mask(inputs["length"], schema.max_length)
    masks = dict(get_initial_masks(schema, seq_mask))
    for name in schema.attribute_groups["pos"]:
        masks[name] = seq_mask

    modified = preprocess_for_test(inputs, schema, masks)

    tf_inputs = {
        k: tf.convert_to_tensor(np.asarray(v)) for k, v in inputs.items()
    }
    tf_masks = {
        k: tf.convert_to_tensor(np.asarray(v))
        for k, v in masks.items()
        if k in model_columns
    }
    tf_modified = ref_preprocess(tf_inputs, model_columns, tf_masks)
    _ = ref_model(tf_modified, training=False)  # build variables

    # Same weights on both sides, via the real converter.
    from tests.ref_oracle import make_tf_root

    prefix = str(tmp_path / "ck")
    make_tf_root(tf, ref_model).save_weights(prefix)
    model = MFPModel(
        schema, latent_dim=32, num_blocks=2, num_heads=8,
        attention_impl="xla",
    )
    template = init_params(model, batch, seed=0)
    params, report = convert(load_tf_variables(prefix), template)
    assert report["unfilled"] == [], report["unfilled"]

    num_iter = 3
    ref_out = ref_iterative_decode(
        ref_model, dict(tf_masks), tf_inputs, model_columns,
        dict(tf_modified), num_iter,
    )
    out = iterative_decode(model, params, masks, inputs, modified, num_iter)

    cat = [c for c in schema.modeled if c.is_sequence and c.is_categorical]
    valid = np.asarray(seq_mask)
    for c in cat:
        ours = np.asarray(jnp.argmax(out[c.name], axis=-1))
        ref = ref_out[c.name].numpy().argmax(-1)
        mask = np.asarray(masks[c.name]) & valid
        np.testing.assert_array_equal(
            ours[mask], ref[mask], err_msg=f"{c.name} committed labels"
        )
        # Matching labels could still hide a desynchronized trajectory
        # (a field committed in different rounds carries that round's
        # logits into final_outputs) — the logits pin the round too.
        np.testing.assert_allclose(
            np.asarray(out[c.name])[mask],
            ref_out[c.name].numpy()[mask],
            atol=5e-4, rtol=1e-3, err_msg=f"{c.name} final logits"
        )
    for name in ("image_embedding", "text_embedding"):
        np.testing.assert_allclose(
            np.asarray(out[name])[valid],
            ref_out[name].numpy()[valid],
            atol=5e-4, rtol=1e-3, err_msg=name,
        )
