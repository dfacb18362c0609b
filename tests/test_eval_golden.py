"""End-to-end eval-score golden vs the reference's own scoring stack.

Reimplements the reference's ``eval.py`` evaluation loop (reference
eval.py:35-120) with the reference's OWN keras model, ``preprocess_for_test``,
``merge_inputs_and_prediction`` and ``LossLayer`` — running on a genuine
converted checkpoint — and asserts our ``evaluate_task`` harness produces
the same per-field Σnum/Σden scores over a whole test split.  This is the
switch-over proof for evaluation: same weights + same data dir => same CSV
numbers, for the deterministic task modes (attribute groups and ``elem``;
``random`` draws RNG and cannot match across frameworks).  Runs on both
schemas — rico additionally pins the sorted-``pos`` protocol
(``sort_inputs`` on targets and logits, reference eval.py:104-106).

Shape note: the reference stack sizes every tensor off the longest in-batch
document (``get_seq_mask`` without ``maxlen``, reference mask.py:21-33),
while our batches are statically padded to ``schema.max_length``.  The
golden data dir therefore gives every document exactly ``max_length``
elements (``synthetic.generate(fixed_length=...)``) so both paddings
coincide and the comparison is over identical tensors.

The reference masking module imports tensorflow_probability at module
level; a bare module stub satisfies it (same trick as the other goldens).
"""

from collections import defaultdict

import numpy as np
import pytest

from tests.ref_oracle import reference_available, reference_imports

tf = pytest.importorskip("tensorflow")

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)]

BATCH = 4


@pytest.fixture(scope="module")
def ref_modules():
    with reference_imports():
        from mfp.data.spec import DataSpec as RefDataSpec
        from mfp.models.architecture.mask import get_seq_mask as ref_seq_mask
        from mfp.models.masking import (
            get_initial_masks as ref_initial_masks,
        )
        from mfp.models.metrics import LossLayer as RefLossLayer
        from mfp.models.mfp import (
            merge_inputs_and_prediction as ref_merge,
            preprocess_for_test as ref_preprocess,
        )
        from mfp.models.model import Model as RefModel
    return {
        "DataSpec": RefDataSpec,
        "Model": RefModel,
        "LossLayer": RefLossLayer,
        "seq_mask": ref_seq_mask,
        "initial_masks": ref_initial_masks,
        "preprocess": ref_preprocess,
        "merge": ref_merge,
    }


@pytest.fixture(scope="module", params=["crello", "rico"])
def golden_setup(request, tmp_path_factory, ref_modules):
    """Converted-checkpoint model pair over a full-length synthetic split."""
    from flexdm_tpu.data import DatasetSpec, split_device_batch, synthetic
    from flexdm_tpu.models import MFPModel
    from flexdm_tpu.train import init_params
    from tools.convert_tf_checkpoint import convert, load_tf_variables

    dataset = request.param
    tf.random.set_seed(11)
    # Every document at exactly max_length elements so the reference's
    # in-batch padding equals our static padding (module doc).
    data_dir2 = tmp_path_factory.mktemp(f"{dataset}_full")
    synthetic.generate(
        dataset, str(data_dir2), 8, 4, 8, seed=3, fixed_length="max"
    )

    ref_spec = ref_modules["DataSpec"](dataset, str(data_dir2),
                                       batch_size=BATCH)
    input_columns = ref_spec.make_input_columns()
    model_columns = {
        k: v for k, v in input_columns.items() if not v.get("demo_only", False)
    }
    ref_model = ref_modules["Model"](
        input_columns=input_columns,
        num_blocks=2,
        block_type="deepsvg",
        latent_dim=32,
        dropout=0.1,
        l2=None,
    )

    spec = DatasetSpec(dataset, str(data_dir2), batch_size=BATCH)
    batch = split_device_batch(
        next(iter(spec.make_dataset("test", batch_size=BATCH)))
    )
    # Build reference variables on an equivalent batch.
    seq_mask = ref_modules["seq_mask"](
        tf.convert_to_tensor(np.asarray(batch["length"]))
    )
    masks = ref_modules["initial_masks"](model_columns, seq_mask)
    tf_batch = {
        k: tf.convert_to_tensor(np.asarray(v)) for k, v in batch.items()
    }
    modified = ref_modules["preprocess"](tf_batch, model_columns, masks)
    _ = ref_model(modified, training=False)

    from tests.ref_oracle import make_tf_root

    prefix = str(tmp_path_factory.mktemp("ckpt") / "ck")
    make_tf_root(tf, ref_model).save_weights(prefix)

    model = MFPModel(
        spec.schema, latent_dim=32, num_blocks=2, num_heads=8,
        attention_impl="xla",
    )
    template = init_params(model, batch, seed=0)
    params, report = convert(load_tf_variables(prefix), template)
    assert report["unfilled"] == [], report["unfilled"]
    return {
        "dataset": dataset,
        "spec": spec,
        "model": model,
        "params": params,
        "ref_model": ref_model,
        "input_columns": input_columns,
        "model_columns": model_columns,
        "ref": ref_modules,
    }


def _ref_evaluate(setup, task_mode, group_keys):
    """The reference eval loop (reference eval.py:35-120, arch 'oneshot')."""
    ref = setup["ref"]
    loss_layer = ref["LossLayer"](setup["input_columns"])
    model_columns = setup["model_columns"]
    total = defaultdict(float)

    from flexdm_tpu.data import split_device_batch

    # The reference forces batch_size=1 for elem (eval.py:140-142): its
    # eye(S) mask only lines up with the S-times-repeated batch at B=1.
    # Our harness keeps B=4 — Σnum/Σden is batch-size invariant.
    batch_size = 1 if task_mode == "elem" else BATCH
    for host_batch in setup["spec"].make_dataset("test", batch_size=batch_size):
        example = {
            k: tf.convert_to_tensor(np.asarray(v))
            for k, v in split_device_batch(host_batch).items()
        }
        S = int(example["left"].shape[1])
        seq_mask = ref["seq_mask"](example["length"])
        assert int(seq_mask.shape[1]) == S, "split must be full-length docs"
        masks = dict(ref["initial_masks"](model_columns, seq_mask))

        if task_mode == "elem":  # reference eval.py:66-72
            mask = tf.cast(tf.eye(S), tf.bool)
            for key, column in model_columns.items():
                example[key] = tf.repeat(example[key], S, axis=0)
                if column["is_sequence"]:
                    masks[key] = mask
        else:  # attribute-group task, reference eval.py:92-94
            for key in group_keys:
                masks[key] = seq_mask

        modified = ref["preprocess"](dict(example), model_columns, dict(masks))
        outputs = setup["ref_model"](modified, training=False)
        prediction = ref["merge"](
            dict(example), model_columns, dict(masks), dict(outputs)
        )
        if setup["dataset"] == "rico" and task_mode == "pos":
            # rico scores 'pos' on lexicographically sorted elements
            # (reference eval.py:104-106, sort_pos).
            sort_flag = tf.fill((int(example["length"].shape[0]),), True)
            (scores,) = loss_layer(
                (dict(example), prediction, masks), False, sort_flag
            )
        else:
            (scores,) = loss_layer((dict(example), prediction, masks))
        for k, v in scores.items():
            total[k] += float(v.numpy())

    ans = {}
    for k in setup["input_columns"]:
        num, den = total.get(f"{k}_score_num"), total.get(f"{k}_score_den")
        if num is not None and den:
            ans[k] = num / den
    return ans


def test_training_losses_match_reference(golden_setup):
    """Per-field training losses (the add_loss objective) match the
    reference LossLayer on identical masks (reference metrics.py:240-297:
    sum over features/timesteps, mean over batch)."""
    import jax.numpy as jnp

    from flexdm_tpu.data import split_device_batch
    from flexdm_tpu.models.losses import compute_mfp_loss
    from flexdm_tpu.models.masking import (
        get_initial_masks,
        get_seq_mask,
        merge_inputs_and_prediction,
        preprocess_for_test,
    )

    setup = golden_setup
    ref = setup["ref"]
    schema = setup["spec"].schema
    loader = setup["spec"].make_dataset("test", batch_size=BATCH)
    inputs = {
        k: jnp.asarray(v)
        for k, v in split_device_batch(next(iter(loader))).items()
    }

    seq_mask = get_seq_mask(inputs["length"], schema.max_length)
    masks = dict(get_initial_masks(schema, seq_mask))
    for name in schema.attribute_groups["pos"]:
        masks[name] = seq_mask

    modified = preprocess_for_test(inputs, schema, masks)
    out = setup["model"].apply(setup["params"], modified, deterministic=True)
    merged = merge_inputs_and_prediction(inputs, schema, masks, out)
    _, metrics = compute_mfp_loss(schema, inputs, merged, masks)

    example = {
        k: tf.convert_to_tensor(np.asarray(v)) for k, v in inputs.items()
    }
    tf_masks = {
        k: tf.convert_to_tensor(np.asarray(v))
        for k, v in masks.items()
        if k in setup["model_columns"]
    }
    tf_modified = ref["preprocess"](
        dict(example), setup["model_columns"], dict(tf_masks)
    )
    tf_out = setup["ref_model"](tf_modified, training=False)
    tf_merged = ref["merge"](
        dict(example), setup["model_columns"], dict(tf_masks), dict(tf_out)
    )
    loss_layer = ref["LossLayer"](setup["input_columns"])
    loss_layer((dict(example), tf_merged, tf_masks))
    ref_losses = {
        m.name: float(m.result())
        for m in loss_layer.metrics
        if m.name.endswith("_loss")
    }

    assert ref_losses, "reference LossLayer reported no losses"
    for name, value in ref_losses.items():
        np.testing.assert_allclose(
            float(metrics[name]), value, rtol=5e-4, atol=5e-4,
            err_msg=name,
        )


@pytest.mark.parametrize("task", ["pos", "txt", "elem"])
def test_eval_scores_match_reference(task, golden_setup):
    from flexdm_tpu.evaluation.harness import evaluate_task

    setup = golden_setup
    schema = setup["spec"].schema
    groups = schema.attribute_groups

    if task == "elem":
        group, group_keys = None, None
    else:
        if task not in groups:
            pytest.skip(f"{setup['dataset']} has no {task!r} group")
        group_keys = tuple(groups[task])
        group = (task, group_keys)

    ours = evaluate_task(
        setup["model"],
        setup["params"],
        setup["spec"].make_dataset("test", batch_size=BATCH),
        task,
        group,
    )
    theirs = _ref_evaluate(setup, task, group_keys)

    assert set(ours) == set(theirs), (set(ours), set(theirs))
    for k in sorted(theirs):
        np.testing.assert_allclose(
            ours[k], theirs[k], rtol=1e-4, atol=1e-4,
            err_msg=f"{task}:{k} score",
        )
