"""Reverse-converter golden: our params load back into the reference stack.

Full migration cycle against the reference's own keras model:

  reference checkpoint --convert--> our params --train 2 steps-->
  --export--> TF checkpoint --load_weights--> fresh reference model

and the reference model's logits must match our trained model's.  This
proves `tools/export_tf_checkpoint.py` writes checkpoints the original TF
stack accepts (reference eval.py:169-172 loads with ``load_weights``), so
models trained here can be evaluated/served/fine-tuned by the reference.
"""

import numpy as np
import pytest

from tests.ref_oracle import (
    make_tf_root,
    reference_available,
    reference_imports,
)

tf = pytest.importorskip("tensorflow")

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)]


@pytest.fixture(scope="module")
def ref_modules():
    with reference_imports():
        from mfp.data.spec import DataSpec as RefDataSpec
        from mfp.models.model import Model as RefModel
    return RefDataSpec, RefModel


def test_export_round_trip(tmp_path, ref_modules):
    import jax
    import jax.numpy as jnp

    from flexdm_tpu.data import DatasetSpec, split_device_batch, synthetic
    from flexdm_tpu.models import MFPModel, make_task_config
    from flexdm_tpu.models.masking import (
        get_initial_masks,
        get_seq_mask,
        preprocess_for_test,
    )
    from flexdm_tpu.train import (
        TrainState,
        init_params,
        make_optimizer,
        make_train_step,
    )
    from tools.convert_tf_checkpoint import convert, load_tf_variables
    from tools.export_tf_checkpoint import (
        export,
        load_template,
        write_v2_checkpoint,
    )

    RefDataSpec, RefModel = ref_modules
    tf.random.set_seed(31)
    data_dir = tmp_path / "data"
    synthetic.generate("crello", str(data_dir), 16, 4, 4, seed=6,
                       fixed_length="max")

    ref_spec = RefDataSpec("crello", str(data_dir), batch_size=4)
    cols = ref_spec.make_input_columns()

    def build_ref():
        m = RefModel(input_columns=cols, num_blocks=2, block_type="deepsvg",
                     latent_dim=32, dropout=0.0, l2=None)
        _ = m(tf_modified, training=False)
        return m

    spec = DatasetSpec("crello", str(data_dir), batch_size=4)
    schema = spec.schema
    batch = {
        k: jnp.asarray(v)
        for k, v in split_device_batch(
            next(iter(spec.make_dataset("test", batch_size=4)))
        ).items()
    }
    seq_mask = get_seq_mask(batch["length"], schema.max_length)
    masks = get_initial_masks(schema, seq_mask)
    modified = preprocess_for_test(batch, schema, masks)
    tf_modified = {
        k: tf.convert_to_tensor(np.asarray(v)) for k, v in modified.items()
    }

    ref_model = build_ref()
    prefix = str(tmp_path / "ref_ckpt")
    make_tf_root(tf, ref_model).save_weights(prefix)

    # convert -> our params
    model = MFPModel(schema, latent_dim=32, num_blocks=2, num_heads=8,
                     dropout=0.0, attention_impl="xla")
    template = init_params(model, batch, seed=0)
    params, report = convert(load_tf_variables(prefix), template)
    assert report["unfilled"] == []

    # train 2 steps so the exported weights provably differ from the source
    tc = make_task_config(schema, "pos")
    tx = make_optimizer(1e-3, clipnorm=1.0)
    step = jax.jit(make_train_step(model, tc, tx, l2=None))
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.asarray(0))
    for i in range(2):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
    trained = state.params

    # export -> TF checkpoint (template: the original reference checkpoint)
    values, dtypes = load_template(prefix)
    tensors, rep = export(values, dtypes, trained)
    assert rep["unexported"] == [], rep["unexported"]
    out_prefix = str(tmp_path / "exported")
    write_v2_checkpoint(out_prefix, tensors, dtypes)

    # fresh reference model loads the export and reproduces OUR logits
    tf.random.set_seed(77)
    ref2 = build_ref()
    root2 = make_tf_root(tf, ref2)
    root2.load_weights(out_prefix)
    out_tf = ref2(tf_modified, training=False)
    out_ours = model.apply(trained, modified, True)
    for name in sorted(out_tf.keys()):
        np.testing.assert_allclose(
            np.asarray(out_ours[name]),
            out_tf[name].numpy(),
            atol=1e-4,
            rtol=1e-4,
            err_msg=name,
        )
    # and the training actually moved the weights (the comparison above is
    # not vacuously matching the unchanged source checkpoint)
    out_src = ref_model(tf_modified, training=False)
    deltas = [
        float(np.abs(out_src[k].numpy() - out_tf[k].numpy()).max())
        for k in out_tf
    ]
    assert max(deltas) > 1e-3, "training left the checkpoint unchanged"
