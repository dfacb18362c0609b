"""Sorting-utility goldens vs the reference's own ``tensor_utils``.

``sort_inputs`` and ``reorganize_indices`` are deterministic, so the
executable reference (reference tensor_utils.py — imports only tf and the
mask helper, no tfp) can serve as the oracle directly.  The reference
derives tensor widths from the longest in-batch document, so one document
is stretched to full length (same trick as test_checkpoint_golden.py).

Tie note: the reference sorts a base-100 packed priority with TF's
(unstable) argsort; ours is a stable lexsort.  Elements tied on all five
sort keys could legally permute differently, so the fixture data draws
continuous geometry (discretized to 64 bins) where valid-element ties
don't occur; padding rows are identical element-wise, so any permutation
among them gathers equal values.
"""

import numpy as np
import pytest

from tests.ref_oracle import reference_available, reference_imports

tf = pytest.importorskip("tensorflow")

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)


@pytest.fixture(scope="module")
def ref_tensor_utils():
    with reference_imports():
        from mfp.models import tensor_utils
    return tensor_utils


def _batch_and_columns(request, dataset):
    import jax.numpy as jnp

    from flexdm_tpu.data import split_device_batch

    spec = request.getfixturevalue(f"{dataset}_spec")
    batch = split_device_batch(
        next(iter(spec.make_dataset("test", batch_size=6)))
    )
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    # Stretch one document so the reference's in-batch width == max_length.
    batch["length"] = batch["length"].at[0, 0].set(
        spec.schema.max_length - 1
    )
    columns = {
        c.name: {
            "is_sequence": c.is_sequence,
            "type": "categorical" if c.is_categorical else "numerical",
            "input_dim": c.input_dim if c.is_categorical else 0,
        }
        for c in spec.schema.modeled
    }
    return spec, batch, columns


@pytest.mark.parametrize("dataset", ["crello", "rico"])
def test_sort_inputs_matches_reference(dataset, request, ref_tensor_utils):
    spec, batch, columns = _batch_and_columns(request, dataset)

    tf_inputs = {
        k: tf.convert_to_tensor(np.asarray(v)) for k, v in batch.items()
    }
    theirs = ref_tensor_utils.sort_inputs(tf_inputs, columns)

    from flexdm_tpu.models.sorting import sort_inputs

    ours = sort_inputs(batch, spec.schema)

    for name in sorted(theirs):
        if name not in ours:
            continue
        a, b = np.asarray(ours[name]), theirs[name].numpy()
        assert a.shape == b.shape, name
        if np.issubdtype(a.dtype, np.integer):
            np.testing.assert_array_equal(a, b, err_msg=f"{dataset}/{name}")
        else:
            np.testing.assert_allclose(
                a, b, rtol=1e-6, atol=1e-6, err_msg=f"{dataset}/{name}"
            )


@pytest.mark.slow
def test_sort_inputs_from_logits_matches_reference(request, ref_tensor_utils):
    """from_logits=True argmaxes categorical logits before packing the
    priority but gathers the ORIGINAL logits (reference
    tensor_utils.py:25-29,39-44)."""
    import jax

    spec, batch, columns = _batch_and_columns(request, "rico")

    key = jax.random.PRNGKey(0)
    logits = dict(batch)
    for c in spec.schema.modeled:
        if c.is_sequence and c.is_categorical:
            key, sub = jax.random.split(key)
            logits[c.name] = jax.random.normal(
                sub, batch[c.name].shape + (c.input_dim,)
            )

    tf_inputs = {
        k: tf.convert_to_tensor(np.asarray(v)) for k, v in logits.items()
    }
    theirs = ref_tensor_utils.sort_inputs(tf_inputs, columns, from_logits=True)

    from flexdm_tpu.models.sorting import sort_inputs

    ours = sort_inputs(logits, spec.schema, from_logits=True)

    for name in sorted(theirs):
        if name not in ours:
            continue
        np.testing.assert_allclose(
            np.asarray(ours[name]),
            theirs[name].numpy(),
            rtol=1e-6,
            atol=1e-6,
            err_msg=name,
        )


def test_reorganize_indices_matches_reference(ref_tensor_utils):
    import jax.numpy as jnp

    from flexdm_tpu.models.sorting import reorganize_indices

    maxlen = 9
    from_inds = np.array([[0], [3], [8], [5], [2]])
    n_elems = np.array([[0], [1], [8], [7], [4]])
    theirs = ref_tensor_utils.reorganize_indices(
        tf.convert_to_tensor(from_inds), tf.convert_to_tensor(n_elems),
        maxlen=maxlen,
    ).numpy()
    ours = np.asarray(
        reorganize_indices(
            jnp.asarray(from_inds), jnp.asarray(n_elems), maxlen
        )
    )
    np.testing.assert_array_equal(ours, theirs)
