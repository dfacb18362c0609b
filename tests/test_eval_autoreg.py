"""Autoreg-protocol evaluation pieces: element reordering + baseline eval."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdm_tpu.evaluation.harness import _expand_elem
from flexdm_tpu.models import forward_eval
from flexdm_tpu.models.baselines import AutoReg
from flexdm_tpu.models.masking import get_initial_masks, get_seq_mask
from tests.test_baselines import _common, _init
from tests.test_masking import tiny_inputs, tiny_schema


def test_expand_elem_autoreg_moves_target_last():
    schema = tiny_schema()
    x = tiny_inputs(schema=schema, lengths=(3, 1, 0, 2))
    expanded, eye, weight = _expand_elem(x, schema, autoreg=True)
    S = schema.max_length
    B = 4
    assert expanded["left"].shape == (B * S, S, 1)
    lengths = np.asarray(x["length"][:, 0])
    left = np.asarray(x["left"][..., 0])
    for b in range(B):
        L = lengths[b]
        for i in range(L + 1):  # valid elements only
            r = b * S + i
            # replica (b, i): element i moved to position L
            row = np.asarray(expanded["left"][r, :, 0])
            assert row[L] == left[b, i]
            # the mask marks exactly that position
            m = np.asarray(eye[r])
            assert m[L] and m.sum() == 1
            assert float(weight[r]) == 1.0
        # padding replicas weighted out
        assert float(weight[b * S + L + 1]) == 0.0 if L + 1 < S else True


@pytest.mark.slow
def test_forward_eval_with_autoreg_baseline():
    schema = tiny_schema()
    x = tiny_inputs(schema=schema, lengths=(2, 3, 1, 2))
    seq = get_seq_mask(x["length"], schema.max_length)
    masks = get_initial_masks(schema, seq)
    masks["left"] = seq
    model = AutoReg(**_common(schema))
    params = _init(model, x, masks)
    out = forward_eval(model, params, x, masks)
    # unmasked fields merged back as one-hot ground truth
    onehot = jax.nn.one_hot(x["top"], 8)
    np.testing.assert_allclose(np.asarray(out["top"]), np.asarray(onehot))
    assert np.all(np.isfinite(np.asarray(out["left"])))


@pytest.mark.slow
def test_elem_eval_live_path_matches_expand_elem_spec(crello_spec):
    """The chunked on-device elem step (the live path in evaluate_task) must
    reproduce the _expand_elem specification exactly, autoreg reordering
    included."""
    from collections import defaultdict

    from flexdm_tpu.evaluation.harness import (
        evaluate_task,
        make_eval_step,
    )
    from flexdm_tpu.models import MFPModel
    from flexdm_tpu.data import split_device_batch
    from flexdm_tpu.train import init_params

    schema = crello_spec.schema
    model = MFPModel(schema, latent_dim=16, num_blocks=1, num_heads=2,
                     attention_impl="xla")
    loader = crello_spec.make_dataset("test", batch_size=4)
    batch = {k: jnp.asarray(v)
             for k, v in split_device_batch(next(iter(loader))).items()}
    params = init_params(model, batch, seed=0)

    fast = evaluate_task(model, params,
                         crello_spec.make_dataset("test", batch_size=4),
                         "elem", None, elem_chunk=32)

    # Spec path: full B*S expansion via _expand_elem, scored in chunks.
    step, names = make_eval_step(model, num_iter=1, sort=False)
    total = defaultdict(float)
    for host in crello_spec.make_dataset("test", batch_size=4,
                                         pad_final_batch=False):
        b = {k: jnp.asarray(v)
             for k, v in split_device_batch(host).items()}
        expanded, eye, weight = _expand_elem(b, schema, autoreg=False)
        masks = get_initial_masks(
            schema, jnp.zeros_like(eye)
        )
        for c in schema.modeled:
            if c.is_sequence:
                masks[c.name] = eye
        stacked = step(params, expanded, masks, weight.astype(jnp.float32))
        for k, v in zip(names, np.asarray(stacked).tolist()):
            total[k] += v
    for c in schema.columns:
        num = total.get(f"{c.name}_score_num")
        den = total.get(f"{c.name}_score_den")
        if num is not None and den:
            np.testing.assert_allclose(
                fast[c.name], num / den, rtol=1e-4, err_msg=c.name
            )
