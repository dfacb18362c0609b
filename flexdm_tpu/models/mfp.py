"""The MFP (masked-field prediction) model and its task heads.

Counterpart of reference ``src/mfp/mfp/models/mfp.py`` +
``models/model.py:9-71``.  The architecture is the "oneshot" stack —
Encoder -> N transformer blocks -> per-field Decoder — the only one reachable
in the shipped reference trainer (mfp.py:230 asserts ``arch_type ==
'oneshot'``); VAE/autoregressive baselines live under
``flexdm_tpu.models.baselines``.

Unlike the reference (a stateful keras Model that mixes preprocessing, the
network, the loss, and demo logic in ``MFP.call``), the pieces here are pure
functions over an explicit parameter pytree, composed by the trainer into a
single jit-compiled step:

* :class:`MFPModel` — the network (flax module);
* :func:`forward_train` — task sampling + masking + network + loss;
* :func:`forward_eval` — externally-given masks + network + GT merge
  (the reference's ``demo_args`` path);
* :func:`iterative_decode` — MaskGIT-style confidence-ordered decoding
  (reference mfp.py:141-207).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..data.schema import Schema
from .decoder import Decoder
from .encoder import Encoder
from .losses import compute_mfp_loss
from .masking import (
    apply_token,
    filter_padding,
    get_seq_mask,
    merge_inputs_and_prediction,
    preprocess_for_test,
    preprocess_for_train,
    sample_tasks,
)
from .sorting import shuffle_inputs, sort_inputs
from .transformer import Blocks

Arrays = Dict[str, jnp.ndarray]


class MFPModel(nn.Module):
    """Encoder -> Blocks -> Decoder (reference model.py:9-52).

    ``seq_type='default'`` is the element-token model (fusion 'add');
    ``seq_type='flat'`` is the VanillaTransformer over (element, field)
    tokens (reference model.py:55-71, requires ``input_dtype='shuffled_set'``).
    """

    schema: Schema
    latent_dim: int = 256
    num_blocks: int = 4
    block_type: str = "deepsvg"
    num_heads: int = 8
    dropout: float = 0.1
    context: Optional[str] = None
    input_dtype: str = "set"
    seq_type: str = "default"
    use_elemwise_noise: bool = False
    attention_impl: str = "auto"
    dtype: str = None  # e.g. "bfloat16" for MXU-native compute; params f32
    remat: bool = False

    @nn.compact
    def __call__(
        self, inputs: Arrays, deterministic: bool = True
    ) -> Arrays:
        if self.seq_type == "flat":
            assert self.input_dtype == "shuffled_set", self.input_dtype
            fusion = detachment = "flat"
        else:
            fusion, detachment = "add", "default"

        seq, seq_mask = Encoder(
            self.schema,
            latent_dim=self.latent_dim,
            context=self.context,
            input_dtype=self.input_dtype,
            fusion=fusion,
            dropout=self.dropout,
            use_elemwise_noise=self.use_elemwise_noise,
            dtype=self.dtype,
            name="encoder",
        )(inputs, deterministic)
        h = Blocks(
            latent_dim=self.latent_dim,
            num_blocks=self.num_blocks,
            block_type=self.block_type,
            num_heads=self.num_heads,
            dropout=self.dropout,
            attention_impl=self.attention_impl,
            dtype=self.dtype,
            remat=self.remat,
            name="blocks",
        )(seq, seq_mask, deterministic=deterministic)
        return Decoder(
            self.schema,
            latent_dim=self.latent_dim,
            context=self.context,
            detachment=detachment,
            dtype=self.dtype,
            name="decoder",
        )(h, deterministic)


@dataclasses.dataclass(frozen=True)
class TaskConfig:
    """Static per-run task configuration."""

    task_probs: Tuple[float, ...]
    sort_pos: bool
    pos_task_id: int


def make_task_config(schema: Schema, masking_method: str) -> TaskConfig:
    from ..data.schema import make_task_probs

    return TaskConfig(
        task_probs=tuple(make_task_probs(schema, masking_method)),
        sort_pos=schema.sort_pos,
        pos_task_id=schema.task_names.index("pos"),
    )


def forward_train(
    model: MFPModel,
    params,
    inputs: Arrays,
    key: jax.Array,
    task_config: TaskConfig,
    train: bool = True,
    sample_weight: Optional[jnp.ndarray] = None,
    mask_draws: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One training forward pass: sample tasks, mask, predict, score.

    Mirrors reference MFP.call training branch (mfp.py:298-341) with the RNG
    made explicit so it jit-compiles.  ``train=False`` keeps the random task
    masking (that is how the reference validates, via keras ``model.fit``
    validation calling the same path) but disables dropout/noise.
    ``sample_weight`` (B,) zeroes batch-padding rows so validation num/den
    sums stay exact under static batch shapes.
    """
    schema = model.schema
    k_task, k_shuffle, k_mask, k_drop, k_noise, k_vae = jax.random.split(key, 6)
    B = inputs["length"].shape[0]

    tasks = sample_tasks(k_task, B, task_config.task_probs)

    is_autoreg = getattr(model, "is_autoreg", False)
    input_dtype = getattr(model, "input_dtype", "set")
    if is_autoreg or input_dtype == "shuffled_set":
        inputs = shuffle_inputs(inputs, schema, k_shuffle)
    elif input_dtype == "sorted_set":
        inputs = sort_inputs(inputs, schema)

    # Train batches are full fixed-size (drop_remainder), so the big
    # random-replacement draws can use the hardware rbg generator; val
    # (train=False) keeps threefry for exact batch-size invariance.
    targets, modified, masks = preprocess_for_train(
        inputs, schema, tasks, k_mask, is_autoreg=is_autoreg, fast_rng=train,
        draws=mask_draws,
    )
    rngs = (
        {"dropout": k_drop, "noise": k_noise, "vae": k_vae}
        if train
        else {"noise": k_noise, "vae": k_vae}
    )
    outputs, aux = apply_model(
        model, params, modified, targets, masks,
        deterministic=not train, rngs=rngs,
    )

    sort_flag = None
    if task_config.sort_pos:
        sort_flag = tasks == task_config.pos_task_id
    loss, metrics = compute_mfp_loss(
        schema, targets, outputs, masks, sort_flag=sort_flag,
        sample_weight=sample_weight,
    )
    for name, value in aux.items():
        metrics[name] = value
        if name.endswith("_loss") or name == "kl_loss":
            loss = loss + value
    metrics["loss"] = loss
    return loss, metrics


def apply_model(
    model: nn.Module,
    params,
    modified: Arrays,
    targets: Arrays,
    masks: Arrays,
    deterministic: bool,
    rngs,
) -> Tuple[Arrays, Dict[str, jnp.ndarray]]:
    """Uniform forward over the oneshot model and the baselines.

    Oneshot (MFPModel) consumes only the masked inputs; baselines
    (CanvasVAE / LayoutVAE / AutoReg / BART) additionally take the targets
    (teacher forcing) and the mfp masks (step-wise GT merge), and return
    ``(outputs, aux-losses)`` — the reference threaded these through
    ``self.model(modified_inputs, targets, masks, training)``
    (reference mfp.py:330-333).
    """
    if isinstance(model, MFPModel):
        outputs = model.apply(params, modified, deterministic, rngs=rngs)
        return outputs, {}
    return model.apply(
        params, modified, targets, masks, deterministic, rngs=rngs
    )


def forward_eval(
    model: MFPModel,
    params,
    inputs: Arrays,
    masks: Arrays,
    tasks: Optional[jnp.ndarray] = None,
    num_iter: int = 1,
) -> Arrays:
    """Demo/eval forward with externally supplied masks (mfp.py:303-344).

    Returns predictions with ground truth merged back onto unmasked fields.
    """
    schema = model.schema
    modified = preprocess_for_test(inputs, schema, masks, tasks)
    if not isinstance(model, MFPModel):
        # Baselines: sequential decode conditioned on the masked inputs,
        # merging committed predictions via the mfp masks internally.
        outputs, _ = apply_model(
            model, params, modified, inputs, masks,
            deterministic=True, rngs={},
        )
    elif num_iter > 1:
        outputs = iterative_decode(
            model, params, masks, inputs, modified, num_iter
        )
    else:
        outputs = model.apply(params, modified, deterministic=True)
    return merge_inputs_and_prediction(inputs, schema, masks, outputs)


def iterative_decode(
    model: MFPModel,
    params,
    masks: Arrays,
    inputs: Arrays,
    modified_inputs: Arrays,
    num_iter: int,
) -> Arrays:
    """MaskGIT-style decoding (reference mfp.py:141-207).

    Each round commits the top-k most confident categorical predictions
    (confidence = channel-mean of the max softmax probability) and re-masks
    the rest; numerical fields take the final round's predictions.  The loop
    is a static unroll — ``num_iter`` is a compile-time constant — so the
    whole decode is one XLA program, where the reference looped in Python
    with ``.numpy()`` round trips.
    """
    schema = model.schema
    masks = dict(masks)
    seq_mask = get_seq_mask(inputs["length"], schema.max_length)
    filtered = filter_padding(inputs, schema, seq_mask)
    cat_cols = [
        c for c in schema.modeled if c.is_sequence and c.is_categorical
    ]

    num_masked = sum(
        jnp.sum(masks[c.name].astype(jnp.int32), axis=-1) for c in cat_cols
    )  # (B,)
    num_update = jnp.round(num_masked / num_iter).astype(jnp.int32)

    modified = dict(modified_inputs)
    final_outputs: Optional[Arrays] = None
    outputs: Arrays = {}
    for i in range(num_iter):
        outputs = model.apply(params, modified, deterministic=True)
        if i == 0:
            final_outputs = dict(outputs)

        confidence = {
            c.name: jnp.where(
                masks[c.name],
                jnp.mean(
                    jnp.max(jax.nn.softmax(outputs[c.name], axis=-1), axis=-1),
                    axis=-1,
                ),
                0.0,
            )
            for c in cat_cols
        }  # each (B, S)
        conf_all = jnp.concatenate(
            [confidence[c.name] for c in cat_cols], axis=-1
        )
        conf_sorted = jnp.sort(conf_all, axis=-1)[:, ::-1]  # descending
        idx = jnp.clip(num_update, 0, conf_all.shape[-1] - 1)
        threshold = jnp.take_along_axis(conf_sorted, idx[:, None], axis=-1)

        for c in cat_cols:
            name = c.name
            pred = jnp.argmax(outputs[name], axis=-1).astype(
                filtered[name].dtype
            )
            update = (confidence[name] >= threshold) & (confidence[name] > 0)
            filtered[name] = jnp.where(
                update[:, :, None], pred, filtered[name]
            )
            masks[name] = masks[name] & ~update
            if i > 0:
                final_outputs[name] = jnp.where(
                    update[:, :, None, None],
                    outputs[name],
                    final_outputs[name],
                )

        for c in schema.modeled:
            if c.is_sequence:
                modified[c.name] = apply_token(
                    filtered[c.name], c, masks[c.name], "masked"
                )

    # Numerical fields: last round wins (reference mfp.py:203-205).
    for c in schema.modeled:
        if c.is_sequence and not c.is_categorical:
            final_outputs[c.name] = outputs[c.name]
    return final_outputs
