"""Demo inference: the notebook workflow as a script.

Counterpart of the reference's ``notebooks/demo_crello.ipynb`` /
``demo_rico.ipynb`` + ``notebooks/util.py``: load a trained job, build
per-task masks by hand (reference demo cell: ``get_initial_masks`` +
attribute groups), run the model with those masks, and render ground-truth /
masked-input / prediction documents side by side as SVG into a single HTML
page.

Usage::

    python -m flexdm_tpu.demo --job-dir /path/to/job --task pos \
        --num-examples 4 --out demo.html
"""

from __future__ import annotations

import argparse
import dataclasses
import html
import json
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .data import DatasetSpec, split_device_batch
from .evaluation.harness import _group_masks
from .helpers.svg import SVGBuilder
from .models import forward_eval
from .models.masking import (
    apply_token,
    filter_padding,
    get_initial_masks,
    get_seq_mask,
)
from .train import checkpoint as ckpt_lib
from .train.trainer import TrainConfig, build_model, init_params


def load_model(job_dir: str, checkpoint: str = "best", batch_size: int = 8,
               timings: Optional[Dict[str, float]] = None):
    """Rebuild the model of a training job and load its weights
    (reference notebooks/util.py:16-27)."""
    import time as _time

    t0 = _time.perf_counter()

    def _tick(stage):
        nonlocal t0
        now = _time.perf_counter()
        if timings is not None:
            timings[stage] = round(now - t0, 3)
        t0 = now

    with open(os.path.join(job_dir, "args.json")) as f:
        train_args = json.load(f)
    config = TrainConfig(**{
        k: v for k, v in train_args.items()
        if k in {f.name for f in dataclasses.fields(TrainConfig)}
    })
    spec = DatasetSpec(config.dataset_name, config.data_dir, batch_size)
    _tick("spec")
    model = build_model(config, spec.schema)
    sample = split_device_batch(next(iter(spec.make_dataset("test", batch_size=2))))
    _tick("sample_batch")
    # Abstract init: the checkpoint load below supplies every value, so
    # computing real init values would only buy a 65 s remote compile.
    params = init_params(model, sample, config.seed, abstract=True)
    _tick("init_params")
    params = ckpt_lib.load_checkpoint(
        os.path.join(job_dir, "checkpoints", checkpoint), params
    )
    _tick("load_checkpoint")
    # Commit the restored weights to device ONCE: orbax restores host numpy
    # leaves, and passing those to a jitted step re-uploads the whole model
    # every call (98 buffers / 11.2 MB here = ~340 ms/request of the warm
    # serving latency before this line existed).
    params = jax.device_put(params)
    _tick("device_put")
    return model, params, spec


def build_task_masks(schema, batch, task: str, key=None, element=None):
    """Masks for a demo task: 'elem' masks one element, groups mask fields.

    ``element`` (elem task only): a (B,) int32 array of element indices to
    mask instead of a random draw — the interactive "regenerate THIS
    element" path.  Indices are intersected with the valid-sequence mask,
    so an out-of-range index masks nothing (prediction == ground truth).
    """
    seq_mask = get_seq_mask(batch["length"], schema.max_length)
    if task == "elem":
        from .models.masking import select_single_element

        masks = get_initial_masks(schema, seq_mask)
        if element is not None:
            sel = jax.nn.one_hot(
                element, schema.max_length, dtype=jnp.int32
            ).astype(bool) & seq_mask
        else:
            if key is None:
                key = jax.random.PRNGKey(0)
            sel = select_single_element(seq_mask, key)
        for c in schema.modeled:
            if c.is_sequence:
                masks[c.name] = sel
        return masks
    return _group_masks(schema, batch, schema.attribute_groups[task])


def masked_input_view(schema, batch, masks) -> Dict[str, jnp.ndarray]:
    """The model's-eye view of the document (for the middle column)."""
    seq_mask = get_seq_mask(batch["length"], schema.max_length)
    filtered = filter_padding(batch, schema, seq_mask)
    out = dict(batch)
    for c in schema.modeled:
        if c.is_sequence:
            out[c.name] = apply_token(filtered[c.name], c, masks[c.name], "masked")
    return out


def run_demo(
    job_dir: str,
    task: str = "pos",
    num_examples: int = 4,
    num_iter: int = 1,
    out_path: str = "demo.html",
    checkpoint: str = "best",
    split: str = "test",
    data_dir_override: Optional[str] = None,
    timings: Optional[Dict[str, float]] = None,
    element: Optional[int] = None,
) -> str:
    """Render GT / masked-input / prediction rows to ``out_path``.

    ``timings``: pass a dict to receive a per-stage wall-time breakdown
    (seconds) — used by ``tools/profile_demo.py`` so the measured path IS
    the production path.

    ``element`` (elem task only): pin which element index is masked in
    every rendered example instead of the default random draw."""
    import time as _time

    t0 = _time.perf_counter()

    def _tick(stage):
        nonlocal t0
        now = _time.perf_counter()
        if timings is not None:
            timings[stage] = round(now - t0, 3)
        t0 = now

    from .utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    lm_timings = {} if timings is not None else None
    model, params, spec = load_model(
        job_dir, checkpoint, batch_size=num_examples, timings=lm_timings
    )
    if timings is not None:
        for k, v in lm_timings.items():
            timings[f"load_model.{k}"] = v
    if data_dir_override:
        spec = DatasetSpec(spec.name, data_dir_override, num_examples)
    schema = spec.schema
    _tick("load_model")

    host = next(iter(spec.make_dataset(split, batch_size=num_examples)))
    _tick("load_batch")

    task_id = None
    if getattr(model, "context", None) == "id":
        # Condition the task embedding on the demoed task
        # (reference eval.py:99-101; notebooks pass demo_args["tasks"]).
        from .evaluation.harness import task_id_for_mode

        task_id = task_id_for_mode(schema, task)

    # ONE jitted program covers all device work (mask build + masked view +
    # forward): eagerly this path paid hundreds of ~35 ms relay round-trips
    # plus per-op remote compiles (191 s cold, r5 measurement).  Inputs and
    # outputs ride the packed float32 transport — one upload, one fetch —
    # because ~45 per-column transfers at ~35 ms each would cost ~1.6 s on
    # their own (flexdm_tpu/transport.py).
    from . import transport

    numeric = {k: np.asarray(v) for k, v in split_device_batch(host).items()}
    in_spec = transport.batch_spec(numeric)

    if element is not None and task != "elem":
        raise ValueError(
            f"element= is only valid for task='elem', got {task!r}"
        )

    def _forward(params, flat, mask_key):
        batch = transport.unpack_in_jit(flat, in_spec)
        elem_idx = None
        if element is not None:
            elem_idx = jnp.full(
                (batch["length"].shape[0],), element, dtype=jnp.int32
            )
        masks = build_task_masks(
            schema, batch, task, key=mask_key, element=elem_idx
        )
        view = masked_input_view(schema, batch, masks)
        tasks = None
        if task_id is not None:
            tasks = jnp.full(
                (batch["length"].shape[0],), task_id, dtype=jnp.int32
            )
        pred = forward_eval(
            model, params, batch, masks, tasks=tasks, num_iter=num_iter
        )
        merged = {f"view.{k}": v for k, v in view.items()}
        merged.update({f"pred.{k}": v for k, v in pred.items()})
        return merged

    flat_in = transport.pack(numeric, in_spec)
    out_spec = transport.eval_spec(
        _forward, params, jax.ShapeDtypeStruct(flat_in.shape, jnp.float32),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
    )

    def _step(params, flat, mask_key):
        return transport.pack_in_jit(_forward(params, flat, mask_key), out_spec)

    flat_out = jax.jit(_step)(
        params, jnp.asarray(flat_in), jax.random.PRNGKey(0)
    )
    # Barrier with a value fetch: on this platform block_until_ready can
    # return before the device finishes (CLAUDE.md benchmarking note), and
    # the per-stage timings below must not absorb device time.
    merged = transport.unpack(np.asarray(jax.device_get(flat_out)), out_spec)
    view = {k[len("view."):]: v for k, v in merged.items()
            if k.startswith("view.")}
    pred = {k[len("pred."):]: v for k, v in merged.items()
            if k.startswith("pred.")}
    _tick("forward_eval")

    from .helpers.svg import load_fonts_css

    builder = SVGBuilder(
        key="type",
        vocab=spec.vocabs["type"].tokens if "type" in spec.vocabs else None,
        max_width=180,
        max_height=180,
        render_text=True,
        # The crello release ships fonts.css (@font-face links); when
        # present in the data dir every rendered SVG embeds the real fonts
        # (reference svg_crello.py:130-147).
        fonts_css=load_fonts_css(spec.path) if spec.path else None,
    )
    gt_items = spec.unbatch(host)
    in_items = spec.unbatch(view)
    pred_items = spec.unbatch(pred)
    _tick("unbatch")

    rows = []
    for gt, inp, pr in zip(gt_items, in_items, pred_items):
        cells = "".join(
            f"<td>{builder(doc)}</td>" for doc in (gt, inp, pr)
        )
        rows.append(f"<tr>{cells}</tr>")
    page = (
        "<html><head><meta charset='utf-8'><title>flexdm demo</title></head>"
        f"<body><h2>task: {html.escape(task)}</h2>"
        "<table border=1 cellpadding=4><tr><th>ground truth</th>"
        "<th>masked input</th><th>prediction</th></tr>"
        + "".join(rows)
        + "</table></body></html>"
    )
    with open(out_path, "w") as f:
        f.write(page)
    _tick("svg_html")
    return out_path


def main(argv=None):
    parser = argparse.ArgumentParser(description="Render demo predictions")
    parser.add_argument("--job-dir", dest="job_dir", required=True)
    parser.add_argument("--task", default="pos",
                        help="elem | type | pos | attr | img | txt")
    parser.add_argument("--num-examples", type=int, default=4)
    parser.add_argument("--num-iter", type=int, default=1)
    parser.add_argument("--out", default="demo.html")
    parser.add_argument("--checkpoint", default="best")
    parser.add_argument("--split", default="test")
    parser.add_argument("--element", type=int, default=None,
                        help="elem task: pin the masked element index "
                             "(default: random per example)")
    args = parser.parse_args(argv)
    path = run_demo(
        args.job_dir, args.task, args.num_examples, args.num_iter,
        args.out, args.checkpoint, args.split, element=args.element,
    )
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
