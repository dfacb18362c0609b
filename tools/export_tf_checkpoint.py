"""Export flexdm_tpu params as a reference (TF/keras) checkpoint.

The inverse of ``convert_tf_checkpoint.py``: it takes our flax parameter
tree and a TEMPLATE reference checkpoint (any ``save_weights`` artifact of
the target keras architecture — e.g. a released ``best.ckpt``, or one
written by a freshly-initialized reference model) and writes a new V2
checkpoint whose mapped variables carry our values while every
bookkeeping entry (keras object graph, ``save_counter``) is copied from
the template.  The result loads directly with the reference's own
``model.load_weights`` (reference eval.py:169-172), so models trained
here can be evaluated, served or fine-tuned by the original TF stack —
migration works in both directions.

The variable-path mapping is the same ``_RULES`` table the forward
converter uses, applied in reverse; the tool fails loudly if any of our
parameters has no destination in the template (and reports template
variables it left untouched).

Usage:
    python tools/export_tf_checkpoint.py \
        --checkpoint runs/job/checkpoints/best --template ref/best.ckpt \
        --dataset crello --data_dir /data/crello --out exported/best.ckpt
"""

from __future__ import annotations

# Repo-root bootstrap so `python tools/export_tf_checkpoint.py` works without pip install.
if __package__ in (None, ""):
    # Inline (not `import _bootstrap`): the bare-name import relies on the
    # interpreter prepending the script dir to sys.path, which -P /
    # PYTHONSAFEPATH disable and a stray _bootstrap.py could shadow.
    import os as _os
    import sys as _sys

    _repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    if _repo not in _sys.path:
        _sys.path.insert(0, _repo)
else:
    from . import _bootstrap  # noqa: F401

import argparse
from typing import Dict, Tuple

import numpy as np

from tools.convert_tf_checkpoint import map_variable


def export(
    template_variables: Dict[str, np.ndarray],
    template_dtypes: Dict,
    params,
) -> Tuple[Dict[str, np.ndarray], Dict]:
    """Rewrite a template checkpoint's tensors with ``params``' values.

    Returns (tensors, report): ``tensors`` maps every checkpoint key to the
    value to write (ours where the key maps to a parameter, the template's
    otherwise); the report lists our leaves that found no destination
    (``unexported`` — must be empty for a faithful export), template
    variables kept verbatim (``kept``; keras bookkeeping plus optimizer
    slots when the template came from a training run), and template MODEL
    variables we could not fill (``unfilled`` — must be empty, else the
    output would mix template and exported weights).
    """
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    index = {}
    for path, leaf in flat:
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        index[keys[1:]] = (keys, np.asarray(leaf, np.float32))

    tensors: Dict[str, np.ndarray] = {}
    used = set()
    kept = []
    unfilled = []
    for key, value in template_variables.items():
        target = None
        is_model_var = (
            key.endswith(".ATTRIBUTES/VARIABLE_VALUE")
            and "optimizer" not in key
            and "save_counter" not in key
        )
        if is_model_var:
            target = map_variable(key)
            if target is None:
                # A weight the mapping rules don't even recognize (layer the
                # template variant added/renamed) — same mixed-weights risk
                # as a mapped-but-absent one.
                unfilled.append(key)
        if target is not None:
            if target[-1] == "embedding":
                target = target[:-1]
            cand = index.get(target) or index.get(target[:-1])
            if cand is not None:
                keys, arr = cand
                if tuple(arr.shape) != tuple(np.shape(value)):
                    raise ValueError(
                        f"{key}: template shape {np.shape(value)} != "
                        f"params {arr.shape}"
                    )
                tensors[key] = arr
                used.add(keys)
                continue
            # A MODEL variable of the template with no counterpart in our
            # tree (e.g. the template has more blocks, or context heads we
            # lack): keeping the template's trained weights would write a
            # silent frankenstein that loads cleanly and evaluates wrong.
            unfilled.append(key)
        kept.append(key)
        tensors[key] = value

    unexported = [
        "/".join(keys) for keys, _ in index.values() if keys not in used
    ]
    del template_dtypes  # consumed by write_v2_checkpoint, kept for symmetry
    return tensors, {
        "unexported": unexported, "kept": kept, "unfilled": unfilled
    }


def write_v2_checkpoint(
    prefix: str, tensors: Dict[str, np.ndarray], dtypes: Dict
) -> None:
    """Write a TF V2 checkpoint (``<prefix>.index`` + data shard) with the
    given key -> tensor map, preserving each key's template dtype (the
    object-graph entry is a serialized string tensor)."""
    import tensorflow as tf  # export-time dependency only

    names = list(tensors)
    tf.raw_ops.SaveV2(
        prefix=prefix,
        tensor_names=names,
        shape_and_slices=[""] * len(names),
        tensors=[
            tf.constant(tensors[n], dtype=dtypes.get(n)) for n in names
        ],
    )


def load_template(checkpoint_path: str) -> Tuple[Dict, Dict]:
    """All (values, dtypes) of a TF checkpoint, bookkeeping included."""
    import tensorflow as tf

    reader = tf.train.load_checkpoint(checkpoint_path)
    dtypes = reader.get_variable_to_dtype_map()
    values = {k: reader.get_tensor(k) for k in dtypes}
    return values, dtypes


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--checkpoint", required=True,
                        help="our orbax checkpoint directory")
    parser.add_argument("--template", required=True,
                        help="reference save_weights checkpoint prefix of "
                             "the SAME architecture")
    parser.add_argument("--dataset", required=True,
                        choices=["crello", "rico"])
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--out", required=True,
                        help="output checkpoint prefix")
    parser.add_argument("--latent_dim", type=int, default=256)
    parser.add_argument("--num_blocks", type=int, default=4)
    parser.add_argument("--context", default=None)
    args = parser.parse_args(argv)

    from flexdm_tpu.data import DatasetSpec, split_device_batch
    from flexdm_tpu.models import MFPModel
    from flexdm_tpu.train import init_params, load_checkpoint

    spec = DatasetSpec(args.dataset, args.data_dir, batch_size=2)
    model = MFPModel(
        spec.schema, latent_dim=args.latent_dim,
        num_blocks=args.num_blocks, context=args.context,
    )
    sample = split_device_batch(
        next(iter(spec.make_dataset("test", batch_size=2)))
    )
    template_params = init_params(model, sample, seed=0, abstract=True)
    params = load_checkpoint(args.checkpoint, template_params)

    values, dtypes = load_template(args.template)
    tensors, report = export(values, dtypes, params)
    if report["unexported"]:
        raise SystemExit(
            "refusing to write a partial export; unexported parameters:\n  "
            + "\n  ".join(report["unexported"])
        )
    if report["unfilled"]:
        raise SystemExit(
            "refusing to write a mixed-weights export; template MODEL "
            "variables with no counterpart in our params (architecture "
            "mismatch?):\n  " + "\n  ".join(report["unfilled"])
        )
    write_v2_checkpoint(args.out, tensors, dtypes)
    print(f"wrote {args.out} ({len(tensors)} entries, "
          f"{len(report['kept'])} kept from template)")


if __name__ == "__main__":
    main()
