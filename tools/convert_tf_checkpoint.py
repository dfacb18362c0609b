"""Convert a reference (TF/keras) MFP checkpoint into flexdm_tpu params.

The reference ships pretrained TF checkpoints (reference README.md:26-27);
loading them enables bit-parity evaluation against published scores.  Keras
tracks variables through attribute paths, so the checkpoint keys look like::

    model/encoder/input_layer/type/embeddings
    model/blocks/seq2seq/seq2seq_0/attn/dense_query/kernel
    model/decoder/decoders/left/kernel ...

This tool maps those onto the flexdm_tpu parameter tree:

    params/encoder/input_type                  (embedding table; ours has the
                                                same [vocab+2, D] layout)
    params/blocks/seq2seq_0/attn/query/{kernel,bias}
    params/decoder/decoder_left/{kernel,bias}

plus LayerNorm gamma/beta -> scale/bias.  Works from either a live TF
checkpoint (requires tensorflow at conversion time only) or an .npz export
of ``{name: array}``.

Usage:
    python tools/convert_tf_checkpoint.py --checkpoint best.ckpt \
        --dataset crello --data_dir /data/crello --out converted/
    # then: --weights converted/   (or evaluation --checkpoint)
"""

from __future__ import annotations

# Repo-root bootstrap so `python tools/convert_tf_checkpoint.py` works without pip install.
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
import re
from typing import Dict, Optional

import numpy as np

# (regex over the TF variable path) -> flax param path builder.
_RULES = [
    # encoder embeddings / dense inputs; keras tracks the reference's
    # ``self.input_layer[key]`` dict as ``input_layer/<key>/...``
    (r".*encoder.*/input_layer/(?P<key>\w+?)_special/embeddings",
     lambda m: ("encoder", f"input_{m['key']}_special")),
    (r".*encoder.*/input_layer/(?P<key>\w+)/embeddings",
     lambda m: ("encoder", f"input_{m['key']}")),
    (r".*encoder.*/input_layer/(?P<key>\w+)/(?P<leaf>kernel|bias)",
     lambda m: ("encoder", f"input_{m['key']}", m["leaf"])),
    # transformer blocks
    (r".*seq2seq_(?P<i>\d+)/attn/dense_(?P<proj>query|key|value)/(?P<leaf>kernel|bias)",
     lambda m: ("blocks", f"seq2seq_{m['i']}", "attn", m["proj"], m["leaf"])),
    (r".*seq2seq_(?P<i>\d+)/attn/combine_heads/(?P<leaf>kernel|bias)",
     lambda m: ("blocks", f"seq2seq_{m['i']}", "attn", "out", m["leaf"])),
    # keras tracks Sequential children as ``layer_with_weights-N`` in saved
    # checkpoints (and ``layers/N`` when addressed through the layers list).
    (r".*seq2seq_(?P<i>\d+)/mlp/(layers/|layer_with_weights-)(?P<n>[01])/?(?P<leaf>kernel|bias)",
     lambda m: ("blocks", f"seq2seq_{m['i']}", f"mlp_{m['n']}", m["leaf"])),
    (r".*seq2seq_(?P<i>\d+)/norm(?P<n>\d)/gamma",
     lambda m: ("blocks", f"seq2seq_{m['i']}", f"norm{m['n']}", "scale")),
    (r".*seq2seq_(?P<i>\d+)/norm(?P<n>\d)/beta",
     lambda m: ("blocks", f"seq2seq_{m['i']}", f"norm{m['n']}", "bias")),
    # decoder heads (keras tracks ``self.decoders[key]`` as decoders/<key>)
    (r".*decoder.*/decoders/(?P<key>\w+)/(?P<leaf>kernel|bias)",
     lambda m: ("decoder", f"decoder_{m['key']}", m["leaf"])),
]


def map_variable(tf_path: str) -> Optional[tuple]:
    """TF variable path -> flax param path tuple (under 'params')."""
    path = tf_path.replace(".ATTRIBUTES/VARIABLE_VALUE", "").strip("/")
    for pattern, builder in _RULES:
        m = re.match(pattern, path)
        if m:
            out = builder(m)
            # embedding tables have no kernel/bias leaf -> 'embedding' slot
            if len(out) == 2:
                return out + ("embedding",)
            return out
    return None


def load_tf_variables(checkpoint_path: str) -> Dict[str, np.ndarray]:
    """Read all variables from a TF checkpoint (TF required here only)."""
    import tensorflow as tf  # local import; conversion-time dependency

    reader = tf.train.load_checkpoint(checkpoint_path)
    out = {}
    for key in reader.get_variable_to_shape_map():
        out[key] = reader.get_tensor(key)
    return out


def convert(
    variables: Dict[str, np.ndarray],
    template_params,
) -> tuple:
    """Place TF variables into a copy of ``template_params``.

    Returns (new_params, report) where the report lists unmatched TF
    variables and unfilled template leaves (shape mismatches are errors).
    """
    import jax

    flat, treedef = jax.tree_util.tree_flatten_with_path(template_params)
    index = {}
    for path, leaf in flat:
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        index[keys[1:]] = (keys, leaf)  # drop the leading 'params'

    filled = {}
    unmatched = []
    for tf_path, value in variables.items():
        if "optimizer" in tf_path or "save_counter" in tf_path:
            continue
        target = map_variable(tf_path)
        if target is None:
            unmatched.append(tf_path)
            continue
        if target[-1] == "embedding":
            target = target[:-1]
        # template leaves for embeddings are the bare table under the name
        cand = index.get(target) or index.get(target[:-1])
        if cand is None:
            unmatched.append(tf_path)
            continue
        keys, leaf = cand
        if tuple(leaf.shape) != tuple(value.shape):
            raise ValueError(
                f"{tf_path}: shape {value.shape} != template {leaf.shape}"
            )
        filled[keys] = np.asarray(value, dtype=np.float32)

    missing = []
    new_leaves = []
    for path, leaf in flat:
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        if keys in filled:
            new_leaves.append(filled[keys])
        else:
            missing.append("/".join(keys))
            new_leaves.append(leaf)
    new_params = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return new_params, {"unmatched_tf": unmatched, "unfilled": missing}


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--checkpoint", required=True,
                        help="TF checkpoint prefix or .npz export")
    parser.add_argument("--dataset", required=True, choices=["crello", "rico"])
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--latent_dim", type=int, default=256)
    parser.add_argument("--num_blocks", type=int, default=4)
    args = parser.parse_args(argv)

    from flexdm_tpu.data import DatasetSpec, split_device_batch
    from flexdm_tpu.models import MFPModel
    from flexdm_tpu.train import init_params, save_checkpoint

    spec = DatasetSpec(args.dataset, args.data_dir, batch_size=2)
    model = MFPModel(
        spec.schema, latent_dim=args.latent_dim, num_blocks=args.num_blocks
    )
    sample = split_device_batch(next(iter(spec.make_dataset("test", batch_size=2))))
    template = init_params(model, sample, seed=0)

    if args.checkpoint.endswith(".npz"):
        variables = dict(np.load(args.checkpoint, allow_pickle=False))
    else:
        variables = load_tf_variables(args.checkpoint)

    params, report = convert(variables, template)
    save_checkpoint(args.out, params)
    print(f"wrote {args.out}")
    if report["unmatched_tf"]:
        print(f"unmatched TF variables ({len(report['unmatched_tf'])}):")
        for p in report["unmatched_tf"][:20]:
            print("  ", p)
    if report["unfilled"]:
        print(f"unfilled template leaves ({len(report['unfilled'])}):")
        for p in report["unfilled"][:20]:
            print("  ", p)


if __name__ == "__main__":
    main()
