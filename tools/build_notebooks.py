"""Generate the demo notebooks (single source of truth).

Mirrors the reference walkthroughs (`/root/reference/notebooks/
demo_crello.ipynb`, 16 cells; `demo_rico.ipynb`, 14 cells): editable
parameters, initialization, dataset/model loading, hand-built per-task
masks from ``get_initial_masks`` + the attribute groups, side-by-side
GT/input/prediction SVG grids rendered inline, MaskGIT iterative decoding,
and the retrieval demo.  Unlike the reference, the notebooks bootstrap a
toy model on synthetic data when no trained job is available, so they
execute headlessly (tests/test_notebooks.py keeps them from rotting).

Run: python tools/build_notebooks.py
"""


# Repo-root bootstrap so `python tools/build_notebooks.py` works without pip install.
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
import os

import nbformat

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _nb(cells):
    nb = nbformat.v4.new_notebook()
    nb.metadata["kernelspec"] = {
        "display_name": "Python 3", "language": "python", "name": "python3",
    }
    out = []
    for kind, src in cells:
        if kind == "md":
            out.append(nbformat.v4.new_markdown_cell(src))
        else:
            out.append(nbformat.v4.new_code_cell(src))
    nb["cells"] = out
    return nb


GRID_HELPER = '''\
def show_grid(column_names, *item_lists):
    """Render documents side by side, one row per sample (HTML inline)."""
    print("From left to right: " + ", ".join(column_names))
    for docs in zip(*item_lists):
        display(HTML("<div>%s</div>" % " ".join(docs)))'''


CRELLO_CELLS = [
    ("md", "# Crello analysis\n"
     "Qualitative analysis of learned models on the crello dataset — the "
     "flexdm_tpu counterpart of the reference `notebooks/demo_crello.ipynb` "
     "walkthrough: per-task masked-field prediction (`elem`, `pos`, `attr`, "
     "`img`, `txt`) with hand-built masks, rendered as side-by-side SVG "
     "grids, plus MaskGIT iterative decoding and asset retrieval."),
    ("md", "##### Editable parameters\n"
     "Point `JOB_DIR`/`DATA_DIR` at a real training run and data release. "
     "With the defaults, the next section bootstraps a toy model on "
     "synthetic data so every cell below runs end-to-end."),
    ("code", '''\
import os

JOB_DIR = os.environ.get("FLEXDM_JOB_DIR", "/tmp/flexdm_demo_crello/job")
DATA_DIR = os.environ.get("FLEXDM_DATA_DIR", "/tmp/flexdm_demo_crello/data")
batch_size = 4
target_task = "pos"  # choose from: elem, pos, attr, txt, img'''),
    ("md", "##### Initialization"),
    ("code", '''\
import flexdm_tpu  # honors FLEXDM_PLATFORM before JAX backend init
import jax
import jax.numpy as jnp
import numpy as np
from IPython.display import HTML, display

from flexdm_tpu.data import DatasetSpec, split_device_batch, synthetic
from flexdm_tpu.demo import load_model, masked_input_view
from flexdm_tpu.helpers import SVGBuilder
from flexdm_tpu.models import forward_eval
from flexdm_tpu.models.masking import get_initial_masks, get_seq_mask'''),
    ("md", "##### Bootstrap (synthetic toy run when no trained job exists)\n"
     "Skipped entirely when `JOB_DIR` already holds a trained job "
     "(`args.json` + checkpoints)."),
    ("code", '''\
if not os.path.exists(os.path.join(JOB_DIR, "args.json")):
    from flexdm_tpu.train.trainer import TrainConfig, train

    synthetic.generate("crello", DATA_DIR, 48, 8, 8, seed=0)
    train(TrainConfig(
        dataset_name="crello", data_dir=DATA_DIR, job_dir=JOB_DIR,
        latent_dim=32, num_blocks=1, num_heads=4, batch_size=8,
        num_epochs=2, validation_freq=1, attention_impl="xla",
    ))'''),
    ("md", "##### Load dataset and pre-trained model"),
    ("code", '''\
model, params, dataspec = load_model(JOB_DIR, batch_size=batch_size)
schema = dataspec.schema
example_host = next(iter(dataspec.make_dataset("test", batch_size=batch_size)))
example = {k: jnp.asarray(v) for k, v in split_device_batch(example_host).items()}'''),
    ("md", "##### Build visualizers\n"
     "`layout` colors elements by type; `visual` additionally renders text "
     "(and, with the retrieval stores below, real images/texts)."),
    ("code", '''\
type_vocab = dataspec.vocabs["type"].tokens if "type" in dataspec.vocabs else None
builders = {
    "layout": SVGBuilder(key="type", vocab=type_vocab,
                         max_width=128, max_height=192),
    "visual": SVGBuilder(key="type", vocab=type_vocab, render_text=True,
                         max_width=128, max_height=192),
}'''),
    ("md", "##### Build per-task masks by hand\n"
     "Masks start from `get_initial_masks` (all-False element masks). For a "
     "group task every field in the attribute group is masked across the "
     "whole sequence; for `elem` every field of one chosen element is "
     "masked (the reference hides element 0)."),
    ("code", '''\
seq_mask = get_seq_mask(example["length"], schema.max_length)
mfp_masks = get_initial_masks(schema, seq_mask)
attr_groups = schema.attribute_groups

for key in list(mfp_masks):
    if not schema[key].is_sequence:
        continue
    if target_task == "elem":
        mask = np.asarray(mfp_masks[key]).copy()
        mask[:, 0] = True  # hide the first element of every sample
        mfp_masks[key] = jnp.asarray(mask)
    elif key != "type" and key in attr_groups[target_task]:
        mfp_masks[key] = seq_mask

{k: np.asarray(v).sum() for k, v in mfp_masks.items()}'''),
    ("md", "##### Demo\n"
     "Run the model with the hand-built masks and render ground truth, the "
     "model's-eye masked input, and the prediction side by side.  Unmasked "
     "fields pass through from the input "
     "(`merge_inputs_and_prediction`), so only masked fields change."),
    ("code", '''\
pred = forward_eval(model, params, example, mfp_masks)
pred = {**{k: v for k, v in example.items() if k not in pred}, **pred}

gt_items = dataspec.unbatch(example_host)
input_items = dataspec.unbatch(
    {k: jax.device_get(v)
     for k, v in masked_input_view(schema, example, mfp_masks).items()})
pred_items = dataspec.unbatch({k: jax.device_get(v) for k, v in pred.items()})

show_cols = ["gt-layout", "gt-visual", "input", "pred"]
show_grid(
    show_cols,
    [builders["layout"](x) for x in gt_items],
    [builders["visual"](x) for x in gt_items],
    [builders["visual"](x) for x in input_items],
    [builders["visual"](x) for x in pred_items],
)''' .replace("show_grid(", GRID_HELPER + "\n\nshow_grid(", 1)),
    ("md", "##### MaskGIT iterative decoding\n"
     "`num_iter > 1` re-masks low-confidence fields and decodes in rounds "
     "(reference `mfp.py:141-207`)."),
    ("code", '''\
pred_it = forward_eval(model, params, example, mfp_masks, num_iter=4)
pred_it = {**{k: v for k, v in example.items() if k not in pred_it}, **pred_it}
pred_it_items = dataspec.unbatch(
    {k: jax.device_get(v) for k, v in pred_it.items()})
show_grid(
    ["pred (1 iter)", "pred (4 iters)"],
    [builders["visual"](x) for x in pred_items],
    [builders["visual"](x) for x in pred_it_items],
)'''),
    ("md", "##### Image/text retrieval\n"
     "With the `crello-images` / `crello-texts` stores from the data "
     "release, predicted 512-d embeddings map back to real assets "
     "(brute-force exact top-1 on device — no faiss dependency). Skipped "
     "when the stores are absent."),
    ("code", '''\
images_dir = os.path.join(os.path.dirname(DATA_DIR), "crello-images")
texts_dir = os.path.join(os.path.dirname(DATA_DIR), "crello-texts")
if os.path.exists(images_dir) and os.path.exists(texts_dir):
    from flexdm_tpu.helpers import ImageRetriever, TextRetriever

    image_db = ImageRetriever(images_dir, image_path=os.path.join(images_dir, "images"))
    image_db.build("test")
    text_db = TextRetriever(texts_dir, text_path=os.path.join(texts_dir, "texts"))
    text_db.build("test")
    visual_builder = SVGBuilder(
        key="type", vocab=type_vocab, render_text=True,
        image_db=image_db, text_db=text_db,
        max_width=128, max_height=192)
    show_grid(["pred with retrieved assets"],
              [visual_builder(x) for x in pred_items])
else:
    print("retrieval stores not found; skipping (see README for the release)")'''),
]


RICO_CELLS = [
    ("md", "# Rico analysis\n"
     "UI-layout (rico) counterpart of the reference "
     "`notebooks/demo_rico.ipynb`: single-element filling (ELEM) — mask "
     "every field of one element and let the model reconstruct it — plus "
     "the `pos` group task on sorted scoring's home dataset."),
    ("md", "##### Editable parameters"),
    ("code", '''\
import os

JOB_DIR = os.environ.get("FLEXDM_RICO_JOB_DIR", "/tmp/flexdm_demo_rico/job")
DATA_DIR = os.environ.get("FLEXDM_RICO_DATA_DIR", "/tmp/flexdm_demo_rico/data")
batch_size = 4'''),
    ("md", "##### Initialization"),
    ("code", '''\
import flexdm_tpu
import jax
import jax.numpy as jnp
import numpy as np
from IPython.display import HTML, display

from flexdm_tpu.data import DatasetSpec, split_device_batch, synthetic
from flexdm_tpu.demo import load_model, masked_input_view
from flexdm_tpu.helpers import SVGBuilder
from flexdm_tpu.models import forward_eval
from flexdm_tpu.models.masking import get_initial_masks, get_seq_mask'''),
    ("md", "##### Bootstrap (synthetic toy run when no trained job exists)"),
    ("code", '''\
if not os.path.exists(os.path.join(JOB_DIR, "args.json")):
    from flexdm_tpu.train.trainer import TrainConfig, train

    synthetic.generate("rico", DATA_DIR, 48, 8, 8, seed=1)
    train(TrainConfig(
        dataset_name="rico", data_dir=DATA_DIR, job_dir=JOB_DIR,
        latent_dim=32, num_blocks=1, num_heads=4, batch_size=8,
        num_epochs=2, validation_freq=1, attention_impl="xla",
    ))'''),
    ("md", "##### Load dataset and model"),
    ("code", '''\
model, params, dataspec = load_model(JOB_DIR, batch_size=batch_size)
schema = dataspec.schema
example_host = next(iter(dataspec.make_dataset("test", batch_size=batch_size)))
example = {k: jnp.asarray(v) for k, v in split_device_batch(example_host).items()}

type_vocab = dataspec.vocabs["type"].tokens if "type" in dataspec.vocabs else None
builder = SVGBuilder(key="type", vocab=type_vocab, max_width=108, max_height=192)'''),
    ("md", "##### ELEM: hand-built masks hiding one element\n"
     "All-False initial masks, then element 0 of every sample is masked in "
     "every field (mirrors the reference demo cell)."),
    ("code", '''\
seq_mask = get_seq_mask(example["length"], schema.max_length)
mfp_masks = get_initial_masks(schema, seq_mask)
for key in list(mfp_masks):
    if schema[key].is_sequence:
        mask = np.asarray(mfp_masks[key]).copy()
        mask[:, 0] = True
        mfp_masks[key] = jnp.asarray(mask)'''),
    ("md", "##### Demo: reconstruct the hidden element"),
    ("code", GRID_HELPER + '''


pred = forward_eval(model, params, example, mfp_masks)
pred = {**{k: v for k, v in example.items() if k not in pred}, **pred}

gt_items = dataspec.unbatch(example_host)
input_items = dataspec.unbatch(
    {k: jax.device_get(v)
     for k, v in masked_input_view(schema, example, mfp_masks).items()})
pred_items = dataspec.unbatch({k: jax.device_get(v) for k, v in pred.items()})
show_grid(
    ["gt", "input (element hidden)", "pred"],
    [builder(x) for x in gt_items],
    [builder(x) for x in input_items],
    [builder(x) for x in pred_items],
)'''),
    ("md", "##### POS: predict all element geometry\n"
     "rico's quantitative protocol scores `pos` on lexicographically sorted "
     "elements (reference `eval.py:104-106`); the demo just renders the "
     "reconstruction."),
    ("code", '''\
pos_masks = get_initial_masks(schema, seq_mask)
for key in schema.attribute_groups["pos"]:
    pos_masks[key] = seq_mask
pred_pos = forward_eval(model, params, example, pos_masks)
pred_pos = {**{k: v for k, v in example.items() if k not in pred_pos}, **pred_pos}
pred_pos_items = dataspec.unbatch(
    {k: jax.device_get(v) for k, v in pred_pos.items()})
show_grid(
    ["gt", "pred-layout"],
    [builder(x) for x in gt_items],
    [builder(x) for x in pred_pos_items],
)'''),
    ("md", "##### Quantitative check\n"
     "The same masks drive the eval harness; scores are exact dataset-level "
     "Σnum/Σden (see `python -m flexdm_tpu.evaluation --task_mode all_feat`)."),
    ("code", '''\
from flexdm_tpu.evaluation.harness import evaluate_task

scores = evaluate_task(
    model, params, dataspec.make_dataset("test", batch_size=batch_size),
    "pos", ("pos", schema.attribute_groups["pos"]))
scores'''),
]


def main():
    for name, cells in (
        ("demo_crello.ipynb", CRELLO_CELLS),
        ("demo_rico.ipynb", RICO_CELLS),
    ):
        path = os.path.join(HERE, "notebooks", name)
        nbformat.write(_nb(cells), path)
        print(f"wrote {path} ({len(cells)} cells)")


if __name__ == "__main__":
    main()
