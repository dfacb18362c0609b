"""Release-scale capstone: the full north-star recipe chain at 20k docs.

Round-5 verdict #1: the scale drill proved 3 epochs; this proves a
*complete* recipe at release scale.  It runs the reference's published
crello recipe chain (README.md:38-41, train.py:79-97) on a 20k-template
corpus:

    Ours-IMP     masking_method=random,                500 epochs
    Ours-EXP     masking_method=elem_pos_attr_img_txt, 500 epochs
    Ours-EXP-FT  = EXP warm-started from IMP's best checkpoint (--weights)

each with validation every 10 epochs and best-by-val checkpointing, then
evaluates EVERY task mode on the test split (random, elem, pos/attr/img/
txt, and elem with MaskGIT --num_iter), and writes the per-field score
table as the release-scale regression anchor (BASELINE_ANCHOR_V2.json)
with wall times.

Stages are resumable: a job dir whose `checkpoints/final` exists is
skipped (delete the dir to re-train); an interrupted training run can be
continued by re-invoking with --resume (threads TrainConfig.resume).

Usage:
  python tools/capstone.py [--docs 20000] [--epochs 500] [--root DIR]
                           [--out BASELINE_ANCHOR_V2.json] [--resume]
                           [--models imp,exp,exp_ft] [--skip-eval]
"""

if __package__ in (None, ""):
    import os as _os
    import sys as _sys

    _repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    if _repo not in _sys.path:
        _sys.path.insert(0, _repo)

import argparse
import json
import logging
import os
import time

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("capstone")

RECIPES = {
    "imp": {"masking_method": "random"},
    "exp": {"masking_method": "elem_pos_attr_img_txt"},
    "exp_ft": {"masking_method": "elem_pos_attr_img_txt",
               "weights_from": "imp"},
}


def ensure_corpus(root: str, docs: int) -> str:
    """Build (once) the 20k-doc corpus via the L0 offline builder."""
    data_dir = os.path.join(root, "data")
    if os.path.exists(os.path.join(data_dir, "count.json")):
        logger.info("corpus already built at %s", data_dir)
        return data_dir
    from tools.build_crello_dataset import main as build_main
    from tools.scale_drill import make_raw_dump

    raw = os.path.join(root, "dump.jsonl")
    t0 = time.time()
    make_raw_dump(raw, docs)
    build_main(["--input", raw, "--out", data_dir, "--shards", "8",
                "--val-frac", "0.05", "--test-frac", "0.05"])
    logger.info("corpus built in %.1fs", time.time() - t0)
    return data_dir


def train_stage(name: str, data_dir: str, root: str, epochs: int,
                resume: bool, weights: str = None,
                batch_size: int = 256) -> dict:
    from flexdm_tpu.train.trainer import TrainConfig, train

    job_dir = os.path.join(root, f"job_{name}")
    row = {"job_dir": job_dir}
    if os.path.isdir(os.path.join(job_dir, "checkpoints", "final")):
        logger.info("[%s] already trained (checkpoints/final exists)", name)
        row["skipped"] = True
        return row
    config = TrainConfig(
        dataset_name="crello", data_dir=data_dir, job_dir=job_dir,
        latent_dim=256, num_blocks=4, block_type="deepsvg",
        batch_size=batch_size, num_epochs=epochs, learning_rate=1e-4,
        l2=1e-2, dropout=0.1, validation_freq=10, seed=0,
        masking_method=RECIPES[name]["masking_method"],
        weights=weights, resume=resume, input_mode="device",
    )
    t0 = time.time()
    out = train(config)
    row["train_wall_sec"] = round(time.time() - t0, 1)
    hist = out["history"]
    row["epochs_run"] = len(hist)
    row["loss_first"] = round(hist[0]["loss"], 3)
    row["loss_last"] = round(hist[-1]["loss"], 3)
    row["best_val_total_score"] = round(out["best_val_total_score"], 5)
    row["stopped_on_nan"] = out["stopped_on_nan"]
    row["n_validations"] = sum(1 for h in hist if "val_total_score" in h)
    row["n_best_saves"] = sum(1 for h in hist if h.get("checkpointed"))
    row["test_total_score"] = round(
        out["test_metrics"].get("total_score", float("nan")), 5
    )
    if len(hist) >= 3:
        import statistics

        deltas = [hist[i]["wall_time"] - hist[i - 1]["wall_time"]
                  for i in range(1, len(hist)) if "val_total_score"
                  not in hist[i] and "val_total_score" not in hist[i - 1]]
        if deltas:
            row["steady_epoch_sec"] = round(statistics.median(deltas), 3)
    return row


def eval_stage(name: str, data_dir: str, root: str, num_iter: int,
               batch_size: int = 256) -> dict:
    """All task modes on the test split, via the public eval CLI entry."""
    from flexdm_tpu.evaluation.harness import main as eval_main

    job_dir = os.path.join(root, f"job_{name}")
    scores = {}
    t0 = time.time()
    base = ["--job-dir", job_dir, "--data_dir", data_dir,
            "--batch_size", str(batch_size)]
    scores["random"] = eval_main(base + ["--task_mode", "random"])
    scores["elem"] = eval_main(base + ["--task_mode", "elem"])
    for grp in ("pos", "attr", "img", "txt"):
        scores[grp] = eval_main(base + ["--task_mode", grp])
    scores[f"elem_maskgit{num_iter}"] = eval_main(
        base + ["--task_mode", "elem", "--num_iter", str(num_iter)]
    )
    scores["_eval_wall_sec"] = round(time.time() - t0, 1)
    return scores


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--docs", type=int, default=20000)
    parser.add_argument("--epochs", type=int, default=500)
    parser.add_argument("--num_iter", type=int, default=4)
    parser.add_argument("--batch_size", type=int, default=256)
    parser.add_argument("--root", default="/tmp/flexdm_capstone")
    parser.add_argument("--out", default=None,
                        help="anchor JSON path (default <repo>/BASELINE_ANCHOR_V2.json)")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--models", default="imp,exp,exp_ft")
    parser.add_argument("--skip-eval", action="store_true")
    args = parser.parse_args(argv)

    from flexdm_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    os.makedirs(args.root, exist_ok=True)
    data_dir = ensure_corpus(args.root, args.docs)

    result = {
        "_meta": {
            "corpus": f"synthetic crello raw dump, {args.docs} docs, "
                      "offline-built (tools/build_crello_dataset.py), "
                      "90/5/5 split",
            "config": "flagship: latent 256, 4 deepsvg blocks, B=256, "
                      f"{args.epochs} epochs, Adam 1e-4 clipnorm 1.0, "
                      "l2 1e-2, dropout 0.1, seed 0, val every 10, "
                      "best-by-val",
            "recipes": "IMP=random; EXP=elem_pos_attr_img_txt; "
                       "EXP-FT=EXP warm-started from IMP best "
                       "(reference README.md:38-41)",
            "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
    }
    models = [m.strip() for m in args.models.split(",") if m.strip()]
    for name in models:
        weights = None
        if RECIPES[name].get("weights_from"):
            src = os.path.join(
                args.root, f"job_{RECIPES[name]['weights_from']}",
                "checkpoints", "best",
            )
            assert os.path.isdir(src), f"{name} needs {src}; train imp first"
            weights = src
        logger.info("=== training %s ===", name)
        row = train_stage(name, data_dir, args.root, args.epochs,
                          args.resume, weights, args.batch_size)
        result[name] = {"train": row}
        _flush(result, args)

    if not args.skip_eval:
        for name in models:
            logger.info("=== evaluating %s ===", name)
            result[name]["eval"] = eval_stage(
                name, data_dir, args.root, args.num_iter, args.batch_size
            )
            _flush(result, args)

    print(json.dumps(result, indent=2))
    return result


def _flush(result, args):
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BASELINE_ANCHOR_V2.json",
    )
    with open(out, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
