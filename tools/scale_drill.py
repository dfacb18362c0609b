"""Release-scale end-to-end drill: raw JSONL -> build -> train -> eval -> demo.

VERDICT r3 #7: prove the data path at ~release scale (the crello release is
~23k templates), not just 2048-doc benches.  This generates a ~20k-template
raw JSONL dump, runs the offline builder (`tools/build_crello_dataset.py`),
measures first-epoch decode throughput (C++ full-record path), trains the
flagship device-resident, runs BOTH eval paths (resident scan and the
forced-streaming `RESIDENT_BYTE_LIMIT` branch), renders a demo HTML, and
prints one JSON row with wall times.

Usage: python tools/scale_drill.py [--docs 20000] [--epochs 3] [--out F]
"""

if __package__ in (None, ""):
    import os as _os
    import sys as _sys

    _repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    if _repo not in _sys.path:
        _sys.path.insert(0, _repo)

import argparse
import json
import os
import random
import tempfile
import time

FONTS = ["Roboto", "Lato", "Montserrat", "Oswald", "Raleway", "Merriweather"]
GROUPS = ["socialMedia", "blogging", "marketing", "adBanner"]
FORMATS = ["instagramPost", "facebookPost", "twitterPost", "mediumRectangle"]
WORDS = ("sale summer brand new launch deal flash event open join "
         "free taste shop local night live music art fest").split()


def _element(rng: random.Random, i: int, cw: int, ch: int):
    # Geometry is in PIXELS relative to the canvas, as in real crello raw
    # dumps — the offline builder normalizes by canvas size (norm(el.x, w)).
    t = rng.random()
    if i == 0 and t < 0.7:
        return {
            "type": "coloredBackground", "uuid": f"u{i}", "width": cw,
            "height": ch, "opacity": 1.0,
            "color": "#%06x" % rng.randrange(1 << 24),
            "position": {"x": 0, "y": 0},
        }
    common = {
        "uuid": f"u{i}",
        "width": round(rng.uniform(0.05, 0.9) * cw, 1),
        "height": round(rng.uniform(0.05, 0.9) * ch, 1),
        "opacity": round(rng.uniform(0.5, 1.0), 3),
        "left": round(rng.uniform(0.0, 0.8) * cw, 1),
        "top": round(rng.uniform(0.0, 0.8) * ch, 1),
    }
    if t < 0.35:
        return dict(common, type="textElement",
                    text=" ".join(rng.sample(WORDS, rng.randint(1, 5))),
                    font=rng.choice(FONTS),
                    color="#%06x" % rng.randrange(1 << 24))
    if t < 0.6:
        return dict(common, type="imageElement")
    if t < 0.8:
        return dict(common, type="svgElement", colors=[])
    return dict(common, type="maskElement")


def make_raw_dump(path: str, docs: int, seed: int = 0) -> None:
    rng = random.Random(seed)
    with open(path, "w") as f:
        for d in range(docs):
            n = rng.randint(1, 15)
            cw = rng.choice([1080, 1200, 800])
            ch = rng.choice([1080, 628, 600])
            tpl = {
                "id": f"tpl{d:06d}",
                "templateType": "regular",
                "width": cw,
                "height": ch,
                "group": rng.choice(GROUPS),
                "format": rng.choice(FORMATS),
                "template": [{"elements": [_element(rng, i, cw, ch)
                                           for i in range(n)]}],
            }
            f.write(json.dumps(tpl) + "\n")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--docs", type=int, default=20000)
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--latent-dim", type=int, default=256)
    parser.add_argument("--num-blocks", type=int, default=4)
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--root", default=None)
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)

    from flexdm_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    root = args.root or tempfile.mkdtemp(prefix="flexdm_scale_drill_")
    os.makedirs(root, exist_ok=True)
    row = {"docs": args.docs, "root": root}

    # 1. Raw dump -> offline builder (L0 ingestion).
    raw = os.path.join(root, "dump.jsonl")
    t0 = time.time()
    make_raw_dump(raw, args.docs)
    row["gen_raw_sec"] = round(time.time() - t0, 1)

    from tools.build_crello_dataset import main as build_main

    data_dir = os.path.join(root, "data")
    t0 = time.time()
    build_main(["--input", raw, "--out", data_dir, "--shards", "8",
                "--val-frac", "0.05", "--test-frac", "0.05"])
    row["build_sec"] = round(time.time() - t0, 1)

    # 2. First-epoch decode throughput (C++ full-record path, cold cache).
    from flexdm_tpu.data import DatasetSpec

    spec = DatasetSpec("crello", data_dir, batch_size=args.batch_size)
    loader = spec.make_dataset("train", batch_size=args.batch_size)
    t0 = time.time()
    nb = sum(1 for _ in loader)
    dt = time.time() - t0
    row["decode_docs_per_sec"] = round(loader.num_records / dt, 1)
    row["train_records"] = loader.num_records
    row["first_epoch_decode_sec"] = round(dt, 1)
    assert nb == len(loader)

    # Degenerate-data tripwire: a units mismatch between the raw dump and
    # the builder once collapsed every position into bucket 0, which makes
    # eval scores a vacuous 1.0.  Fail loudly instead.
    import numpy as np

    probe = next(iter(spec.make_dataset("train", batch_size=64)))
    for col in ("left", "top", "width", "height"):
        if col in probe and len(np.unique(np.asarray(probe[col]))) < 2:
            raise AssertionError(
                f"built dataset is degenerate: column {col!r} has a "
                "single value across 64 documents"
            )

    # 3. Train device-resident (the flagship input path).
    from flexdm_tpu.train.trainer import TrainConfig, train

    config = TrainConfig(
        dataset_name="crello", data_dir=data_dir,
        job_dir=os.path.join(root, "job"),
        latent_dim=args.latent_dim, num_blocks=args.num_blocks,
        batch_size=args.batch_size, num_epochs=args.epochs,
        validation_freq=max(1, args.epochs // 2 + args.epochs % 2),
        dtype=None if args.dtype in ("", "float32") else args.dtype,
        input_mode="device",
    )
    t0 = time.time()
    out = train(config)
    row["train_sec"] = round(time.time() - t0, 1)
    hist = out["history"]
    row["loss_first"] = round(hist[0]["loss"], 2)
    row["loss_last"] = round(hist[-1]["loss"], 2)
    row["best_val_total_score"] = round(out["best_val_total_score"], 4)
    steps_per_epoch = loader.num_records // args.batch_size
    # Total wall is dominated by one-time work (resident-split upload
    # through the platform relay + remote compile); the steady-state rate
    # uses the MEDIAN epoch-over-epoch wall delta (min is optimistically
    # biased; both are reported so the spread is visible).
    if len(hist) >= 2:
        import statistics

        deltas = [
            hist[i]["wall_time"] - hist[i - 1]["wall_time"]
            for i in range(1, len(hist))
        ]
        med = statistics.median(deltas)
        row["steady_epoch_sec"] = round(med, 2)
        row["steady_epoch_sec_min"] = round(min(deltas), 2)
        row["steady_steps_per_sec"] = round(
            steps_per_epoch / max(med, 1e-9), 1
        )
    row["startup_sec"] = round(hist[0]["wall_time"], 1)

    # 4. Eval: resident scan AND the forced-streaming branch.
    from flexdm_tpu.evaluation.harness import evaluate_task

    test_loader = spec.make_dataset("test", batch_size=args.batch_size)
    groups = spec.schema.attribute_groups
    from flexdm_tpu.train.trainer import build_model
    from flexdm_tpu.train import checkpoint as ckpt_lib, init_params
    from flexdm_tpu.data import split_device_batch

    model = build_model(config, spec.schema)
    sample = split_device_batch(
        next(iter(spec.make_dataset("test", batch_size=2)))
    )
    params = init_params(model, sample, config.seed)
    params = ckpt_lib.load_checkpoint(out["checkpoints"]["best"], params)

    t0 = time.time()
    res = evaluate_task(model, params, test_loader, "pos",
                        ("pos", groups["pos"]))
    row["eval_resident_sec"] = round(time.time() - t0, 1)
    t0 = time.time()
    res_s = evaluate_task(model, params, test_loader, "pos",
                          ("pos", groups["pos"]), resident=False)
    row["eval_streaming_sec"] = round(time.time() - t0, 1)
    for k in res:
        if abs(res[k] - res_s[k]) > 5e-3:
            raise AssertionError(
                f"resident vs streaming eval diverged on {k}: "
                f"{res[k]} vs {res_s[k]}"
            )
    row["eval_pos_scores"] = {k: round(v, 4) for k, v in res.items()}
    row["test_records"] = test_loader.num_records

    # 5. Demo render.
    from flexdm_tpu.demo import main as demo_main

    t0 = time.time()
    demo_main(["--job-dir", config.job_dir, "--task", "pos",
               "--num-examples", "4",
               "--out", os.path.join(root, "demo.html")])
    row["demo_sec"] = round(time.time() - t0, 1)
    row["demo_html_bytes"] = os.path.getsize(os.path.join(root, "demo.html"))

    print(json.dumps(row))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(row, f, indent=2)
    return row


if __name__ == "__main__":
    main()
