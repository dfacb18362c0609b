"""Train every baseline family to a convergence anchor on hardware.

VERDICT r3 #4: the VAE/autoregressive baselines (reference
``src/mfp/mfp/models/model.py:74-401``, ``canvasvae.py:80-116``,
``layoutvae.py:46-126`` — dead or unreachable upstream) must be *trained*,
not just forward-passed, to earn the "full citizens" claim.  This runs each
shipped baseline preset end-to-end on a synthetic crello corpus and prints a
north-star row per model: loss first->last, best val total_score, wall time.

Usage: python tools/train_baselines.py [--docs 2048] [--epochs N] [--arch X]
"""

# Repo-root bootstrap so `python tools/train_baselines.py` works without
# pip install.
if __package__ in (None, ""):
    import os as _os
    import sys as _sys

    _repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    if _repo not in _sys.path:
        _sys.path.insert(0, _repo)

import argparse
import json
import os
import tempfile
import time

PRESETS = {
    "canvasvae": "crello_canvasvae",
    "layoutvae": "crello_layoutvae",
    "autoreg": "crello_autoreg",
    "bart_autoreg": "crello_bart",
}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--docs", type=int, default=2048)
    parser.add_argument("--epochs", type=int, default=None,
                        help="override the preset's num_epochs")
    parser.add_argument("--latent-dim", type=int, default=None,
                        help="override the preset's latent_dim (smoke runs)")
    parser.add_argument("--num-blocks", type=int, default=None,
                        help="override the preset's num_blocks (smoke runs)")
    parser.add_argument("--batch-size", type=int, default=None,
                        help="override the preset's batch_size (smoke runs)")
    parser.add_argument("--arch", default=None, choices=sorted(PRESETS),
                        help="run one architecture instead of all")
    parser.add_argument("--job-root", default=None)
    parser.add_argument("--out", default=None, help="write results JSON here")
    args = parser.parse_args(argv)

    from flexdm_tpu.data import synthetic
    from flexdm_tpu.train.trainer import TrainConfig, train
    from flexdm_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    data_dir = os.path.join(
        tempfile.gettempdir(), f"flexdm_baseline_corpus_{args.docs}"
    )
    if not os.path.exists(os.path.join(data_dir, "count.json")):
        synthetic.generate(
            "crello", data_dir, args.docs, max(64, args.docs // 8),
            max(64, args.docs // 8), seed=0,
        )

    job_root = args.job_root or tempfile.mkdtemp(prefix="flexdm_baselines_")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = {}
    archs = [args.arch] if args.arch else sorted(PRESETS)
    for arch in archs:
        with open(os.path.join(repo, "configs", f"{PRESETS[arch]}.json")) as f:
            preset = json.load(f)
        if args.epochs:
            preset["num_epochs"] = args.epochs
            preset["validation_freq"] = min(
                preset.get("validation_freq", args.epochs), args.epochs
            )
        if args.latent_dim:
            preset["latent_dim"] = args.latent_dim
        if args.num_blocks:
            preset["num_blocks"] = args.num_blocks
        if args.batch_size:
            preset["batch_size"] = args.batch_size
        config = TrainConfig(
            data_dir=data_dir,
            job_dir=os.path.join(job_root, arch),
            **preset,
        )
        t0 = time.time()
        out = train(config)
        wall = time.time() - t0
        hist = out["history"]
        row = {
            "preset": PRESETS[arch],
            "loss_first": round(hist[0]["loss"], 2),
            "loss_last": round(hist[-1]["loss"], 2),
            "best_val_total_score": round(out["best_val_total_score"], 4),
            "epochs": len(hist),
            "wall_sec": round(wall, 1),
            "num_params": out["num_params"],
            "stopped_on_nan": out["stopped_on_nan"],
        }
        results[arch] = row
        print(json.dumps({arch: row}))

    print(json.dumps(results, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    return results


if __name__ == "__main__":
    main()
