"""Repeat-measure bench anchors to state a noise tolerance (VERDICT r3 #6).

Runs bench.py's own ``measure_train`` N times back-to-back (one compile,
N independent timed scan bundles) for the flagship f32/bf16 and scaled
D512x8 f32/bf16 configs and prints min/median/max + spread so round-over-
round anchor movements can be classified as jitter vs regression.

Usage: python tools/anchor_noise.py [--repeats 5]
"""

if __package__ in (None, ""):
    import os as _os
    import sys as _sys

    _repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    if _repo not in _sys.path:
        _sys.path.insert(0, _repo)

import argparse
import json
import statistics


def _spread(vals):
    lo, hi = min(vals), max(vals)
    med = statistics.median(vals)
    return {
        "values": [round(v, 2) for v in vals],
        "median": round(med, 2),
        "spread_pct": round(100.0 * (hi - lo) / med, 2) if med else 0.0,
    }


def eval_anchor_noise(repeats, test_docs=2048, maskgit_iters=10):
    """Repeat the eval/elem/decode/MaskGIT anchor measurements to band the
    non-train anchors (VERDICT r4 #4: they had no stated tolerance).  Each
    repeat re-enters bench.py's own measure_* function, so the band is
    measured at exactly the headline protocol.  maskgit_iters=0 skips the
    MaskGIT anchor (its fixed 256x256x4 model is too heavy for CPU smoke)."""
    from bench import measure_decode, measure_eval, measure_maskgit

    series = {}
    for _ in range(repeats):
        for k, v in measure_eval(test_docs=test_docs).items():
            series.setdefault(k, []).append(v)
        for k, v in measure_decode(test_docs=test_docs).items():
            series.setdefault(k, []).append(v)
        if maskgit_iters:
            for k, v in measure_maskgit(iters=maskgit_iters).items():
                series.setdefault(k, []).append(v)
    return {name: _spread(vals) for name, vals in series.items()}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--repeats", type=int, default=5)
    parser.add_argument(
        "--steps", type=int, default=50,
        help="timed-window length; 50 = bench.py's headline protocol "
        "(the r4 bands were measured at 25 and did not gate the headline)")
    parser.add_argument(
        "--eval-anchors", action="store_true",
        help="also repeat-measure the eval/elem/decode/MaskGIT anchors "
        "at bench.py's own protocol")
    parser.add_argument("--test-docs", type=int, default=2048)
    parser.add_argument(
        "--quick", action="store_true",
        help="tiny f32/bf16 configs (smoke-testable on CPU; the numbers "
        "only exercise the repeat/statistics protocol, not the anchors)")
    parser.add_argument(
        "--configs", default=None,
        help="comma-separated subset of the train configs to measure "
        "(e.g. 'flagship_bf16,scaled_f32'); lets an interrupted "
        "measurement resume without repeating finished anchors")
    args = parser.parse_args(argv)

    from flexdm_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    from bench import _spec, measure_train

    batch = 8 if args.quick else 256
    spec = _spec(batch)
    if args.quick:
        configs = {
            "quick_f32": dict(latent=16, blocks=1, dtype=None),
            "quick_bf16": dict(latent=16, blocks=1, dtype="bfloat16"),
        }
    else:
        configs = {
            "flagship_f32": dict(latent=256, blocks=4, dtype=None),
            "flagship_bf16": dict(latent=256, blocks=4, dtype="bfloat16"),
            "scaled_f32": dict(latent=512, blocks=8, dtype=None),
            "scaled_bf16": dict(latent=512, blocks=8, dtype="bfloat16"),
        }
    if args.configs:
        wanted = set(args.configs.split(","))
        unknown = wanted - set(configs)
        if unknown:
            parser.error(f"unknown configs {sorted(unknown)}; "
                         f"choose from {sorted(configs)}")
        configs = {k: v for k, v in configs.items() if k in wanted}
    out = {}
    for name, cfg in configs.items():
        vals = []
        for _ in range(args.repeats):
            r = measure_train(
                spec, batch, cfg["latent"], cfg["blocks"], args.steps,
                dtype=cfg["dtype"],
            )
            vals.append(r["steps_per_sec"])
        out[name] = dict(_spread(vals), steps_per_sec=vals)
        print(json.dumps({name: out[name]}), flush=True)
    if args.eval_anchors:
        docs = 128 if args.quick else args.test_docs
        iters = 0 if args.quick else 10
        for name, row in eval_anchor_noise(
            max(args.repeats, 2) if not args.quick else 2,
            test_docs=docs, maskgit_iters=iters,
        ).items():
            out[name] = row
            print(json.dumps({name: row}), flush=True)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
