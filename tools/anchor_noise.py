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


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--repeats", type=int, default=5)
    parser.add_argument("--steps", type=int, default=25)
    parser.add_argument(
        "--quick", action="store_true",
        help="tiny f32/bf16 configs (smoke-testable on CPU; the numbers "
        "only exercise the repeat/statistics protocol, not the anchors)")
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
    out = {}
    for name, cfg in configs.items():
        vals = []
        for _ in range(args.repeats):
            r = measure_train(
                spec, batch, cfg["latent"], cfg["blocks"], args.steps,
                dtype=cfg["dtype"],
            )
            vals.append(r["steps_per_sec"])
        lo, hi = min(vals), max(vals)
        med = statistics.median(vals)
        out[name] = {
            "steps_per_sec": vals,
            "median": round(med, 2),
            "spread_pct": round(100.0 * (hi - lo) / med, 2),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
