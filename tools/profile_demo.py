"""Stage-by-stage breakdown of the demo/render path (VERDICT r4 #3).

The round-4 scale drill recorded 67 s to render 4 documents with no
explanation.  This tool runs ``flexdm_tpu.demo.run_demo`` — the production
path, instrumented via its ``timings`` hook — and prints a per-stage table
for a cold call and an in-process warm repeat (jit cache hit).  Run the
tool twice in separate processes to see the persistent-XLA-cache warm
start (run_demo enables the cache; cross-process repeat compiles become
cache loads).

Usage:
  python tools/profile_demo.py --job-dir /tmp/flexdm_capstone/job_imp \
      [--task pos --num-examples 4 --num-iter 1 --repeats 2]
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
import tempfile
import time


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--job-dir", dest="job_dir", required=True)
    parser.add_argument("--task", default="pos")
    parser.add_argument("--num-examples", type=int, default=4)
    parser.add_argument("--num-iter", type=int, default=1)
    parser.add_argument("--repeats", type=int, default=2,
                        help="total run_demo calls (first = cold)")
    parser.add_argument("--checkpoint", default="best")
    parser.add_argument("--out", default=None,
                        help="also dump the breakdown JSON here")
    args = parser.parse_args(argv)

    from flexdm_tpu.demo import run_demo

    runs = []
    for i in range(max(args.repeats, 1)):
        timings = {}
        html_path = os.path.join(
            tempfile.gettempdir(), f"flexdm_profile_demo_{i}.html")
        t0 = time.perf_counter()
        run_demo(
            args.job_dir, args.task, args.num_examples, args.num_iter,
            html_path, args.checkpoint, timings=timings,
        )
        timings["TOTAL"] = round(time.perf_counter() - t0, 3)
        label = "cold" if i == 0 else f"warm{i}"
        runs.append({"run": label, "timings": timings})
        print(json.dumps(runs[-1]), flush=True)

    result = {
        "job_dir": args.job_dir,
        "task": args.task,
        "num_examples": args.num_examples,
        "num_iter": args.num_iter,
        "runs": runs,
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    # Human-readable table: stage rows, one column per run.
    stages = [k for k in runs[0]["timings"] if not k.startswith("load_model.")]
    sub = [k for k in runs[0]["timings"] if k.startswith("load_model.")]
    print(f"\n{'stage':<28}" + "".join(f"{r['run']:>10}" for r in runs))
    for k in stages + sub:
        print(f"{k:<28}" + "".join(
            f"{r['timings'].get(k, float('nan')):>10.3f}" for r in runs))
    return result


if __name__ == "__main__":
    main()
