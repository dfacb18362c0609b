"""Diff two bench.py result files against per-anchor noise bands.

VERDICT r4 #4: round-over-round anchor moves (e.g. the silent -12%
``decode_docs_per_sec`` drop between r3 and r4) must be flagged, not
discovered by a reviewer.  This tool compares a new bench result against a
previous one and classifies every anchor as PASS (inside the noise band),
REGRESS (worse by more than the band), IMPROVED (better by more than the
band), NEW, or GONE.  Exit code 1 iff any anchor regressed.

Band source: ``BENCH_BANDS.json`` at the repo root — per-anchor
``{"band_pct": .., "direction": "higher"|"lower", "protocol": ..}``
measured by ``tools/anchor_noise.py`` at the same protocol bench.py uses
(the r4 verdict's complaint was bands measured at 25-step windows gating a
50-step headline).  Anchors without a measured band use ``default_band_pct``
and are marked ``(default band)`` so un-banded anchors are visible.

Accepted input formats (both appear in this repo):
  * driver artifacts ``BENCH_rNN.json``: ``{"parsed": {"metric", "value",
    "extra": {...}}}``
  * a raw bench.py line: ``{"metric", "value", "extra": {...}}``

Usage:
  python tools/check_bench.py BENCH_r04.json BENCH_r05.json
  python tools/check_bench.py --bands BENCH_BANDS.json old.json new.json
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

# Anchors where smaller is better; everything else is a throughput.
_LOWER_IS_BETTER = ("_ms", "_ms_per_batch", "compile_time_sec", "loss")

# Non-performance context fields: never diffed.
_CONTEXT = {
    "batch_size", "latent_dim", "num_blocks", "devices", "backend",
    "loss", "model_tflops_per_step", "error", "note", "carried_from",
}


def _flatten(doc):
    """Extract {anchor: value} from either accepted format."""
    if "parsed" in doc:
        doc = doc["parsed"]
    out = {}
    if isinstance(doc.get("value"), (int, float)) and doc.get("metric"):
        out[doc["metric"]] = float(doc["value"])
    for k, v in (doc.get("extra") or {}).items():
        if k in _CONTEXT:
            continue
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            out[k] = float(v)
    return out


def _direction(name, bands):
    if name in bands and "direction" in bands[name]:
        return bands[name]["direction"]
    return "lower" if any(t in name for t in _LOWER_IS_BETTER) else "higher"


def check(old_doc, new_doc, bands=None, default_band_pct=5.0):
    """Return (rows, n_regressed). Each row is a dict with name/old/new/
    delta_pct/band_pct/status/banded."""
    bands = bands or {}
    old = _flatten(old_doc)
    new = _flatten(new_doc)
    rows = []
    n_regressed = 0
    for name in sorted(set(old) | set(new)):
        if name not in new:
            rows.append({"name": name, "old": old[name], "new": None,
                         "status": "GONE"})
            continue
        if name not in old:
            rows.append({"name": name, "old": None, "new": new[name],
                         "status": "NEW"})
            continue
        band_cfg = bands.get(name)
        band = float(band_cfg["band_pct"]) if band_cfg else default_band_pct
        ref = old[name]
        delta_pct = 100.0 * (new[name] - ref) / ref if ref else 0.0
        direction = _direction(name, bands)
        worse = -delta_pct if direction == "higher" else delta_pct
        if worse > band:
            status = "REGRESS"
            n_regressed += 1
        elif -worse > band:
            status = "IMPROVED"
        else:
            status = "PASS"
        rows.append({
            "name": name, "old": ref, "new": new[name],
            "delta_pct": round(delta_pct, 2), "band_pct": band,
            "status": status, "banded": band_cfg is not None,
        })
    return rows, n_regressed


def format_rows(rows):
    lines = []
    for r in rows:
        if r["status"] in ("NEW", "GONE"):
            lines.append(f"{r['status']:<9} {r['name']}: "
                         f"{r.get('old')} -> {r.get('new')}")
            continue
        tag = "" if r["banded"] else " (default band)"
        lines.append(
            f"{r['status']:<9} {r['name']}: {r['old']} -> {r['new']} "
            f"({r['delta_pct']:+.1f}%, band ±{r['band_pct']:.1f}%){tag}"
        )
    return "\n".join(lines)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="diff bench anchors against noise bands")
    parser.add_argument("old", help="previous BENCH_rN.json / bench line")
    parser.add_argument("new", help="new BENCH_rN.json / bench line")
    parser.add_argument(
        "--bands",
        default=os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_BANDS.json"),
        help="per-anchor band file (default: repo BENCH_BANDS.json)")
    parser.add_argument("--default-band-pct", type=float, default=5.0)
    args = parser.parse_args(argv)

    with open(args.old) as f:
        old_doc = json.load(f)
    with open(args.new) as f:
        new_doc = json.load(f)
    bands = {}
    if os.path.exists(args.bands):
        with open(args.bands) as f:
            bands = json.load(f).get("anchors", {})
    rows, n_regressed = check(old_doc, new_doc, bands,
                              args.default_band_pct)
    print(format_rows(rows))
    print(f"\n{sum(r['status'] == 'PASS' for r in rows)} pass, "
          f"{sum(r['status'] == 'IMPROVED' for r in rows)} improved, "
          f"{n_regressed} regressed, "
          f"{sum(r['status'] in ('NEW', 'GONE') for r in rows)} new/gone")
    return 1 if n_regressed else 0


if __name__ == "__main__":
    raise SystemExit(main())
