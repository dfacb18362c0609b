"""tools/check_bench.py: anchor diffing against noise bands (VERDICT r4 #4).

Pure-JSON tests — no device work.  The r4 motivating case is pinned: a
-12% decode_docs_per_sec move (silent in round 4) must flag as REGRESS
under a tighter band, and classification must respect per-anchor
direction (lower-is-better for ms anchors).
"""

import json

from tools.check_bench import check, format_rows, main


def _doc(value, extra):
    return {"metric": "train_steps_per_sec_per_chip", "value": value,
            "unit": "steps/sec", "extra": extra}


BANDS = {
    "train_steps_per_sec_per_chip": {"band_pct": 4.0, "direction": "higher"},
    "decode_docs_per_sec": {"band_pct": 5.0, "direction": "higher"},
    "maskgit4_ms_per_batch": {"band_pct": 5.0, "direction": "lower"},
}


def _by_name(rows):
    return {r["name"]: r for r in rows}


def test_inside_band_passes():
    old = _doc(117.7, {"decode_docs_per_sec": 3968.0})
    new = _doc(115.0, {"decode_docs_per_sec": 3900.0})  # -2.3%, -1.7%
    rows, n = check(old, new, BANDS)
    assert n == 0
    assert all(r["status"] == "PASS" for r in rows)


def test_r4_decode_drop_is_flagged():
    # The actual silent r3->r4 move: 3968 -> 3498.5 (-11.8%).
    old = _doc(117.7, {"decode_docs_per_sec": 3968.0})
    new = _doc(117.9, {"decode_docs_per_sec": 3498.5})
    rows, n = check(old, new, BANDS)
    assert n == 1
    assert _by_name(rows)["decode_docs_per_sec"]["status"] == "REGRESS"


def test_lower_is_better_direction():
    old = _doc(117.7, {"maskgit4_ms_per_batch": 8.0})
    up = _doc(117.7, {"maskgit4_ms_per_batch": 9.0})     # +12.5% ms: worse
    down = _doc(117.7, {"maskgit4_ms_per_batch": 7.0})   # faster: better
    rows, n = check(old, up, BANDS)
    assert _by_name(rows)["maskgit4_ms_per_batch"]["status"] == "REGRESS"
    assert n == 1
    rows, n = check(old, down, BANDS)
    assert _by_name(rows)["maskgit4_ms_per_batch"]["status"] == "IMPROVED"
    assert n == 0


def test_unbanded_anchor_uses_default_and_is_marked():
    old = _doc(100.0, {"novel_anchor": 100.0})
    new = _doc(100.0, {"novel_anchor": 92.0})  # -8% > default 5%
    rows, n = check(old, new, BANDS, default_band_pct=5.0)
    row = _by_name(rows)["novel_anchor"]
    assert row["status"] == "REGRESS" and not row["banded"]
    assert "(default band)" in format_rows([row])


def test_new_and_gone_anchors_reported_not_regressed():
    old = _doc(100.0, {"gone_anchor": 5.0})
    new = _doc(100.0, {"fresh_anchor": 7.0})
    rows, n = check(old, new, BANDS)
    assert n == 0
    by = _by_name(rows)
    assert by["gone_anchor"]["status"] == "GONE"
    assert by["fresh_anchor"]["status"] == "NEW"


def test_driver_artifact_format_and_context_skipped():
    # BENCH_rNN.json wraps the parsed line; context fields (loss,
    # compile time is banded? no - compile_time_sec is lower-is-better but
    # loss/batch_size/backend must never be diffed.
    old = {"parsed": _doc(117.7, {"loss": 420.1, "batch_size": 256,
                                  "backend": "tpu",
                                  "decode_docs_per_sec": 3968.0})}
    new = {"parsed": _doc(118.0, {"loss": 999.0, "batch_size": 256,
                                  "backend": "tpu",
                                  "decode_docs_per_sec": 3950.0})}
    rows, n = check(old, new, BANDS)
    names = {r["name"] for r in rows}
    assert "loss" not in names and "batch_size" not in names
    assert n == 0


def test_cli_exit_codes_and_real_artifacts(tmp_path, capsys):
    old = tmp_path / "old.json"
    new = tmp_path / "new.json"
    bands = tmp_path / "bands.json"
    old.write_text(json.dumps(_doc(100.0, {"decode_docs_per_sec": 4000.0})))
    bands.write_text(json.dumps({"anchors": BANDS}))

    new.write_text(json.dumps(_doc(99.0, {"decode_docs_per_sec": 3990.0})))
    assert main([str(old), str(new), "--bands", str(bands)]) == 0

    new.write_text(json.dumps(_doc(80.0, {"decode_docs_per_sec": 3990.0})))
    assert main([str(old), str(new), "--bands", str(bands)]) == 1
    out = capsys.readouterr().out
    assert "REGRESS" in out and "train_steps_per_sec_per_chip" in out


def test_repo_artifacts_r3_vs_r4_flags_the_known_moves():
    # Running on the committed round artifacts must work: the r4 eval-harness
    # recovery (12.6k -> 51.2k) classifies as IMPROVED and every anchor gets
    # classified.  (The verdict's -12% decode complaint was PARITY-claim vs
    # BENCH artifact, not r3 vs r4 — that synthetic case is pinned above in
    # test_r4_decode_drop_is_flagged.)
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH_r03.json")) as f:
        r3 = json.load(f)
    with open(os.path.join(repo, "BENCH_r04.json")) as f:
        r4 = json.load(f)
    with open(os.path.join(repo, "BENCH_BANDS.json")) as f:
        bands = json.load(f)["anchors"]
    rows, n = check(r3, r4, bands)
    by = _by_name(rows)
    assert n == 0
    assert by["eval_docs_per_sec"]["status"] == "IMPROVED"
    assert by["elem_docs_per_sec"]["status"] == "IMPROVED"
    assert by["train_steps_per_sec_per_chip"]["status"] == "PASS"
