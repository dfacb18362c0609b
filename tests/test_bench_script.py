"""bench.py is a driver-facing deliverable: its one-line JSON contract
(metric/value/unit/vs_baseline + extra) must not rot.  Runs the quick mode
as a subprocess on CPU, exactly as the round-end driver would."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_quick_emits_contract_json():
    env = dict(os.environ, FLEXDM_PLATFORM="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--quick"],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = proc.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["metric"] == "train_steps_per_sec_per_chip"
    assert out["unit"] == "steps/sec"
    assert out["value"] > 0
    assert out["vs_baseline"] > 0
    extra = out["extra"]
    assert "error" not in extra
    for key in (
        "docs_per_sec", "batch_size", "compile_time_sec", "loss",
        "model_tflops_per_step", "mfu_pct", "backend",
    ):
        assert key in extra, key
    assert extra["backend"] == "cpu"


def test_outage_fallback_carries_round_local_measurements():
    """When the relay is dead the fallback record attaches BOTH the newest
    driver log (last_verified) and the mid-round BENCH_LOCAL.json context —
    protocol-labeled measurements newer than any BENCH_r* file."""
    sys.path.insert(0, REPO)
    try:
        import bench
    finally:
        sys.path.remove(REPO)
    local = bench._round_local_verified()
    assert local is not None
    assert "measurements" in local and "note" in local
    for entry in local["measurements"].values():
        assert "protocol" in entry, entry
    last = bench._last_verified_result()
    assert last is not None
    assert last["source"].startswith("BENCH_r")
    assert last["value"] > 0
