"""Smoke tests for the round-4 perf/scale tools.

These tools (`tools/ablate_residue.py`, `tools/anchor_noise.py`,
`tools/train_baselines.py`, `tools/scale_drill.py`) produced the measured
tables in PARITY.md; they must keep running as the framework evolves or the
next hardware re-measure dies on bit-rot.  Each runs here at toy size on the
CPU mesh — asserting protocol and plumbing, not performance.
"""

import json
import os

import pytest

pytestmark = pytest.mark.slow


def test_ablate_residue_variants_run():
    from tools.ablate_residue import main

    out = main([
        "--batch-size", "8", "--latent-dim", "16", "--num-blocks", "1",
        "--iters", "2", "--dtype", "float32",
        "--variants", "base,hoist,no_null,no_masking",
    ])
    ms = out["ms_per_step"]
    assert set(ms) == {"base", "hoist", "no_null", "no_masking"}
    assert all(v > 0 for v in ms.values())
    assert out["config"]["backend"] == "cpu"
    # The no_null variant monkeypatches filter_padding; it must be restored.
    from flexdm_tpu.models import masking as M

    assert M.filter_padding.__module__ == "flexdm_tpu.models.masking"


def test_anchor_noise_quick_protocol():
    from tools.anchor_noise import main

    out = main(["--quick", "--repeats", "2", "--steps", "3",
                "--eval-anchors", "--test-docs", "64"])
    # Train anchors + the banded eval anchors (quick mode skips MaskGIT:
    # its fixed 256x256x4 model is too heavy for the CPU suite).
    assert set(out) == {
        "quick_f32", "quick_bf16",
        "eval_docs_per_sec", "elem_docs_per_sec", "decode_docs_per_sec",
    }
    for row in out.values():
        assert len(row["values"]) == 2
        assert row["median"] > 0
        assert row["spread_pct"] >= 0


@pytest.mark.parametrize("arch", ["canvasvae", "autoreg"])
def test_train_baselines_smoke(arch, tmp_path):
    from tools.train_baselines import main

    results = main([
        "--arch", arch, "--docs", "128", "--epochs", "1",
        "--latent-dim", "16", "--num-blocks", "1", "--batch-size", "16",
        "--job-root", str(tmp_path),
        "--out", str(tmp_path / "results.json"),
    ])
    row = results[arch]
    assert row["loss_last"] == row["loss_last"]  # finite, not NaN
    assert not row["stopped_on_nan"]
    assert row["num_params"] > 0
    assert row["epochs"] == 1
    with open(tmp_path / "results.json") as f:
        assert json.load(f)[arch]["preset"] == row["preset"]


def test_scale_drill_tiny_end_to_end(tmp_path):
    from tools.scale_drill import main

    row = main([
        "--docs", "120", "--epochs", "1", "--batch-size", "16",
        "--latent-dim", "16", "--num-blocks", "1", "--dtype", "float32",
        "--root", str(tmp_path),
    ])
    assert row["train_records"] + 2 * row["test_records"] >= 110
    assert row["decode_docs_per_sec"] > 0
    assert row["loss_last"] == row["loss_last"]
    # Resident and forced-streaming eval agreed (the drill asserts <= 5e-3
    # itself); the scores must be present and finite.
    assert row["eval_pos_scores"]
    assert all(v == v for v in row["eval_pos_scores"].values())
    assert row["demo_html_bytes"] > 0
    assert os.path.exists(os.path.join(str(tmp_path), "demo.html"))


def test_bench_serve_smoke(request, tmp_path):
    """tools/bench_serve.py drives the real HTTP serving path and reports
    cold-compile + warm p50/p95 per protocol (VERDICT r4 #8)."""
    from flexdm_tpu.train import TrainConfig, train

    rico_dir = request.getfixturevalue("rico_dir")
    job = str(tmp_path / "job")
    train(TrainConfig(
        dataset_name="rico", data_dir=rico_dir, job_dir=job,
        latent_dim=16, num_blocks=1, num_heads=2, batch_size=16,
        num_epochs=1, validation_freq=1, attention_impl="xla",
        num_devices=1, seed=0,
    ))

    from tools.bench_serve import main

    out = main([
        "--job-dir", job, "--batch-size", "2", "--requests", "2",
        "--num_iter", "2", "--concurrency", "2",
        "--out", str(tmp_path / "serve.json"),
    ])
    assert out["cold_pos_iter1_sec"] > 0
    for key in ("pos_1doc", "pos_2doc", "elem_1doc_iter2"):
        assert out[key]["p50_ms"] > 0
        assert out[key]["p95_ms"] >= out[key]["p50_ms"]
    for key in ("load_serial", "load_coalesced"):
        assert out[key]["docs_per_sec"] > 0, out[key]
    with open(tmp_path / "serve.json") as f:
        assert json.load(f)["requests"] == 2
