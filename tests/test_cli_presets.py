"""CLI preset loading (--preset configs/<name>.json)."""

import json
import os

import pytest


def test_all_preset_files_are_valid():
    root = os.path.join(os.path.dirname(os.path.dirname(__file__)), "configs")
    from flexdm_tpu.train.trainer import TrainConfig
    import dataclasses

    fields = {f.name for f in dataclasses.fields(TrainConfig)}
    presets = sorted(os.listdir(root))
    assert {
        "crello_ours_exp.json", "crello_ours_imp.json", "crello_scaled.json",
        "rico_ours_exp.json", "rico_ours_imp.json",
    } <= set(presets)
    for name in presets:
        with open(os.path.join(root, name)) as f:
            cfg = json.load(f)
        unknown = set(cfg) - fields
        assert not unknown, f"{name}: unknown keys {unknown}"


@pytest.mark.slow
def test_preset_cli_applies_defaults_and_flags_win(rico_dir, tmp_path):
    from flexdm_tpu.cli import train_main

    job = str(tmp_path / "job")
    train_main([
        "--preset", "rico_ours_exp",
        "--data_dir", rico_dir, "--job-dir", job,
        "--latent_dim", "16", "--num_blocks", "1", "--batch_size", "16",
        "--num_epochs", "1", "--validation_freq", "1",
        "--attention_impl", "xla", "--num_devices", "1",
    ])
    args = json.load(open(os.path.join(job, "args.json")))
    assert args["dataset_name"] == "rico"  # from the preset
    assert args["masking_method"] == "elem_pos_attr"  # from the preset
    assert args["latent_dim"] == 16  # explicit flag beats the preset


def test_train_wrapper_arg_routing(tmp_path):
    """bin/train_flexdm.sh: a flags-only invocation keeps the default
    dataset and forwards every flag; a dataset positional is consumed."""
    import subprocess

    repo = os.path.dirname(os.path.dirname(__file__))
    # Stub `python` so the wrapper's exec line just echoes its argv.
    stub = tmp_path / "python"
    stub.write_text("#!/usr/bin/env bash\necho \"ARGS:$*\"\n")
    stub.chmod(0o755)
    env = dict(os.environ, PATH=f"{tmp_path}:{os.environ['PATH']}")

    def run(*args):
        r = subprocess.run(
            ["bash", os.path.join(repo, "bin", "train_flexdm.sh"), *args],
            capture_output=True, text=True, env=env, timeout=30,
        )
        assert r.returncode == 0, r.stderr
        return next(
            l for l in r.stdout.splitlines() if l.startswith("ARGS:")
        )

    flags_only = run("--num_epochs", "5")
    assert "--dataset_name crello" in flags_only
    assert "--num_epochs 5" in flags_only

    positional = run("rico", "--num_epochs", "3")
    assert "--dataset_name rico" in positional
    assert "--num_epochs 3" in positional
    assert " rico" not in positional.split("--dataset_name rico", 1)[1]


@pytest.mark.slow
def test_cli_default_writes_periodic_last_checkpoint(
    rico_dir, tmp_path, monkeypatch
):
    """A plain CLI run must refresh the resumable 'last' checkpoint at every
    validation boundary (crash safety, PARITY §2.5) — not only at the end of
    the run.  Pins the cli default checkpoint_every=None -> trainer
    ckpt_every=validation_freq (reference helpers/callbacks.py:49-56 saved
    'checkpoint' every epoch)."""
    from flexdm_tpu.cli import train_main
    from flexdm_tpu.train import checkpoint as ckpt_lib

    saved = []
    real_save = ckpt_lib.save_checkpoint

    def spy(path, state):
        saved.append(os.path.basename(path))
        return real_save(path, state)

    monkeypatch.setattr(ckpt_lib, "save_checkpoint", spy)

    job = str(tmp_path / "job")
    train_main([
        "--dataset_name", "rico",
        "--data_dir", rico_dir, "--job-dir", job,
        "--latent_dim", "16", "--num_blocks", "1", "--batch_size", "16",
        "--num_epochs", "2", "--validation_freq", "1",
        "--attention_impl", "xla", "--num_devices", "1",
    ])
    args = json.load(open(os.path.join(job, "args.json")))
    assert args["checkpoint_every"] is None
    # Periodic saves at the epoch-1 and epoch-2 boundaries + the end-of-run
    # save; the crash-safe property is a 'last' BEFORE 'final' exists.
    assert saved.count("last") >= 2, saved
    assert saved.index("last") < saved.index("final"), saved
    assert os.path.isdir(os.path.join(job, "checkpoints", "last"))
