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
