"""Determinism: same seed -> identical training trajectory."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from flexdm_tpu.train import TrainConfig, train


def test_same_seed_same_history(rico_dir, tmp_path):
    histories = []
    for run in range(2):
        config = TrainConfig(
            dataset_name="rico", data_dir=rico_dir,
            job_dir=str(tmp_path / f"run{run}"),
            latent_dim=16, num_blocks=1, num_heads=2, batch_size=16,
            num_epochs=2, validation_freq=2, attention_impl="xla",
            num_devices=1, seed=7,
        )
        histories.append(train(config)["history"])
    for a, b in zip(*histories):
        np.testing.assert_allclose(a["loss"], b["loss"], rtol=1e-5)
        np.testing.assert_allclose(
            a.get("val_total_score", 0), b.get("val_total_score", 0), rtol=1e-5
        )


def test_different_seed_different_history(rico_dir, tmp_path):
    losses = []
    for seed in (0, 1):
        config = TrainConfig(
            dataset_name="rico", data_dir=rico_dir,
            job_dir=str(tmp_path / f"seed{seed}"),
            latent_dim=16, num_blocks=1, num_heads=2, batch_size=16,
            num_epochs=1, validation_freq=1, attention_impl="xla",
            num_devices=1, seed=seed,
        )
        losses.append(train(config)["history"][0]["loss"])
    assert losses[0] != losses[1]
