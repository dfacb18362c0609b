"""Trainer tests: optimization semantics, end-to-end training, checkpoints."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdm_tpu.train import (
    TrainConfig,
    clip_by_per_leaf_norm,
    l2_penalty,
    load_checkpoint,
    make_optimizer,
    save_checkpoint,
    train,
)


def test_clip_by_per_leaf_norm():
    clip = clip_by_per_leaf_norm(1.0)
    grads = {"a": jnp.asarray([3.0, 4.0]), "b": jnp.asarray([0.1, 0.0])}
    out, _ = clip.update(grads, clip.init(grads))
    np.testing.assert_allclose(np.asarray(out["a"]), [0.6, 0.8], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["b"]), [0.1, 0.0], rtol=1e-6)  # untouched


def test_l2_penalty_excludes_layernorm():
    params = {
        "params": {
            "blocks": {
                "seq2seq_0": {
                    "attn": {"query": {"kernel": jnp.ones((2, 2))}},
                    "norm1": {"scale": jnp.full((4,), 5.0), "bias": jnp.ones((4,))},
                }
            }
        }
    }
    assert float(l2_penalty(params)) == 4.0  # only the kernel counts


def test_checkpoint_roundtrip(tmp_path):
    tree = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3), "step": jnp.asarray(3)}
    path = str(tmp_path / "ck")
    save_checkpoint(path, tree)
    template = jax.tree.map(jnp.zeros_like, tree)
    out = load_checkpoint(path, template)
    np.testing.assert_array_equal(np.asarray(out["w"]), np.asarray(tree["w"]))
    assert int(out["step"]) == 3
    # overwrite works
    save_checkpoint(path, jax.tree.map(lambda x: x + 1, tree))
    out2 = load_checkpoint(path, template)
    assert int(out2["step"]) == 4


@pytest.fixture(scope="module")
def trained_job(request, tmp_path_factory):
    rico_dir = request.getfixturevalue("rico_dir")
    job = str(tmp_path_factory.mktemp("job"))
    config = TrainConfig(
        dataset_name="rico",
        data_dir=rico_dir,
        job_dir=job,
        latent_dim=32,
        num_blocks=1,
        num_heads=4,
        batch_size=16,
        num_epochs=3,
        validation_freq=1,
        masking_method="elem_pos_attr",
        attention_impl="xla",
        num_devices=1,
        seed=0,
    )
    results = train(config)
    return config, results


def test_train_end_to_end(trained_job):
    config, results = trained_job
    assert len(results["history"]) == 3
    losses = [h["loss"] for h in results["history"]]
    assert losses[-1] < losses[0]  # learning something
    assert results["best_val_total_score"] > 0
    for name in ("best", "final", "last"):
        assert os.path.isdir(results["checkpoints"][name])
    # provenance round trip
    with open(os.path.join(config.job_dir, "args.json")) as f:
        args = json.load(f)
    assert args["masking_method"] == "elem_pos_attr"
    # history log exists
    assert os.path.exists(os.path.join(config.job_dir, "logs", "history.jsonl"))


def test_warm_start(trained_job, rico_dir, tmp_path):
    config, results = trained_job
    job2 = str(tmp_path / "job2")
    config2 = TrainConfig(
        **{
            **config.to_json(),
            "job_dir": job2,
            "num_epochs": 1,
            "weights": results["checkpoints"]["final"],
        }
    )
    results2 = train(config2)
    # warm-started run should start near the previous run's end loss
    assert results2["history"][0]["loss"] < results["history"][0]["loss"]


def test_resume_continues_from_last_checkpoint(trained_job, tmp_path):
    """--resume restores params+optimizer+step and continues epoch count."""
    config, results = trained_job
    import shutil

    job2 = str(tmp_path / "resume_job")
    shutil.copytree(config.job_dir, job2)
    config2 = TrainConfig(
        **{**config.to_json(), "job_dir": job2, "num_epochs": 5, "resume": True}
    )
    results2 = train(config2)
    # The original ran 3 epochs; the resumed run must do epochs 4..5 only.
    epochs = [h["epoch"] for h in results2["history"]]
    assert epochs == [4, 5]
    steps = [h["step"] for h in results2["history"]]
    assert steps[0] > results["history"][-1]["step"] - 1


def test_val_metrics_present(trained_job):
    _, results = trained_job
    val_epochs = [h for h in results["history"] if "val_total_score" in h]
    assert len(val_epochs) == 3  # validation_freq=1
    assert "val_type_score" in val_epochs[0]
    assert 0.0 <= val_epochs[0]["val_total_score"] <= 1.0
    assert "clickable" in " ".join(results["test_metrics"].keys())
