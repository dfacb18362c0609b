"""Worker for the 2-process distributed-training test (not a pytest module).

Launched by ``tests/test_multiprocess.py`` as::

    python tests/_multiproc_worker.py <process_id> <port> <data_dir> \
        <job_dir> <out_json>

Initializes a real 2-process ``jax.distributed`` runtime on CPU (2 local
devices each -> a 4-device global mesh) and runs ``train()`` end-to-end,
exercising every ``jax.process_count() > 1`` branch: per-host record
strides, ``make_array_from_process_local_data`` batch assembly, host-
synchronized steps-per-epoch, the device->host input-mode fallback,
``shard_global_batch`` validation, and primary-only logging.
"""

import json
import os
import sys


def main() -> None:
    process_id = int(sys.argv[1])
    port = sys.argv[2]
    data_dir = sys.argv[3]
    job_dir = sys.argv[4]
    out_json = sys.argv[5]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=2, process_id=process_id
    )
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4

    from flexdm_tpu.train.trainer import TrainConfig, train

    config = TrainConfig(
        dataset_name="rico",
        data_dir=data_dir,
        job_dir=job_dir,
        latent_dim=16,
        num_blocks=1,
        num_heads=2,
        attention_impl="xla",
        batch_size=8,  # global batch; 4 per process
        num_epochs=3,
        validation_freq=1,
        learning_rate=1e-3,
        seed=0,
    )
    result = train(config)

    # Multi-host evaluate_task: forces the STREAMING branch (resident
    # caches are single-process), _batches + shard_global_batch of data,
    # weights, AND the per-record mask-draw ids — the branch no
    # single-process test can enter.
    from flexdm_tpu.data import DatasetSpec, split_device_batch
    from flexdm_tpu.evaluation.harness import evaluate_task
    from flexdm_tpu.models import MFPModel
    from flexdm_tpu.parallel import mesh as mesh_lib
    from flexdm_tpu.train import checkpoint as ckpt_lib
    from flexdm_tpu.train import init_params

    spec = DatasetSpec("rico", data_dir, batch_size=8)
    model = MFPModel(
        spec.schema, latent_dim=16, num_blocks=1, num_heads=2,
        attention_impl="xla",
    )
    def mark(msg):
        print(f"[worker {process_id}] {msg}", file=sys.stderr, flush=True)

    mark("train done")
    sample = split_device_batch(
        next(iter(spec.make_dataset("test", batch_size=2)))
    )
    params = init_params(model, sample, seed=0)
    # Both processes restore the SAME directory (the primary's): orbax
    # coordinates multihost restores internally, and per-process paths
    # would desynchronize its barriers.
    primary_final = result["checkpoints"]["final"].replace(
        job_dir, job_dir[: -len(str(process_id))] + "0"
    )
    params = ckpt_lib.load_checkpoint(primary_final, params)
    mark("checkpoint restored")
    mesh = mesh_lib.make_mesh(len(jax.devices()))
    params = mesh_lib.shard_params(params, mesh)
    mark("params sharded")
    eval_scores = {}
    for task_mode, group in (
        ("pos", ("pos", spec.schema.attribute_groups["pos"])),
        ("random", None),
    ):
        ans = evaluate_task(
            model, params, spec.make_dataset("test", batch_size=8),
            task_mode, group, mesh=mesh,
        )
        mark(f"eval {task_mode} done")
        eval_scores[task_mode] = {k: float(v) for k, v in ans.items()}

    with open(out_json, "w") as f:
        json.dump(
            {
                "process_id": process_id,
                "history": result["history"],
                "test_metrics": result["test_metrics"],
                "best_val_total_score": result["best_val_total_score"],
                "eval_scores": eval_scores,
            },
            f,
        )


if __name__ == "__main__":
    main()
