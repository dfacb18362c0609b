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

    with open(out_json, "w") as f:
        json.dump(
            {
                "process_id": process_id,
                "history": result["history"],
                "test_metrics": result["test_metrics"],
                "best_val_total_score": result["best_val_total_score"],
            },
            f,
        )


if __name__ == "__main__":
    main()
