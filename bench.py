"""Training-throughput benchmark.

Measures steps/sec of the full jit-compiled training step (task sampling,
masking, forward, backward, clipnorm+Adam) for the flagship crello config —
batch 256, S=50, latent 256, 4 DeepSVG blocks — on the default JAX backend
(the real TPU chip when present).

Prints ONE JSON line:
    {"metric": "train_steps_per_sec_per_chip", "value": N,
     "unit": "steps/sec", "vs_baseline": M}

``vs_baseline`` compares against the reference implementation's measured
eager-TF step rate on this machine (see tools/measure_tf_baseline.py, stored
in BASELINE_MEASURED.json).  The reference trains with ``run_eagerly=True``
(reference train.py:76), so eager step time is the honest denominator; if no
measurement file exists, vs_baseline is null.

Usage: python bench.py [--quick] [--batch-size N] [--steps N]
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true", help="small shapes, CPU-friendly")
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--latent-dim", type=int, default=None)
    parser.add_argument("--num-blocks", type=int, default=None)
    parser.add_argument("--attention-impl", default="auto")
    parser.add_argument("--dtype", default=None,
                        help="model compute dtype, e.g. bfloat16")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from flexdm_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    from flexdm_tpu.data import DatasetSpec, split_device_batch, synthetic
    from flexdm_tpu.models import MFPModel, make_task_config
    from flexdm_tpu.parallel import mesh as mesh_lib
    from flexdm_tpu.train import (
        TrainState,
        init_params,
        make_optimizer,
        make_train_step,
    )

    if args.quick:
        batch_size = args.batch_size or 32
        latent, blocks, steps = 64, 2, 10
    else:
        batch_size = args.batch_size or 256
        latent, blocks, steps = 256, 4, 50
    latent = args.latent_dim or latent
    blocks = args.num_blocks or blocks
    steps = args.steps or steps

    cache = os.path.join(
        tempfile.gettempdir(), f"flexdm_bench_crello_{batch_size}"
    )
    if not os.path.exists(os.path.join(cache, "count.json")):
        synthetic.generate(
            "crello", cache, max(batch_size, 64), 16, 16, seed=0
        )
    spec = DatasetSpec("crello", cache, batch_size=batch_size)

    model = MFPModel(
        spec.schema,
        latent_dim=latent,
        num_blocks=blocks,
        attention_impl=args.attention_impl,
        dtype=args.dtype,
    )
    loader = spec.make_dataset("train", batch_size=batch_size, shuffle=True,
                               repeat=True, drop_remainder=True)
    host_batch = split_device_batch(next(iter(loader)))
    # Tile the synthetic pool up to the benchmark batch size.
    batch = {k: jnp.asarray(v) for k, v in host_batch.items()}

    params = init_params(model, batch, seed=0)
    tx = make_optimizer(1e-4)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.asarray(0))

    n_dev = len(jax.devices())
    mesh = mesh_lib.make_mesh(n_dev if batch_size % n_dev == 0 else 1)
    state = mesh_lib.replicate(state, mesh)
    batch = mesh_lib.shard_batch(batch, mesh)

    task_config = make_task_config(spec.schema, "elem_pos_attr_img_txt")
    from flexdm_tpu.data.pipeline import DeviceDataCache
    from flexdm_tpu.train.trainer import make_scan_steps

    # Benchmark the trainer's actual execution mode: dataset resident in
    # HBM, K steps bundled into one lax.scan call (zero host involvement).
    cache = DeviceDataCache(loader)
    base_step = make_train_step(model, task_config, tx, l2=1e-2)
    # No donation: the same initial state is reused across timing runs.
    scan_fn = jax.jit(make_scan_steps(base_step, mesh))
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)

    def index_block(n):
        return jnp.asarray(
            rng.integers(0, cache.num_records, size=(n, batch_size), dtype=np.int32)
        )

    # NOTE on timing: on this platform's remote-execution path,
    # jax.block_until_ready returns before the device finishes (measured
    # >1000x "speedups" otherwise); fetching a scalar VALUE to the host is
    # the only reliable completion barrier, so every timed region below ends
    # with float(loss).
    def run(n):
        s, m = scan_fn(state0, cache.data, index_block(n), key)
        return float(m["loss"])

    state0 = state
    t0 = time.perf_counter()
    loss_value = run(steps)
    compile_time = time.perf_counter() - t0

    t0 = time.perf_counter()
    loss_value = run(steps)
    elapsed = time.perf_counter() - t0
    steps_per_sec = steps / elapsed
    docs_per_sec = steps_per_sec * batch_size

    vs_baseline = None
    baseline_path = os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)
        ref = baseline.get("tf_eager_steps_per_sec")
        if ref:
            # Normalize to per-doc throughput in case batch sizes differ.
            ref_docs = ref * baseline.get("batch_size", batch_size)
            vs_baseline = round(docs_per_sec / ref_docs, 2)

    print(
        json.dumps(
            {
                "metric": "train_steps_per_sec_per_chip",
                "value": round(steps_per_sec / max(len(jax.devices()), 1)
                               if mesh.shape[mesh_lib.DATA_AXIS] > 1
                               else steps_per_sec, 3),
                "unit": "steps/sec",
                "vs_baseline": vs_baseline,
                "extra": {
                    "docs_per_sec": round(docs_per_sec, 1),
                    "batch_size": batch_size,
                    "latent_dim": latent,
                    "num_blocks": blocks,
                    "devices": len(jax.devices()),
                    "backend": jax.default_backend(),
                    "compile_time_sec": round(compile_time, 2),
                    "loss": loss_value,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
