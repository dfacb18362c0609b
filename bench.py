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
    step_fn = jax.jit(
        make_train_step(model, task_config, tx, l2=1e-2), donate_argnums=(0,)
    )
    key = jax.random.PRNGKey(0)

    # Warmup / compile.
    t0 = time.perf_counter()
    state, metrics = step_fn(state, batch, key)
    jax.block_until_ready(metrics["loss"])
    compile_time = time.perf_counter() - t0

    # Timed steps (device-bound: batch stays resident; the per-step key is
    # folded from the step counter inside the compiled program).
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step_fn(state, batch, key)
    jax.block_until_ready(metrics["loss"])
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
                    "loss": float(metrics["loss"]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
