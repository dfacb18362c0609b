"""Training-throughput benchmark.

Measures steps/sec of the full jit-compiled training step (task sampling,
masking, forward, backward, clipnorm+Adam) for the flagship crello config —
batch 256, S=50, latent 256, 4 DeepSVG blocks — on the default JAX backend
(the real TPU chip when present).

Prints ONE JSON line:
    {"metric": "train_steps_per_sec_per_chip", "value": N,
     "unit": "steps/sec", "vs_baseline": M, "extra": {...}}

``extra`` carries the secondary regression anchors (unless --flagship-only):
bf16 flagship, the scaled D=512/8-block config, eval throughput, and the
S=512 flash-attention kernel — so BENCH_rN catches regressions beyond the
flagship step.

``vs_baseline`` compares against the reference implementation's measured
eager-TF step rate on this machine (see tools/measure_tf_baseline.py, stored
in BASELINE_MEASURED.json).  The reference trains with ``run_eagerly=True``
(reference train.py:76), so eager step time is the honest denominator; if no
measurement file exists, vs_baseline is null.

NOTE on timing: on this platform's remote-execution path,
``jax.block_until_ready`` returns before the device finishes (measured
>1000x "speedups" otherwise); fetching a scalar VALUE to the host is the
only reliable completion barrier, so every timed region ends with a
``float(...)`` fetch, and per-step work is bundled inside ``lax.scan``.

Usage: python bench.py [--quick] [--flagship-only] [--batch-size N] [--steps N]
"""

from __future__ import annotations

import argparse
import json
import logging
import math
import os
import tempfile
import time


def _backend_probe(timeout_s: float):
    """(ok, error) — run a tiny jitted matmul on a daemon thread, bounded.

    `jax.block_until_ready` is not a reliable barrier here (CLAUDE.md); the
    probe fetches a VALUE.  A dead relay leaves the thread sleeping in
    remote compile forever — the daemon flag lets the process exit anyway.
    """
    import threading

    done = threading.Event()
    err = []

    def work():
        try:
            import jax
            import jax.numpy as jnp

            float(jax.jit(lambda a: (a @ a).sum())(jnp.ones((128, 128))))
        except Exception as e:  # noqa: BLE001 - report any backend failure
            err.append(repr(e))
        finally:
            done.set()

    threading.Thread(target=work, daemon=True).start()
    if not done.wait(timeout_s):
        return False, f"probe timeout after {timeout_s:.0f}s"
    if err:
        return False, err[0]
    return True, None


def _spec(batch_size):
    from flexdm_tpu.data import synthetic

    return synthetic.cached_spec("crello", batch_size)


def measure_train(
    spec, batch_size, latent, blocks, steps, attention_impl="auto",
    dtype=None, remat=False, seq_type="default", masking_method=None,
):
    """steps/sec of the scan-bundled training loop (the trainer's hot path)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from flexdm_tpu.data import split_device_batch
    from flexdm_tpu.data.pipeline import DeviceDataCache
    from flexdm_tpu.models import MFPModel, make_task_config
    from flexdm_tpu.parallel import mesh as mesh_lib
    from flexdm_tpu.train import (
        TrainState,
        init_params,
        make_optimizer,
        make_train_step,
    )
    from flexdm_tpu.train.trainer import make_scan_steps

    model = MFPModel(
        spec.schema, latent_dim=latent, num_blocks=blocks,
        attention_impl=attention_impl, dtype=dtype, remat=remat,
        seq_type=seq_type,
        input_dtype="shuffled_set" if seq_type == "flat" else "set",
    )
    loader = spec.make_dataset("train", batch_size=batch_size, shuffle=True,
                               repeat=True, drop_remainder=True)
    batch = {
        k: jnp.asarray(v)
        for k, v in split_device_batch(next(iter(loader))).items()
    }
    params = init_params(model, batch, seed=0)
    tx = make_optimizer(1e-4)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.asarray(0))

    n_dev = len(jax.devices())
    mesh = mesh_lib.make_mesh(n_dev if batch_size % n_dev == 0 else 1)
    state = mesh_lib.shard_state(state, mesh)

    task_config = make_task_config(
        spec.schema, masking_method or "elem_pos_attr_img_txt"
    )
    cache = DeviceDataCache(loader)
    base_step = make_train_step(model, task_config, tx, l2=1e-2)
    # No donation: the same initial state is reused across timing runs.
    scan_fn = jax.jit(make_scan_steps(base_step, mesh))
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)

    def run(n):
        idx = jnp.asarray(rng.integers(
            0, cache.num_records, size=(n, batch_size), dtype=np.int32
        ))
        s, m = scan_fn(state, cache.data, idx, key)
        return float(m["loss"])

    t0 = time.perf_counter()
    loss_value = run(steps)
    compile_time = time.perf_counter() - t0
    # Best of 3 timed windows: each window is ONE dispatch + ONE value
    # fetch, so a transient relay stall (observed: seconds of added
    # latency when the remote-execution path degrades) inflates a single
    # window; the minimum is the robust estimate of the true device rate.
    elapsed = math.inf
    for _ in range(3):
        t0 = time.perf_counter()
        loss_value = run(steps)
        elapsed = min(elapsed, time.perf_counter() - t0)
    per_chip = mesh.shape["data"]
    return {
        "steps_per_sec": round(steps / elapsed, 3),
        "docs_per_sec": round(steps / elapsed * batch_size, 1),
        "per_chip_steps_per_sec": round(steps / elapsed / per_chip, 3),
        "compile_time_sec": round(compile_time, 2),
        "loss": loss_value,
    }


def measure_eval(batch_size=256, repeats=3, test_docs=2048):
    """End-to-end eval-harness throughput: docs/sec of a full 'pos' task
    over a device-resident split (the harness's bundled scan path — one
    compiled program, one host fetch per task run).  Uses its own synthetic
    dataset with a ``test_docs``-sized test split (the train-bench spec's
    test split is too small to be meaningful)."""
    import jax.numpy as jnp

    from flexdm_tpu.data import DatasetSpec, split_device_batch, synthetic
    from flexdm_tpu.evaluation.harness import evaluate_task
    from flexdm_tpu.models import MFPModel
    from flexdm_tpu.train import init_params

    cache = os.path.join(tempfile.gettempdir(), f"flexdm_bench_eval_{test_docs}")
    if not os.path.exists(os.path.join(cache, "count.json")):
        synthetic.generate("crello", cache, 64, 16, test_docs, seed=0)
    espec = DatasetSpec("crello", cache, batch_size=batch_size)

    model = MFPModel(espec.schema, latent_dim=256, num_blocks=4)
    batch = {
        k: jnp.asarray(v)
        for k, v in split_device_batch(
            next(iter(espec.make_dataset("test", batch_size=batch_size)))
        ).items()
    }
    params = init_params(model, batch, seed=0)
    groups = espec.schema.attribute_groups

    # The split uploads once (evaluate_all shares one cache across tasks);
    # per-task throughput is the steady-state metric.
    from flexdm_tpu.data.pipeline import DeviceDataCache

    dcache = DeviceDataCache(
        espec.make_dataset("test", batch_size=batch_size)
    )

    # One loader for all runs, like evaluate_all: DataLoader iteration is
    # stateless and rebuilding one re-reads every shard from disk.
    eval_loader = espec.make_dataset("test", batch_size=batch_size)

    def run(task, group):
        return evaluate_task(
            model, params, eval_loader, task, group, cache=dcache,
        )

    import math as _math

    run("pos", ("pos", groups["pos"]))  # compile
    best = _math.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        run("pos", ("pos", groups["pos"]))
        best = min(best, time.perf_counter() - t0)  # stall-robust (see
        # measure_train): one relay hiccup otherwise poisons the mean
    out = {"eval_docs_per_sec": round(test_docs / best, 1)}

    # elem = one forward per (document, element): N*S replicas; by far the
    # heaviest protocol (reference eval.py:66-90), so it gets its own anchor.
    run("elem", None)  # compile
    best = _math.inf
    for _ in range(2):
        t0 = time.perf_counter()
        run("elem", None)
        best = min(best, time.perf_counter() - t0)
    out["elem_docs_per_sec"] = round(test_docs / best, 1)
    return out


def measure_decode(test_docs=2048):
    """First-epoch host decode throughput (C++ single-pass SequenceExample
    decoder + vectorized lookups; replaces tf.io.parse_sequence_example,
    reference spec.py:255-287).  Uses the eval benchmark's corpus."""
    from flexdm_tpu.data import DatasetSpec, synthetic

    cache = os.path.join(tempfile.gettempdir(), f"flexdm_bench_eval_{test_docs}")
    if not os.path.exists(os.path.join(cache, "count.json")):
        synthetic.generate("crello", cache, 64, 16, test_docs, seed=0)
    spec = DatasetSpec("crello", cache, batch_size=256)
    loader = spec.make_dataset("test", batch_size=256)
    n = loader.num_records
    t0 = time.perf_counter()
    for i in range(n):
        loader._record(i)
    dt = time.perf_counter() - t0
    return {"decode_docs_per_sec": round(n / dt, 1)}


def measure_maskgit(batch_size=256, num_iter=4, iters=10):
    """MaskGIT iterative-decode throughput ('pos' masks, num_iter rounds).

    The whole decode is ONE compiled XLA program (models/mfp.py:252 —
    static unroll); the reference loops in Python with per-round ``.numpy()``
    fetches (reference mfp.py:141-207; upstream it only survives batch-1
    elem eval, PARITY §2.7).
    Bundled in a ``lax.scan`` with a perturbed input so XLA cannot hoist
    repeats; barriered by a value fetch (see module NOTE)."""
    import jax
    import jax.numpy as jnp

    from flexdm_tpu.data import split_device_batch
    from flexdm_tpu.models import MFPModel
    from flexdm_tpu.models.masking import (
        get_initial_masks,
        get_seq_mask,
        preprocess_for_test,
    )
    from flexdm_tpu.models.mfp import iterative_decode
    from flexdm_tpu.train import init_params

    spec = _spec(batch_size)
    model = MFPModel(spec.schema, latent_dim=256, num_blocks=4)
    batch = {
        k: jnp.asarray(v)
        for k, v in split_device_batch(
            next(iter(spec.make_dataset("train", batch_size=batch_size)))
        ).items()
    }
    params = init_params(model, batch, seed=0)
    schema = spec.schema
    seq_mask = get_seq_mask(batch["length"], schema.max_length)
    masks = dict(get_initial_masks(schema, seq_mask))
    for name in schema.attribute_groups["pos"]:
        masks[name] = seq_mask
    modified = preprocess_for_test(batch, schema, masks)

    def bundled(params, inputs, modified):
        def body(c, i):
            m = dict(modified)
            # tiny nonzero carry-dependent perturbation: no hoisting
            m["image_embedding"] = m["image_embedding"] + c * 1e-30
            out = iterative_decode(
                model, params, masks, inputs, m, num_iter
            )
            return c + jnp.sum(out["left"][0, 0, 0, :1]) * 1e-9, None

        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return c

    fn = jax.jit(bundled)
    float(fn(params, batch, modified))  # compile
    best = math.inf
    for _ in range(2):
        t0 = time.perf_counter()
        float(fn(params, batch, modified))
        best = min(best, time.perf_counter() - t0)
    return {
        "maskgit4_docs_per_sec": round(batch_size * iters / best, 1),
        "maskgit4_ms_per_batch": round(1000 * best / iters, 2),
    }


def measure_attention_s512():
    """Flash kernel vs XLA at S=512 (fwd+bwd, ms/iter, fetch-verified)."""
    import jax
    import jax.numpy as jnp

    from flexdm_tpu.ops.attention import dot_product_attention

    B, H, S, Dh, iters = 8, 8, 512, 64, 20
    key = jax.random.PRNGKey(0)
    q, k, v = (
        jax.random.normal(jax.random.fold_in(key, i), (B, H, S, Dh))
        for i in range(3)
    )
    mask = jnp.ones((B, S), bool)
    out = {}
    for impl in ("pallas", "xla"):
        def loss(q, k, v):
            o = dot_product_attention(q, k, v, key_mask=mask, impl=impl)
            return jnp.sum(o * o)

        def many(q, k, v):
            def body(c, i):
                # Perturb q by a tiny NONZERO amount of the carry so no
                # iteration can be hoisted, and consume ALL THREE gradients
                # so the dk/dv computation is not dead-code-eliminated.
                gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(
                    q + c * 1e-30, k, v
                )
                return (
                    c
                    + jnp.sum(gq[0, 0, 0, :1])
                    + jnp.sum(gk[0, 0, 0, :1]) * 1e-9
                    + jnp.sum(gv[0, 0, 0, :1]) * 1e-9
                ), None

            c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
            return c

        fn = jax.jit(many)
        float(fn(q, k, v))  # compile
        best = math.inf
        for _ in range(2):
            t0 = time.perf_counter()
            float(fn(q, k, v))
            best = min(best, time.perf_counter() - t0)
        out[f"attn_s512_{impl}_ms"] = round(1000 * best / iters, 2)
    return out


def _last_verified_result():
    """The newest prior-round bench result (``BENCH_r*.json`` driver logs
    in the repo root), for context when the backend is unreachable.

    Returns ``{"source": ..., "metric": ..., "value": ..., "extra": ...}``
    or None.  Never raises: a malformed log just yields None.
    """
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    try:
        logs = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))
        for path in reversed(logs):
            tail = json.load(open(path)).get("tail", "")
            hits = re.findall(r'\{"metric".*\}', tail)
            for line in reversed(hits):
                rec = json.loads(line)
                if rec.get("value"):
                    return {
                        "source": os.path.basename(path),
                        "metric": rec.get("metric"),
                        "value": rec.get("value"),
                        "unit": rec.get("unit"),
                        "vs_baseline": rec.get("vs_baseline"),
                        "extra": rec.get("extra"),
                    }
    except Exception:
        pass
    return None


def _round_local_verified():
    """Mid-round fetch-verified hardware measurements (``BENCH_LOCAL.json``,
    written by the session that measured them, each entry labeled with its
    protocol).  The driver's ``BENCH_r*`` logs only capture end-of-round
    runs; when the relay is down at round end, this is the freshest honest
    context.  Returns the parsed dict or None; never raises.
    """
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_LOCAL.json")
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return None


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true",
                        help="small shapes, CPU-friendly, flagship only")
    parser.add_argument("--flagship-only", action="store_true",
                        help="skip the secondary benchmarks")
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--latent-dim", type=int, default=None)
    parser.add_argument("--num-blocks", type=int, default=None)
    parser.add_argument("--attention-impl", default="auto")
    parser.add_argument("--dtype", default=None,
                        help="model compute dtype, e.g. bfloat16")
    args = parser.parse_args()

    import jax

    from flexdm_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    # The axon relay can go fully unresponsive (observed: multi-hour
    # outages where any compile sleeps forever).  Probe the backend with a
    # bounded tiny matmul first: a hang here must yield one explicit,
    # parseable error line instead of an eternally-blocked bench run.
    probe_timeout = float(os.environ.get("FLEXDM_BENCH_PROBE_TIMEOUT", 300))
    ok, perr = _backend_probe(probe_timeout)
    if not ok:
        extra = {"error": f"backend unresponsive: {perr}"}
        last = _last_verified_result()
        if last is not None:
            # Context for the record: the most recent fetch-verified
            # hardware numbers, clearly labeled as prior measurements —
            # a dead relay says nothing about the framework's speed.
            extra["last_verified"] = last
        local = _round_local_verified()
        if local is not None:
            # Mid-round measurements newer than any BENCH_r* log; clearly
            # protocol-labeled, never presented as the headline value.
            extra["round_local_verified"] = local
        print(json.dumps({
            "metric": "train_steps_per_sec_per_chip",
            "value": 0.0,
            "unit": "steps/sec",
            "vs_baseline": 0.0,
            "extra": extra,
        }), flush=True)
        # A stuck compile thread cannot be cancelled; exit without waiting.
        # os._exit skips interpreter-exit flushing, so the flush above is
        # load-bearing when stdout is a block-buffered pipe.
        os._exit(0)

    if args.quick:
        batch_size = args.batch_size or 32
        latent, blocks, steps = 64, 2, 10
    else:
        batch_size = args.batch_size or 256
        latent, blocks, steps = 256, 4, 50
    latent = args.latent_dim or latent
    blocks = args.num_blocks or blocks
    steps = args.steps or steps

    spec = _spec(batch_size)
    flagship = measure_train(
        spec, batch_size, latent, blocks, steps,
        attention_impl=args.attention_impl, dtype=args.dtype,
    )

    # Analytic model FLOPs -> MFU so efficiency regressions are visible
    # round-over-round (VERDICT r2 #3).  MFU uses the bf16 headline peak;
    # f32 configs understate by design (multi-pass MXU decomposition).
    from flexdm_tpu.utils.profiling import analytic_train_flops, mfu

    flops = analytic_train_flops(spec.schema, batch_size, latent, blocks)

    extra = {
        "docs_per_sec": flagship["docs_per_sec"],
        "batch_size": batch_size,
        "latent_dim": latent,
        "num_blocks": blocks,
        "devices": len(jax.devices()),
        "backend": jax.default_backend(),
        "compile_time_sec": flagship["compile_time_sec"],
        "loss": flagship["loss"],
        "model_tflops_per_step": round(flops / 1e12, 4),
        # MFU is per chip: aggregate steps/s over an N-chip mesh divided by
        # ONE chip's peak would overstate by N.
        "mfu_pct": round(mfu(flops, flagship["per_chip_steps_per_sec"]), 2),
    }

    if not (args.quick or args.flagship_only):
        scaled_flops = analytic_train_flops(spec.schema, batch_size, 512, 8)

        def _bf16():
            r = measure_train(
                spec, batch_size, latent, blocks, steps, dtype="bfloat16"
            )
            return {
                "bf16_steps_per_sec": r["steps_per_sec"],
                "bf16_mfu_pct": round(
                    mfu(flops, r["per_chip_steps_per_sec"]), 2
                ),
            }

        def _scaled():
            r = measure_train(spec, batch_size, 512, 8, max(steps // 2, 5))
            rb = measure_train(
                spec, batch_size, 512, 8, max(steps // 2, 5),
                dtype="bfloat16",
            )
            return {
                "scaled_d512x8_steps_per_sec": r["steps_per_sec"],
                "scaled_d512x8_bf16_steps_per_sec": rb["steps_per_sec"],
                "scaled_bf16_mfu_pct": round(
                    mfu(scaled_flops, rb["per_chip_steps_per_sec"]), 2
                ),
            }

        def _flat():
            # VanillaTransformer (seq_type='flat'): S*F tokens per doc —
            # the in-framework consumer of the flash kernels (S*F ~ 500-650
            # sits at the measured Pallas/XLA crossover); both impls
            # reported so the dispatch choice stays honest.
            out = {}
            for impl in ("xla", "pallas"):
                r = measure_train(
                    spec, max(batch_size // 4, 8), latent, blocks,
                    max(steps // 2, 5), attention_impl=impl,
                    seq_type="flat",
                    masking_method="random",  # the crello_flat preset's task
                )
                out[f"flat_{impl}_steps_per_sec"] = r["steps_per_sec"]
            return out

        # Secondary anchors; a failure in any must not lose the main metric.
        for name, fn in (
            ("bf16", _bf16),
            ("scaled", _scaled),
            ("flat", _flat),
            ("eval", measure_eval),
            ("maskgit", measure_maskgit),
            ("attn", measure_attention_s512),
            ("decode", measure_decode),
        ):
            try:
                extra.update(fn())
            except Exception as e:  # pragma: no cover
                logging.exception("bench sub-benchmark %s failed", name)
                extra[f"{name}_error"] = f"{type(e).__name__}: {e}"

    vs_baseline = None
    baseline_path = os.path.join(
        os.path.dirname(__file__), "BASELINE_MEASURED.json"
    )
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)
        ref = baseline.get("tf_eager_steps_per_sec")
        if ref:
            # Normalize to per-doc throughput in case batch sizes differ.
            ref_docs = ref * baseline.get("batch_size", batch_size)
            vs_baseline = round(flagship["docs_per_sec"] / ref_docs, 2)

    print(
        json.dumps(
            {
                "metric": "train_steps_per_sec_per_chip",
                "value": flagship["per_chip_steps_per_sec"],
                "unit": "steps/sec",
                "vs_baseline": vs_baseline,
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
