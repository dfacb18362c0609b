"""Serving latency anchor (VERDICT r4 #8): warm p50/p95 per /predict.

Starts the production HTTP server (``flexdm_tpu.serve``) in-process on an
ephemeral port against a trained job, replays real test documents through
``POST /predict``, and reports:

  * cold-compile cost per (task, num_iter) — the first request pays the
    jit of that task's fixed-shape eval step;
  * warm p50/p95 ms/request for a single-doc and a full-batch (default 8)
    ``pos`` predict, and a single-doc ``elem`` with --num_iter MaskGIT.

The client path is the real one (HTTP over loopback, JSON both ways), so
the number includes serialization + batching/padding + device step +
unbatch, exactly what a user of ``python -m flexdm_tpu.serve`` sees.

Usage:
  python tools/bench_serve.py --job-dir /tmp/flexdm_capstone/job_imp \
      [--batch-size 8] [--requests 30] [--num_iter 4] [--out serve.json]
"""

if __package__ in (None, ""):
    import os as _os
    import sys as _sys

    _repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    if _repo not in _sys.path:
        _sys.path.insert(0, _repo)

import argparse
import json
import statistics
import threading
import time
import urllib.request


def _post(port, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=600) as resp:
        return json.loads(resp.read())


def _latency(port, payload, requests):
    ms = []
    for i in range(requests):
        p = dict(payload, seed=i)  # vary the seed: no trivial result reuse
        t0 = time.perf_counter()
        out = _post(port, p)
        ms.append(1000 * (time.perf_counter() - t0))
        assert "predictions" in out, out
    ms.sort()
    return {
        "p50_ms": round(statistics.median(ms), 1),
        "p95_ms": round(ms[min(len(ms) - 1, int(0.95 * len(ms)))], 1),
        "min_ms": round(ms[0], 1),
        "max_ms": round(ms[-1], 1),
        "n": requests,
    }


def _concurrent_load(port, doc, clients, requests_per_client):
    """N client threads each firing 1-doc ``pos`` requests back-to-back.

    Returns aggregate docs/s plus per-request latency quantiles — the
    serving-under-load number the coalescing engine exists for."""
    ms = []
    errors = []
    lock = threading.Lock()

    def client(cid):
        for i in range(requests_per_client):
            payload = {"task": "pos", "documents": [doc]}
            t0 = time.perf_counter()
            try:
                out = _post(port, payload)
                assert "predictions" in out, out
            except Exception as e:  # pragma: no cover
                with lock:
                    errors.append(f"{type(e).__name__}: {e}")
                return
            with lock:
                ms.append(1000 * (time.perf_counter() - t0))

    threads = [threading.Thread(target=client, args=(c,))
               for c in range(clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    if errors:
        return {"errors": errors[:3]}
    ms.sort()
    n = len(ms)
    return {
        "clients": clients,
        "requests": n,
        "docs_per_sec": round(n / wall, 1),
        "p50_ms": round(statistics.median(ms), 1),
        "p95_ms": round(ms[min(n - 1, int(0.95 * n))], 1),
        "max_ms": round(ms[-1], 1),
    }


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--job-dir", dest="job_dir", required=True)
    parser.add_argument("--data-dir", dest="data_dir", default=None)
    parser.add_argument("--checkpoint", default="best")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--requests", type=int, default=30)
    parser.add_argument("--num_iter", type=int, default=4)
    parser.add_argument("--concurrency", type=int, default=8,
                        help="client threads for the under-load phase "
                             "(0 skips it)")
    parser.add_argument("--coalesce-ms", type=float, default=3.0)
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)

    from flexdm_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    from flexdm_tpu.serve import InferenceEngine, serve

    t0 = time.perf_counter()
    engine = InferenceEngine(
        args.job_dir, args.checkpoint, args.batch_size, args.data_dir
    )
    startup_sec = round(time.perf_counter() - t0, 2)

    server = serve(engine, port=0)  # ephemeral port
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()

    # Real documents from the test split, serialized like a client would
    # (unbatch emits numpy scalars; _jsonable is the documented client shim,
    # same as tests/test_serve.py).
    from flexdm_tpu.data import split_device_batch
    from flexdm_tpu.serve import _jsonable

    loader = engine.spec.make_dataset("test", batch_size=args.batch_size)
    host = next(iter(loader))
    docs = [_jsonable(d) for d in engine.spec.unbatch(split_device_batch(host))]

    result = {"job_dir": args.job_dir, "batch_size": args.batch_size,
              "startup_sec": startup_sec, "requests": args.requests}

    # Cold compiles: first request per (task, num_iter).
    for task, num_iter in (("pos", 1), ("elem", 1), ("elem", args.num_iter)):
        t0 = time.perf_counter()
        _post(port, {"task": task, "num_iter": num_iter,
                     "documents": docs[:1]})
        result[f"cold_{task}_iter{num_iter}_sec"] = round(
            time.perf_counter() - t0, 2)

    result["pos_1doc"] = _latency(
        port, {"task": "pos", "documents": docs[:1]}, args.requests)
    result[f"pos_{args.batch_size}doc"] = _latency(
        port, {"task": "pos", "documents": docs}, args.requests)
    # fields="changed": response carries only the task-modifiable columns
    # (same device work; measures the JSON echo cost of full documents).
    result[f"pos_{args.batch_size}doc_changed"] = _latency(
        port, {"task": "pos", "documents": docs, "fields": "changed"},
        args.requests)
    result[f"elem_1doc_iter{args.num_iter}"] = _latency(
        port, {"task": "elem", "num_iter": args.num_iter,
               "documents": docs[:1]}, args.requests)

    if args.concurrency > 1:
        # Under-load phase: N concurrent clients, coalescing off vs on.
        # Both servers share the engine (and its warm jit cache), so the
        # difference is purely the request batcher.
        from flexdm_tpu.serve import CoalescingEngine

        per_client = max(4, args.requests // 2)
        result["load_serial"] = _concurrent_load(
            port, docs[0], args.concurrency, per_client)
        co_server = serve(
            CoalescingEngine(engine, args.coalesce_ms), port=0)
        co_port = co_server.server_address[1]
        threading.Thread(
            target=co_server.serve_forever, daemon=True).start()
        result["load_coalesced"] = _concurrent_load(
            co_port, docs[0], args.concurrency, per_client)
        co_server.shutdown()

    server.shutdown()
    print(json.dumps(result, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    return result


if __name__ == "__main__":
    main()
