"""Inference serving: load a trained job, serve masked-field predictions.

The reference has no serving story — its only entries are the training CLI
and notebooks.  This module turns a job directory into a production-style
inference service:

* :class:`InferenceEngine` — library API: fixed-shape jit-compiled eval
  steps per task (compiled once, reused; requests are padded to the static
  batch), human-readable documents in and out (via
  ``DatasetSpec.batch_documents`` / ``unbatch``).
* ``python -m flexdm_tpu.serve --job-dir <job>`` — a dependency-free HTTP
  server (stdlib ``ThreadingHTTPServer``):

  - ``GET /healthz`` → ``{"status": "ok"}``
  - ``GET /schema`` → dataset/field metadata
  - ``POST /predict`` → ``{"task": "pos", "documents": [...],
    "num_iter": 1}`` → predicted documents (only masked fields change:
    ground truth is merged back, reference mfp.py:46-69).  Optional
    ``"fields": "changed"`` returns only the task-modifiable columns,
    keeping feature-heavy request payloads out of the response.

Task modes mirror the eval harness: ``elem`` masks one (given or random)
element, the attribute groups (``pos``/``attr``/``img``/``txt``/``type``)
mask a field group across all elements.

Under load, :class:`CoalescingEngine` (on by default in the CLI,
``--coalesce-ms``) micro-batches concurrent identical-parameter requests
into one device step so the host<->device relay floor is paid per batch,
not per request.  ``--warmup pos:1,elem:4`` pre-compiles those steps
before the server goes live, so no client request ever pays the remote
cold compile (minutes on this platform).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional

import numpy as np

from . import transport

logger = logging.getLogger(__name__)

# Reserved packed-transport column carrying per-document pinned element
# indices for the elem task ("regenerate THIS element").  Dunder-named so
# it can never collide with a schema field.
ELEM_INDEX_KEY = "__elem_index__"


def _jsonable(x):
    """Convert unbatch output (numpy scalars/arrays, bytes) to JSON types.

    Numeric ndarrays take the ``tolist()`` fast path (already pure-Python
    all the way down) instead of a per-element recursion — the recursive
    walk cost ~130 ms per serving response on the 768-dim feature columns.
    """
    if isinstance(x, dict):
        return {k: _jsonable(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_jsonable(v) for v in x]
    if isinstance(x, bytes):  # checked before np.generic: np.bytes_ is both
        return x.decode("utf-8", "replace")
    if isinstance(x, np.ndarray):
        if x.dtype == object:
            return [_jsonable(v) for v in x.tolist()]
        return x.tolist()
    if isinstance(x, np.generic):
        return _jsonable(x.item())
    return x


class InferenceEngine:
    """Fixed-shape, jit-cached masked-field prediction over a trained job."""

    def __init__(
        self,
        job_dir: str,
        checkpoint: str = "best",
        batch_size: int = 8,
        data_dir: Optional[str] = None,
    ):
        from .demo import load_model

        self.model, self.params, self.spec = load_model(
            job_dir, checkpoint, batch_size=batch_size
        )
        if data_dir:
            from .data import DatasetSpec

            self.spec = DatasetSpec(self.spec.name, data_dir, batch_size)
        self.schema = self.spec.schema
        self.batch_size = batch_size
        self._steps: Dict[str, object] = {}
        self._lock = threading.Lock()

    @property
    def tasks(self) -> List[str]:
        return ["elem"] + list(self.schema.attribute_groups.keys())

    def _step(self, task: str, num_iter: int, in_spec):
        """One jitted program per (task, num_iter, input layout).

        The program takes the request batch as ONE packed float32 vector and
        returns predictions the same way.  On this platform every
        host<->device buffer costs a ~35 ms relay round-trip; the per-column
        dict transport paid ~16 uploads + ~16 fetches per request (measured
        p50 901 ms warm for a ~10 ms device step).  Packing cuts that to one
        upload + one fetch.  float32 carries every field exactly: the int
        columns are vocab ids / lengths / pixel sizes < 2^24 (guarded in
        ``predict``).

        The request seed rides the same vector as two trailing 16-bit
        halves (exact for any uint32 seed in f32 lanes) and the PRNG key is
        derived in-graph — a fresh seed costs ZERO extra transfers, where a
        host-built ``device_put(PRNGKey(seed))`` paid ~2 relay round-trips
        per previously-unseen seed.

        The fetch is SCOPED to the columns the task can actually modify:
        ``merge_inputs_and_prediction`` (masking.py:447) writes ground
        truth back onto every field whose mask is False, and a group
        task's masks (harness.py:54 ``_group_masks``) are all-False
        outside the group — so only the group's sequence columns can
        differ from the request (``elem`` masks one whole element, so all
        modeled sequence columns stay in scope).  Categorical columns are
        argmaxed ON DEVICE (first-max tie-breaking, identical to the host
        ``logit_to_label`` argmax; unmasked rows are one-hot ground truth
        so the argmax recovers the input label exactly), shrinking a
        (B,S,k,V) logit fetch to (B,S,k) labels.  For a crello ``pos``
        request this cuts the fetched payload from ~2.2 MB (every column,
        incl. the untouched 768-dim image/text features) to a few KB.

        ``in_spec``: tuple of ``(name, shape, dtype_str)`` for the device
        batch, sorted by name — part of the memo key so layout changes
        retrace.  Returns ``(fn, out_spec)``.
        """
        import jax
        import jax.numpy as jnp

        from .demo import build_task_masks
        from .evaluation.harness import task_id_for_mode
        from .models import forward_eval

        key = (task, num_iter, in_spec)
        with self._lock:
            if key in self._steps:
                return self._steps[key]

        model, schema = self.model, self.schema
        task_id = None
        if getattr(model, "context", None) == "id":
            task_id = task_id_for_mode(schema, task)

        if task == "elem":
            in_scope = [c for c in schema.modeled if c.is_sequence]
        else:
            group = set(schema.attribute_groups[task])
            in_scope = [
                c for c in schema.modeled
                if c.is_sequence and c.name in group
            ]
        categorical = {c.name for c in in_scope if c.is_categorical}
        fetch_names = [c.name for c in in_scope]

        def raw_step(params, batch, mask_key):
            # The reserved element-index column (present iff the request
            # pinned elements) rides the packed upload like any other
            # field; it is data, not part of the model input.
            elem_idx = batch.pop(ELEM_INDEX_KEY, None)
            if elem_idx is not None:
                elem_idx = elem_idx.astype(jnp.int32)
            masks = build_task_masks(
                schema, batch, task, key=mask_key, element=elem_idx
            )
            tasks = None
            if task_id is not None:
                tasks = jnp.full(
                    (batch["length"].shape[0],), task_id, dtype=jnp.int32
                )
            pred = forward_eval(
                model, params, batch, masks, tasks=tasks, num_iter=num_iter
            )
            return {
                name: jnp.argmax(pred[name], axis=-1).astype(jnp.int32)
                if name in categorical else pred[name]
                for name in fetch_names
            }

        # Output layout from abstract evaluation — no device work, no compile.
        out_spec = transport.eval_spec(
            raw_step, self.params, transport.abstract_tree(in_spec),
            jax.ShapeDtypeStruct((2,), jnp.uint32),
        )

        def step(params, flat):
            # trailing lanes: seed as (hi16, lo16); PRNGKey(seed) in-graph
            # is bit-identical to the host's for any seed < 2^32.
            seed = flat[-2].astype(jnp.uint32) * jnp.uint32(1 << 16) \
                + flat[-1].astype(jnp.uint32)
            mask_key = jax.random.PRNGKey(seed)
            pred = raw_step(
                params, transport.unpack_in_jit(flat[:-2], in_spec), mask_key
            )
            return transport.pack_in_jit(pred, out_spec)

        entry = (jax.jit(step), out_spec)
        with self._lock:
            self._steps[key] = entry
        return entry

    def predict(
        self,
        documents: List[Dict],
        task: str = "pos",
        num_iter: int = 1,
        seed: int = 0,
        fields: str = "all",
        element=None,
    ) -> List[Dict]:
        """Documents -> documents with the task's masked fields predicted.

        ``fields="all"`` (default) returns complete documents, unchanged
        columns echoed from the request.  ``fields="changed"`` returns only
        the columns the task could have modified (the device-fetched set) —
        for feature-heavy documents this drops the untouched 768-dim
        image/text embeddings from the response entirely.

        ``element`` (elem task only): pin WHICH element is masked and
        re-predicted — an int (same index for every document) or a
        per-document list.  Deterministic, unlike the default random draw,
        so it is the interactive-editing path ("regenerate element 2").
        """
        import jax
        import jax.numpy as jnp

        if task not in self.tasks:
            raise ValueError(f"unknown task {task!r}; one of {self.tasks}")
        if fields not in ("all", "changed"):
            raise ValueError(
                f"fields must be 'all' or 'changed', got {fields!r}"
            )
        if not documents:
            return []
        n = len(documents)
        if element is not None:
            if task != "elem":
                raise ValueError(
                    f"element= is only valid for task='elem', got {task!r}"
                )
            if isinstance(element, (int, np.integer)):
                element = [int(element)] * n
            element = [int(e) for e in element]
            if len(element) != n:
                raise ValueError(
                    f"element has {len(element)} entries for {n} documents"
                )
            S = self.schema.max_length
            for i, (doc, e) in enumerate(zip(documents, element)):
                n_el = min(len(doc.get("elements", [])), S)
                if not 0 <= e < n_el:
                    raise ValueError(
                        f"element {e} out of range for document {i} "
                        f"({n_el} elements)"
                    )
        if n > self.batch_size:
            out: List[Dict] = []
            for start in range(0, n, self.batch_size):
                out.extend(self.predict(
                    documents[start:start + self.batch_size],
                    task, num_iter, seed, fields,
                    element[start:start + self.batch_size]
                    if element is not None else None,
                ))
            return out

        batch = self.spec.batch_documents(
            list(documents) + [documents[-1]] * (self.batch_size - n)
        )
        numeric = {
            k: np.asarray(v) for k, v in batch.items()
            if not (v.dtype == object)
        }
        if element is not None:
            numeric[ELEM_INDEX_KEY] = np.asarray(
                element + [0] * (self.batch_size - n), np.int32
            )
        seed = int(seed)
        if not 0 <= seed < 1 << 32:
            raise ValueError(f"seed {seed} outside uint32 range")
        in_spec = transport.batch_spec(numeric)
        flat_in = np.concatenate([
            transport.pack(numeric, in_spec),
            np.asarray([seed >> 16, seed & 0xFFFF], np.float32),
        ])
        fn, out_spec = self._step(task, num_iter, in_spec)
        flat_out = np.asarray(jax.device_get(
            fn(self.params, jnp.asarray(flat_in))
        ))
        host = transport.unpack(flat_out, out_spec)
        # Everything outside the scoped fetch — context fields, out-of-group
        # sequence columns, demo-only strings — is provably unchanged by the
        # device step (ground truth merged back), so it passes through from
        # the request.  Slice to the n real documents before unbatch: the
        # pad rows are copies of documents[-1].
        if fields == "all":
            for k, v in batch.items():
                if k not in host:
                    host[k] = v
        else:
            host["length"] = np.asarray(batch["length"])  # unbatch needs it
        host = {k: np.asarray(v)[:n] for k, v in host.items()}
        return [_jsonable(d) for d in self.spec.unbatch(host)]

    def warmup(self, tasks=(("pos", 1),), split: str = "test") -> Dict:
        """Compile the jitted step for each ``(task, num_iter)`` up front.

        On this platform the first execution of a program pays the remote
        XLA compile (measured 264–437 s for the pos step) — without
        warmup, the first CLIENT request eats that.  Runs one real
        document from ``split`` through ``predict`` per entry; returns
        ``{f"{task}/{num_iter}": seconds}``.  Failures are logged and
        skipped (e.g. the job's data dir moved and no override was
        given) — the server still starts, requests just compile lazily.
        """
        timings: Dict[str, float] = {}
        try:
            from .data import split_device_batch

            host = next(iter(self.spec.make_dataset(split, batch_size=1)))
            doc = _jsonable(self.spec.unbatch(split_device_batch(host))[0])
        except Exception as e:
            logger.warning("warmup skipped: could not load a %s document "
                           "(%s: %s)", split, type(e).__name__, e)
            return timings
        for task, num_iter in tasks:
            t0 = time.perf_counter()
            try:
                self.predict([doc], task=task, num_iter=int(num_iter))
            except Exception as e:
                logger.warning("warmup %s/%s failed: %s: %s",
                               task, num_iter, type(e).__name__, e)
                continue
            timings[f"{task}/{num_iter}"] = round(
                time.perf_counter() - t0, 2
            )
            logger.info("warmed %s/%s in %.1f s", task, num_iter,
                        timings[f"{task}/{num_iter}"])
        return timings

    def schema_info(self) -> Dict:
        return {
            "dataset": self.spec.name,
            "max_length": self.schema.max_length,
            "tasks": self.tasks,
            "fields": {
                c.name: {
                    "is_sequence": c.is_sequence,
                    "categorical": c.is_categorical,
                    "shape": list(c.shape),
                }
                for c in self.schema.columns
            },
        }


@dataclasses.dataclass
class _PendingRequest:
    docs: List[Dict]
    done: threading.Event
    element: Optional[List[int]] = None
    result: Optional[List[Dict]] = None
    error: Optional[Exception] = None


class CoalescingEngine:
    """Micro-batches concurrent ``predict`` calls into shared device steps.

    ``ThreadingHTTPServer`` gives every request its own thread, but each
    1-doc ``predict`` pays the full host<->device relay round-trip for a
    ~10 ms device step, and concurrent calls serialize at the single
    device — N clients each sending 1 doc cost N round-trips.  This
    wrapper holds an arriving request open for up to ``window_ms`` so
    concurrent requests with the same ``(task, num_iter, seed, fields)``
    ride ONE padded batch: the relay floor is paid once per coalesced
    batch instead of once per request.

    Protocol: the first request into an empty queue becomes the batch
    leader.  It waits until the queue holds a full engine batch or the
    window expires, then drains the WHOLE queue (a later-arriving
    overflow simply makes the engine chunk internally — the same device
    steps those requests would have run alone), executes one
    ``InferenceEngine.predict``, and scatters the per-document results
    back to each caller.  Requests arriving mid-execution start a new
    queue with a new leader, so batches pipeline.

    Semantics: group tasks (``pos``/``attr``/...) are per-row
    deterministic, so a coalesced result is bit-identical to a solo one
    (rows of a batch never interact; covered by tests).  ``elem``'s
    random element draw keys on the row's position in the padded batch,
    so under coalescing it varies with batch placement — same caveat as
    any server-side sampling; pass distinct ``seed``s for reproducible
    isolation (distinct seeds never coalesce).

    Failure isolation: if the merged call raises (e.g. one request's
    documents are malformed), the leader retries each request
    individually so only the guilty request observes the error.

    The reference has no serving counterpart; this is standard
    production-inference batching (cf. any RPC batcher) implemented over
    the engine's fixed-shape jitted steps.
    """

    def __init__(self, engine: InferenceEngine, window_ms: float = 3.0):
        self._engine = engine
        self._window = window_ms / 1000.0
        self._cond = threading.Condition()
        self._queues: Dict[tuple, List[_PendingRequest]] = {}

    @property
    def tasks(self) -> List[str]:
        return self._engine.tasks

    @property
    def batch_size(self) -> int:
        return self._engine.batch_size

    @property
    def spec(self):
        return self._engine.spec

    def schema_info(self) -> Dict:
        return self._engine.schema_info()

    def predict(
        self,
        documents: List[Dict],
        task: str = "pos",
        num_iter: int = 1,
        seed: int = 0,
        fields: str = "all",
        element=None,
    ) -> List[Dict]:
        # Validate the coalescing key up front: a bad task/fields value
        # must fail its own request, never stall or poison a batch.
        if task not in self._engine.tasks:
            raise ValueError(
                f"unknown task {task!r}; one of {self._engine.tasks}"
            )
        if fields not in ("all", "changed"):
            raise ValueError(
                f"fields must be 'all' or 'changed', got {fields!r}"
            )
        if not documents:
            return []
        if element is not None and isinstance(element, (int, np.integer)):
            element = [int(element)] * len(documents)
        # element values are per-document data, so requests with DIFFERENT
        # pinned elements still merge — only pinned-vs-random differ by
        # jitted program and must not share a batch.
        key = (task, int(num_iter), int(seed), fields, element is not None)
        req = _PendingRequest(list(documents), threading.Event(), element)
        with self._cond:
            queue = self._queues.setdefault(key, [])
            leader = not queue  # first into an empty queue leads the batch
            queue.append(req)
            if not leader:
                self._cond.notify_all()
        if not leader:
            req.done.wait()
            if req.error is not None:
                raise req.error
            return req.result

        bs = self._engine.batch_size
        deadline = time.monotonic() + self._window
        with self._cond:
            while sum(len(r.docs) for r in self._queues[key]) < bs:
                remaining = deadline - time.monotonic()
                if remaining <= 0 or not self._cond.wait(remaining):
                    break
            take = self._queues.pop(key)

        batch_docs = [d for r in take for d in r.docs]
        batch_elem = None
        if element is not None:
            batch_elem = [e for r in take for e in r.element]
        try:
            preds = self._engine.predict(
                batch_docs, task, num_iter, seed, fields, batch_elem
            )
            i = 0
            for r in take:
                r.result = preds[i:i + len(r.docs)]
                i += len(r.docs)
        except Exception:
            if len(take) == 1:
                raise
            for r in take:  # isolate the failure to the guilty request
                try:
                    r.result = self._engine.predict(
                        r.docs, task, num_iter, seed, fields, r.element
                    )
                except Exception as e:
                    r.error = e
        finally:
            for r in take:
                r.done.set()
        if req.error is not None:
            raise req.error
        return req.result


def make_handler(engine: InferenceEngine):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route through logging
            logger.info("%s " + fmt, self.address_string(), *args)

        def _send(self, code: int, payload: Dict):
            try:
                # allow_nan=False: bare NaN/Infinity tokens are not JSON and
                # break strict client parsers; surface a clean 500 instead.
                body = json.dumps(payload, allow_nan=False).encode()
            except ValueError:
                payload = {"error": "non-finite value in prediction"}
                code = 500
                body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok"})
            elif self.path == "/schema":
                self._send(200, engine.schema_info())
            else:
                self._send(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, {"error": f"no route {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                docs = req["documents"]
                predictions = engine.predict(
                    docs,
                    task=req.get("task", "pos"),
                    num_iter=int(req.get("num_iter", 1)),
                    seed=int(req.get("seed", 0)),
                    fields=req.get("fields", "all"),
                    element=req.get("element"),
                )
                self._send(200, {"predictions": predictions})
            except (KeyError, ValueError, TypeError) as e:
                self._send(400, {"error": f"{type(e).__name__}: {e}"})
            except Exception as e:  # pragma: no cover - defensive
                logger.exception("predict failed")
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(engine: InferenceEngine, host: str = "127.0.0.1", port: int = 8077):
    """Blocking HTTP server; returns the server object when used threaded."""
    server = ThreadingHTTPServer((host, port), make_handler(engine))
    logger.info("serving on %s:%d", host, server.server_address[1])
    return server


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Serve masked-field predictions from a trained job"
    )
    parser.add_argument("--job-dir", dest="job_dir", required=True)
    parser.add_argument("--checkpoint", default="best")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--data-dir", default=None,
                        help="override the data dir recorded in args.json")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8077)
    parser.add_argument(
        "--coalesce-ms", dest="coalesce_ms", type=float, default=3.0,
        help="micro-batch concurrent identical-parameter requests into one "
             "device step, waiting up to this long to fill a batch "
             "(0 disables)",
    )
    parser.add_argument(
        "--warmup", default=None, metavar="TASK:ITER,...",
        help="compile these (task, num_iter) steps before serving so the "
             "first client request does not pay the cold compile, e.g. "
             "'pos:1,elem:4' (default: compile lazily on first request)",
    )
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    from .utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    engine = InferenceEngine(
        args.job_dir, args.checkpoint, args.batch_size, args.data_dir
    )
    if args.warmup:
        entries = []
        for part in args.warmup.split(","):
            task, _, it = part.strip().partition(":")
            entries.append((task, int(it) if it else 1))
        engine.warmup(entries)
    if args.coalesce_ms > 0:
        engine = CoalescingEngine(engine, args.coalesce_ms)
    server = serve(engine, args.host, args.port)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
