"""Serving path: batch_documents inverse, InferenceEngine, HTTP round trip."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from flexdm_tpu.data import split_device_batch


@pytest.fixture(scope="module")
def tiny_job(request, tmp_path_factory):
    from flexdm_tpu.train import TrainConfig, train

    rico_dir = request.getfixturevalue("rico_dir")
    job = str(tmp_path_factory.mktemp("serve_job"))
    train(TrainConfig(
        dataset_name="rico", data_dir=rico_dir, job_dir=job,
        latent_dim=16, num_blocks=1, num_heads=2, batch_size=16,
        num_epochs=1, validation_freq=1, attention_impl="xla",
        num_devices=1, seed=0,
    ))
    return job


def test_batch_documents_inverts_unbatch(crello_spec):
    """batch -> unbatch -> batch_documents reproduces the preprocessed
    arrays (modulo padding rows, which carry no information)."""
    host = next(iter(crello_spec.make_dataset("test", batch_size=4)))
    batch = split_device_batch(host)
    docs = crello_spec.unbatch(host)
    rebuilt = crello_spec.batch_documents(docs)

    S = crello_spec.max_length
    for name, column in crello_spec.columns.items():
        if column.get("demo_only", False):
            continue
        a, b = np.asarray(batch[name]), rebuilt[name]
        assert a.shape == b.shape, name
        if column.get("is_sequence", False):
            for i in range(a.shape[0]):
                n = int(batch["length"][i, 0]) + 1
                np.testing.assert_array_equal(a[i, :n], b[i, :n], err_msg=name)
        else:
            np.testing.assert_array_equal(a, b, err_msg=name)


@pytest.mark.slow
def test_engine_predicts_masked_fields(tiny_job, rico_spec):
    from flexdm_tpu.serve import InferenceEngine

    engine = InferenceEngine(tiny_job, checkpoint="final", batch_size=4)
    docs = rico_spec.unbatch(next(iter(rico_spec.make_dataset("test", batch_size=3))))
    docs = [json.loads(json.dumps(d, default=str)) for d in engine_safe(docs)]

    preds = engine.predict(docs, task="pos")
    assert len(preds) == 3
    for doc, pred in zip(docs, preds):
        assert len(pred["elements"]) == len(doc["elements"])
        for el_in, el_out in zip(doc["elements"], pred["elements"]):
            # non-pos fields are ground truth, merged back verbatim
            assert el_out["type"] == el_in["type"]
        # the pos group was re-predicted: values exist and are valid bins
        for el in pred["elements"]:
            for f in ("left", "top", "width", "height"):
                assert f in el

    # a 5-doc request exceeds the static batch (4) and chunks transparently
    preds5 = engine.predict(docs + docs[:2], task="elem")
    assert len(preds5) == 5

    # fields="changed": only the task-modifiable columns come back, equal
    # to the full response restricted to those fields
    changed = engine.predict(docs, task="pos", fields="changed")
    assert len(changed) == 3
    for full, thin in zip(preds, changed):
        assert len(thin["elements"]) == len(full["elements"])
        for el_full, el_thin in zip(full["elements"], thin["elements"]):
            assert set(el_thin) == {"left", "top", "width", "height"}
            assert all(el_thin[k] == el_full[k] for k in el_thin)
        assert "elements" in thin and "type" not in thin["elements"][0]

    with pytest.raises(ValueError):
        engine.predict(docs, task="pos", fields="nope")


@pytest.mark.slow
def test_engine_warmup(tiny_job):
    """warmup() pre-compiles the requested (task, num_iter) steps from a
    real split document; failures degrade to lazy compilation."""
    from flexdm_tpu.serve import InferenceEngine

    engine = InferenceEngine(tiny_job, checkpoint="final", batch_size=2)
    assert not engine._steps
    t = engine.warmup([("pos", 1), ("elem", 2)])
    assert set(t) == {"pos/1", "elem/2"} and all(v > 0 for v in t.values())
    assert len(engine._steps) == 2

    # unknown task: logged + skipped, server still usable
    t2 = engine.warmup([("nope", 1)])
    assert t2 == {}

    # unloadable document source (e.g. moved data dir): warmup skips
    # entirely instead of raising
    assert engine.warmup(split="no_such_split") == {}


@pytest.mark.slow
def test_elem_pinned_element(tiny_job, rico_spec):
    """element= pins which element the elem task re-predicts: every other
    element comes back as ground truth, and the result is deterministic
    (seed-independent)."""
    from flexdm_tpu.serve import InferenceEngine

    engine = InferenceEngine(tiny_job, checkpoint="final", batch_size=4)
    docs = engine_safe(rico_spec.unbatch(
        next(iter(rico_spec.make_dataset("test", batch_size=3)))
    ))
    docs = [d for d in docs if len(d["elements"]) >= 2][:2]
    assert len(docs) == 2, "fixture needs docs with >= 2 elements"

    preds = engine.predict(docs, task="elem", element=1, seed=7)
    for doc, pred in zip(docs, preds):
        assert len(pred["elements"]) == len(doc["elements"])
        for i, (el_in, el_out) in enumerate(
            zip(doc["elements"], pred["elements"])
        ):
            if i != 1:  # untouched elements echo ground truth exactly
                assert el_out == el_in, f"element {i} changed"

    # deterministic: the seed only feeds the random draw, which a pinned
    # element bypasses
    again = engine.predict(docs, task="elem", element=1, seed=99)
    assert again == preds

    # per-document list form
    listed = engine.predict(docs, task="elem", element=[1, 0], seed=7)
    assert listed[0] == preds[0]
    assert listed[1]["elements"][1] == docs[1]["elements"][1]

    with pytest.raises(ValueError):
        engine.predict(docs, task="elem", element=len(docs[0]["elements"]))
    with pytest.raises(ValueError):
        engine.predict(docs, task="pos", element=0)
    with pytest.raises(ValueError):
        engine.predict(docs, task="elem", element=[0])  # wrong length


@pytest.mark.slow
def test_coalescing_engine(tiny_job, rico_spec):
    """Concurrent 1-doc predicts merge into one underlying engine call and
    return bit-identical results to solo calls (batch rows never interact
    for group tasks)."""
    from flexdm_tpu.serve import CoalescingEngine, InferenceEngine

    inner = InferenceEngine(tiny_job, checkpoint="final", batch_size=4)
    calls = []
    real_predict = inner.predict

    def counting_predict(docs, *a, **kw):
        calls.append(len(docs))
        return real_predict(docs, *a, **kw)

    inner.predict = counting_predict
    engine = CoalescingEngine(inner, window_ms=500.0)

    docs = engine_safe(rico_spec.unbatch(
        next(iter(rico_spec.make_dataset("test", batch_size=4)))
    ))
    solo = [inner.predict([d], task="pos")[0] for d in docs]  # also warms jit
    calls.clear()

    results = [None] * 4
    errors = []

    def worker(i):
        try:
            results[i] = engine.predict([docs[i]], task="pos")[0]
        except Exception as e:  # pragma: no cover - surfaced via assert
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors
    # all four coalesced into one (or at worst two) underlying calls
    assert len(calls) < 4, calls
    assert sum(calls) == 4
    for got, want in zip(results, solo):
        assert got == want

    # empty request and bad params fail fast without touching a queue
    assert engine.predict([], task="pos") == []
    with pytest.raises(ValueError):
        engine.predict(docs[:1], task="nope")
    with pytest.raises(ValueError):
        engine.predict(docs[:1], task="pos", fields="nope")


@pytest.mark.slow
def test_coalescing_isolates_failures(tiny_job, rico_spec):
    """A malformed request merged with good ones fails alone: the leader
    retries per-request so batchmates still get their predictions."""
    from flexdm_tpu.serve import CoalescingEngine, InferenceEngine

    inner = InferenceEngine(tiny_job, checkpoint="final", batch_size=4)
    engine = CoalescingEngine(inner, window_ms=500.0)
    docs = engine_safe(rico_spec.unbatch(
        next(iter(rico_spec.make_dataset("test", batch_size=2)))
    ))
    inner.predict([docs[0]], task="pos")  # warm the jit cache

    # a non-dict element raises in batch_documents (missing fields are
    # tolerated by design — defaults fill in)
    bad_doc = {"elements": [5]}
    outcomes = {}

    def worker(name, payload):
        try:
            outcomes[name] = ("ok", engine.predict(payload, task="pos"))
        except Exception as e:
            outcomes[name] = ("err", e)

    threads = [
        threading.Thread(target=worker, args=("good0", [docs[0]])),
        threading.Thread(target=worker, args=("bad", [bad_doc])),
        threading.Thread(target=worker, args=("good1", [docs[1]])),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert outcomes["bad"][0] == "err"
    assert outcomes["good0"][0] == "ok" and len(outcomes["good0"][1]) == 1
    assert outcomes["good1"][0] == "ok" and len(outcomes["good1"][1]) == 1


@pytest.mark.slow
def test_packed_transport_is_lossless(tiny_job, rico_spec):
    """The single-buffer float32 transport (one upload + one fetch per
    request) must be bit-equivalent to running forward_eval directly on
    the dict batch: every int field survives the f32 round trip."""
    import jax
    import jax.numpy as jnp

    from flexdm_tpu.demo import build_task_masks
    from flexdm_tpu.models import forward_eval
    from flexdm_tpu.serve import InferenceEngine

    engine = InferenceEngine(tiny_job, checkpoint="final", batch_size=3)
    docs = engine_safe(rico_spec.unbatch(
        next(iter(rico_spec.make_dataset("test", batch_size=3)))
    ))
    preds = engine.predict(docs, task="pos", seed=0)

    # Direct path: same padded batch, same masks, no packing.
    batch = engine.spec.batch_documents(docs)
    device_batch = {
        k: jnp.asarray(v) for k, v in batch.items() if not (v.dtype == object)
    }
    masks = build_task_masks(
        engine.schema, device_batch, "pos", key=jax.random.PRNGKey(0)
    )
    direct = forward_eval(
        engine.model, engine.params, device_batch, masks, num_iter=1
    )
    host = {k: np.asarray(jax.device_get(v)) for k, v in direct.items()}
    for k, v in batch.items():
        if v.dtype == object and k not in host:
            host[k] = v
    from flexdm_tpu.serve import _jsonable

    expected = [_jsonable(d) for d in engine.spec.unbatch(host)[:3]]
    assert preds == expected


def engine_safe(docs):
    """unbatch emits numpy scalars; serialize like a client would."""
    from flexdm_tpu.serve import _jsonable

    return [_jsonable(d) for d in docs]


@pytest.mark.slow
def test_http_server_round_trip(tiny_job, rico_spec):
    from flexdm_tpu.serve import InferenceEngine, serve

    engine = InferenceEngine(tiny_job, checkpoint="final", batch_size=2)
    server = serve(engine, host="127.0.0.1", port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        port = server.server_address[1]

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            assert json.load(r) == {"status": "ok"}

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/schema", timeout=30
        ) as r:
            info = json.load(r)
        assert info["dataset"] == "rico"
        assert "pos" in info["tasks"]

        docs = engine_safe(rico_spec.unbatch(
            next(iter(rico_spec.make_dataset("test", batch_size=2)))
        ))
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict",
            data=json.dumps({"task": "pos", "documents": docs}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.load(r)
        assert len(out["predictions"]) == 2
        assert out["predictions"][0]["elements"]

        # malformed request -> 400, not a crash
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict",
            data=json.dumps({"task": "nope", "documents": docs}).encode(),
        )
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(bad, timeout=30)
        assert err.value.code == 400
    finally:
        server.shutdown()
