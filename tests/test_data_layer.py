"""Data-layer tests: TFRecord framing, proto codec, lookups, binning, schema.

Where TensorFlow is importable, the custom codec and preprocessors are
golden-tested against TF's own implementations (the reference used
``tf.io.parse_sequence_example`` + keras preprocessing layers,
reference ``src/mfp/mfp/data/spec.py:255-287``).
"""

import numpy as np
import pytest

from flexdm_tpu.data import (
    DatasetSpec,
    Discretizer,
    Vocab,
    example_proto,
    tfrecord,
)
from flexdm_tpu.data.pipeline import NUM_VALID_KEY

try:
    import tensorflow as tf

    HAS_TF = True
except Exception:  # pragma: no cover
    HAS_TF = False


# ---------------------------------------------------------------------------
# TFRecord framing
# ---------------------------------------------------------------------------

def test_tfrecord_roundtrip(tmp_path):
    path = str(tmp_path / "x.tfrecord")
    payloads = [b"hello", b"", b"\x00" * 100, bytes(range(256))]
    with tfrecord.RecordWriter(path) as w:
        for p in payloads:
            w.write(p)
    assert tfrecord.read_records(path, verify_crc=True) == payloads


@pytest.mark.skipif(not HAS_TF, reason="needs tensorflow for golden test")
def test_tfrecord_readable_by_tf(tmp_path):
    path = str(tmp_path / "x.tfrecord")
    payloads = [b"abc", b"defgh" * 50]
    with tfrecord.RecordWriter(path) as w:
        for p in payloads:
            w.write(p)
    got = [r.numpy() for r in tf.data.TFRecordDataset(path)]
    assert got == payloads


@pytest.mark.skipif(not HAS_TF, reason="needs tensorflow for golden test")
def test_tfrecord_read_tf_written(tmp_path):
    path = str(tmp_path / "y.tfrecord")
    payloads = [b"one", b"two" * 99]
    with tf.io.TFRecordWriter(path) as w:
        for p in payloads:
            w.write(p)
    assert tfrecord.read_records(path, verify_crc=True) == payloads


# ---------------------------------------------------------------------------
# SequenceExample codec
# ---------------------------------------------------------------------------

CONTEXT = {
    "length": [3],
    "group": [b"poster"],
    "scale": [1.5],
}
FEATURE_LISTS = {
    "type": [[b"a"], [b"b"], [b"a"]],
    "left": [[0.1], [0.25], [0.75]],
    "color": [[1, 2, 3], [4, 5, 6], [7, 8, 9]],
    "emb": [[0.0] * 8, [1.0] * 8, [-1.0] * 8],
}


def test_sequence_example_roundtrip():
    buf = example_proto.encode_sequence_example(CONTEXT, FEATURE_LISTS)
    ctx, fl = example_proto.decode_sequence_example(buf)
    assert ctx["length"] == [3]
    assert ctx["group"] == [b"poster"]
    assert ctx["scale"] == pytest.approx([1.5])
    assert fl["type"] == [[b"a"], [b"b"], [b"a"]]
    assert fl["color"] == [[1, 2, 3], [4, 5, 6], [7, 8, 9]]
    assert [r for r in fl["left"]] == [
        pytest.approx([0.1]),
        pytest.approx([0.25]),
        pytest.approx([0.75]),
    ]


@pytest.mark.skipif(not HAS_TF, reason="needs tensorflow for golden test")
def test_sequence_example_tf_parses_ours():
    buf = example_proto.encode_sequence_example(CONTEXT, FEATURE_LISTS)
    ctx, seq, _ = tf.io.parse_sequence_example(
        tf.constant(buf),
        {
            "length": tf.io.FixedLenFeature((1,), tf.int64),
            "group": tf.io.FixedLenFeature((1,), tf.string),
            "scale": tf.io.FixedLenFeature((1,), tf.float32),
        },
        {
            "type": tf.io.FixedLenSequenceFeature((1,), tf.string),
            "left": tf.io.FixedLenSequenceFeature((1,), tf.float32),
            "color": tf.io.FixedLenSequenceFeature((3,), tf.int64),
            "emb": tf.io.FixedLenSequenceFeature((8,), tf.float32),
        },
    )
    assert ctx["length"].numpy().tolist() == [3]
    assert ctx["group"].numpy().tolist() == [b"poster"]
    assert seq["color"].numpy().tolist() == [[1, 2, 3], [4, 5, 6], [7, 8, 9]]
    np.testing.assert_allclose(
        seq["left"].numpy().ravel(), [0.1, 0.25, 0.75], rtol=1e-6
    )


@pytest.mark.skipif(not HAS_TF, reason="needs tensorflow for golden test")
def test_sequence_example_we_parse_tf():
    se = tf.train.SequenceExample()
    se.context.feature["length"].int64_list.value.append(2)
    se.context.feature["name"].bytes_list.value.append(b"xyz")
    for v in ([0.5], [0.75]):
        f = se.feature_lists.feature_list["left"].feature.add()
        f.float_list.value.extend(v)
    ctx, fl = example_proto.decode_sequence_example(se.SerializeToString())
    assert ctx["length"] == [2]
    assert ctx["name"] == [b"xyz"]
    assert fl["left"] == [pytest.approx([0.5]), pytest.approx([0.75])]


def test_negative_int64_roundtrip():
    buf = example_proto.encode_sequence_example({"v": [-5, 7]}, {})
    ctx, _ = example_proto.decode_sequence_example(buf)
    assert ctx["v"] == [-5, 7]


# ---------------------------------------------------------------------------
# Vocab / Discretizer semantics (pinned against keras behavior)
# ---------------------------------------------------------------------------

def test_vocab_mask_token_layout():
    # StringLookup(vocabulary, mask_token='', num_oov_indices=0):
    # index 0 is '', then the vocab (validated against TF 2.x).
    v = Vocab(["svgElement", "textElement"], mask_token="", num_oov_indices=0)
    assert v.tokens == ["", "svgElement", "textElement"]
    assert v.lookup(np.array(["", "svgElement", "textElement"])).tolist() == [
        0,
        1,
        2,
    ]


def test_vocab_oov_layout():
    v = Vocab(["a", "b"], mask_token=None, num_oov_indices=1)
    assert v.tokens == ["[UNK]", "a", "b"]
    assert v.lookup(np.array(["zzz", "a", "b"])).tolist() == [0, 1, 2]


def test_vocab_int_range():
    v = Vocab(list(range(1, 51)), mask_token=None, num_oov_indices=0)
    assert len(v) == 50
    assert v.lookup(np.array([1, 25, 50])).tolist() == [0, 24, 49]


def test_vocab_unknown_without_oov_raises():
    v = Vocab(["a"], num_oov_indices=0)
    with pytest.raises(KeyError):
        v.lookup(np.array(["nope"]))


def test_discretizer_buckets():
    d = Discretizer(0.0, 1.0, 64)
    x = np.array([0.0, 0.015, 0.016, 0.5, 0.99, 1.0, 1.5, -0.1])
    # Golden values from keras Discretization on the same boundaries.
    assert d(x).tolist() == [0, 0, 1, 31, 62, 63, 63, 0]
    assert d.num_bins == 64


def test_discretizer_inverse():
    d = Discretizer(0.0, 1.0, 64)
    np.testing.assert_allclose(d.inverse(np.array([0, 63])), [0.0, 1.0])
    d2 = Discretizer(0, 255, 16)
    np.testing.assert_allclose(d2.inverse(np.array([0, 15])), [0.0, 255.0])


@pytest.mark.skipif(not HAS_TF, reason="needs tensorflow for golden test")
def test_discretizer_matches_keras_on_random_values(rng):
    from tensorflow.keras import layers as L

    for bins, lo, hi in [(64, 0.0, 1.0), (8, 0.0, 1.0), (16, 0.0, 255.0)]:
        ours = Discretizer(lo, hi, bins)
        theirs = L.Discretization(list(np.linspace(lo, hi, bins))[1:])
        x = rng.uniform(lo - 0.1 * hi, hi * 1.1, size=500).astype(np.float32)
        np.testing.assert_array_equal(
            ours(x), theirs(tf.constant(x[:, None])).numpy().ravel()
        )


# ---------------------------------------------------------------------------
# DatasetSpec / Schema over the synthetic data
# ---------------------------------------------------------------------------

def test_crello_schema(crello_spec):
    schema = crello_spec.schema
    assert schema.dataset_name == "crello"
    assert schema.max_length == 50
    assert schema["left"].input_dim == 64
    assert schema["opacity"].input_dim == 8
    assert schema["color"].input_dim == 16 and schema["color"].shape == (3,)
    assert schema["length"].input_dim == 50
    assert schema["image_embedding"].kind == "numerical"
    assert schema["image_embedding"].shape == (512,)
    assert schema["id"].demo_only and schema["uuid"].demo_only
    # type vocab: '' mask token + 6 synthetic types
    assert schema["type"].input_dim == 7
    assert schema["type"].primary_label == 0
    # font_family: [UNK] + 12 fonts (rare ones filtered by min_freq=500)
    assert schema["font_family"].input_dim == 13
    # loss_condition over type vocab incl. the mask token at index 0
    cond = schema["image_embedding"].loss_condition
    assert cond.key == "type"
    assert len(cond.mask) == 7 and cond.mask[0] is False
    assert schema.task_names == ("random", "elem", "type", "pos", "attr", "img", "txt")


def test_rico_schema(rico_spec):
    schema = rico_spec.schema
    assert schema.dataset_name == "rico"
    assert schema["clickable"].input_dim == 2
    assert schema["type"].input_dim == 11  # [UNK] + 10 types
    assert schema.task_names == ("random", "elem", "type", "pos", "attr")
    assert schema.sort_pos


def test_decode_batch_shapes(crello_spec, crello_dir):
    loader = crello_spec.make_dataset("train", batch_size=8)
    batch = next(iter(loader))
    assert batch["left"].shape == (8, 50, 1)
    assert batch["color"].shape == (8, 50, 3)
    assert batch["image_embedding"].shape == (8, 50, 512)
    assert batch["length"].shape == (8, 1)
    assert batch["left"].dtype == np.int32
    assert batch["image_embedding"].dtype == np.float32
    # length is zero-based after lookup
    assert batch["length"].min() >= 0 and batch["length"].max() <= 49


def test_loader_epoch_coverage_and_padding(crello_spec):
    loader = crello_spec.make_dataset("val", batch_size=10, shuffle=False)
    batches = list(iter(loader))
    assert len(batches) == len(loader) == 4  # 32 records / 10
    assert batches[-1][NUM_VALID_KEY] == 2
    assert batches[-1]["left"].shape[0] == 10  # padded to full batch


def test_loader_shuffle_determinism(crello_spec):
    a = next(iter(crello_spec.make_dataset("train", batch_size=8, shuffle=True, seed=7)))
    b = next(iter(crello_spec.make_dataset("train", batch_size=8, shuffle=True, seed=7)))
    c = next(iter(crello_spec.make_dataset("train", batch_size=8, shuffle=True, seed=8)))
    np.testing.assert_array_equal(a["left"], b["left"])
    assert not np.array_equal(a["left"], c["left"])


def test_unbatch_roundtrip(crello_spec):
    batch = next(iter(crello_spec.make_dataset("test", batch_size=4)))
    items = crello_spec.unbatch(batch)
    assert len(items) == 4
    item = items[0]
    n = len(item["elements"])
    assert n == int(batch["length"][0, 0]) + 1
    el = item["elements"][0]
    assert isinstance(el["type"], str)
    assert 0.0 <= el["left"] <= 1.0
    assert len(el["color"]) == 3
    assert item["group"] in ("socialMedia", "poster", "banner", "card")


def test_unbatch_from_logits(crello_spec):
    batch = next(iter(crello_spec.make_dataset("test", batch_size=2)))
    # Fake logits for a categorical field: one-hot of the labels.
    onehot = np.eye(64, dtype=np.float32)[batch["left"][..., 0]][:, :, None, :]
    batch2 = dict(batch)
    batch2["left"] = onehot
    items = crello_spec.unbatch(batch2)
    ref = crello_spec.unbatch(batch)
    for a, b in zip(items, ref):
        for ea, eb in zip(a["elements"], b["elements"]):
            assert ea["left"] == eb["left"]
