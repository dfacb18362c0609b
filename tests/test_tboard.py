"""TensorBoard event-writer tests (golden vs TF's summary_iterator)."""

import glob
import os

import pytest

from flexdm_tpu.utils.tboard import SummaryWriter

try:
    import tensorflow as tf

    HAS_TF = True
except Exception:  # pragma: no cover
    HAS_TF = False


def test_writer_creates_event_file(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.scalars(1, {"loss": 3.5, "total_score": 0.25})
    w.scalars(2, {"loss": 2.5, "skipme": float("nan")})
    w.close()
    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert len(files) == 1
    assert os.path.getsize(files[0]) > 0


@pytest.mark.skipif(not HAS_TF, reason="needs tensorflow for golden read")
def test_tf_reads_our_events(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.scalars(10, {"loss": 3.25, "val_total_score": 0.5})
    w.scalars(20, {"loss": 1.5})
    w.close()
    path = glob.glob(str(tmp_path / "events.out.tfevents.*"))[0]

    seen = {}
    versions = []
    for event in tf.compat.v1.train.summary_iterator(path):
        if event.file_version:
            versions.append(event.file_version)
        for value in event.summary.value:
            seen[(event.step, value.tag)] = value.simple_value
    assert versions == ["brain.Event:2"]
    assert seen[(10, "loss")] == pytest.approx(3.25)
    assert seen[(10, "val_total_score")] == pytest.approx(0.5)
    assert seen[(20, "loss")] == pytest.approx(1.5)
