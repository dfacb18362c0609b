"""Minimal TensorBoard event writer (no TensorFlow dependency).

The reference logs scalars through the keras TensorBoard callback
(reference ``helpers/callbacks.py:44-48``).  Event files are just TFRecord
framing around small ``Event`` protos; both are implemented in this package
already, so scalar summaries can be written directly:

    Event { double wall_time = 1; int64 step = 2;
            oneof { string file_version = 3; Summary summary = 5; } }
    Summary { repeated Value value = 1; }
    Value   { string tag = 1; float simple_value = 2; }

Readable by TensorBoard and by ``tf.compat.v1.train.summary_iterator``
(golden-tested).
"""

from __future__ import annotations

import os
import socket
import struct
import time
from typing import Dict, Optional

from ..data.example_proto import _len_field, _tag, _varint
from ..data.tfrecord import RecordWriter


def _double_field(field: int, value: float) -> bytes:
    return _tag(field, 1) + struct.pack("<d", value)


def _float_field(field: int, value: float) -> bytes:
    return _tag(field, 5) + struct.pack("<f", value)


def _varint_field(field: int, value: int) -> bytes:
    return _tag(field, 0) + _varint(value & ((1 << 64) - 1))


def encode_scalar_event(
    step: int, scalars: Dict[str, float], wall_time: Optional[float] = None
) -> bytes:
    summary = b"".join(
        _len_field(
            1,
            _len_field(1, tag.encode("utf-8")) + _float_field(2, float(v)),
        )
        for tag, v in scalars.items()
    )
    return (
        _double_field(1, wall_time if wall_time is not None else time.time())
        + _varint_field(2, int(step))
        + _len_field(5, summary)
    )


def encode_file_version_event() -> bytes:
    return _double_field(1, time.time()) + _len_field(3, b"brain.Event:2")


class SummaryWriter:
    """Append scalar summaries to a TensorBoard-compatible event file.

    ``enabled=False`` turns every method into a no-op — used by non-primary
    processes in multi-host training so only one host writes events.
    """

    def __init__(self, log_dir: str, enabled: bool = True):
        self._writer = None
        if not enabled:
            return
        os.makedirs(log_dir, exist_ok=True)
        name = f"events.out.tfevents.{int(time.time())}.{socket.gethostname()}"
        self._writer = RecordWriter(os.path.join(log_dir, name))
        self._writer.write(encode_file_version_event())

    def scalars(self, step: int, values: Dict[str, float]) -> None:
        if self._writer is None:
            return
        clean = {
            k: float(v)
            for k, v in values.items()
            if isinstance(v, (int, float)) and v == v
        }
        if clean:
            self._writer.write(encode_scalar_event(step, clean))

    def flush(self) -> None:
        if self._writer is not None:
            self._writer._f.flush()

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
