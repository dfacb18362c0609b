"""Offline dataset builder: raw JSONL templates -> training data dir."""

import json

import numpy as np
import pytest

from tests.test_converter_and_schema import RAW_TEMPLATE
from tools.build_crello_dataset import (
    _parse_color,
    assign_split,
    main as build_main,
    template_to_example,
)


def _raw(i, n_elements=3, group="socialMedia"):
    tpl = json.loads(json.dumps(RAW_TEMPLATE))
    tpl["id"] = f"tpl{i:04d}"
    tpl["group"] = group
    # vary text font for vocab
    tpl["template"][0]["elements"][1]["font"] = f"Font{i % 3}"
    return tpl


def test_parse_color():
    assert _parse_color("#ff0080") == [255, 0, 128]
    assert _parse_color([1, 2, 3]) == [1, 2, 3]
    assert _parse_color({"r": 9, "g": 8, "b": 7}) == [9, 8, 7]
    assert _parse_color(None) == [0, 0, 0]
    assert _parse_color("junk") == [0, 0, 0]


def test_template_to_example():
    from flexdm_tpu.data.crello import Template

    ex = template_to_example(Template.from_dict(RAW_TEMPLATE))
    ctx, fl = ex["context"], ex["feature_lists"]
    # group children flattened, group container itself dropped
    assert ctx["length"] == [3]
    assert len(fl["type"]) == 3
    assert fl["type"][0] == [b"coloredBackground"]
    assert fl["color"][0] == [255, 0, 0]  # '#ff0000'
    assert 0.0 <= fl["left"][1][0] <= 1.0
    assert fl["font_family"][1] == [b"Roboto"]
    assert len(fl["image_embedding"][0]) == 512


def test_assign_split_deterministic():
    a = assign_split("doc1", 0.1, 0.1)
    assert assign_split("doc1", 0.1, 0.1) == a
    splits = {assign_split(f"d{i}", 0.2, 0.2) for i in range(200)}
    assert splits == {"train", "val", "test"}


def test_build_end_to_end(tmp_path):
    raw_path = tmp_path / "dump.jsonl"
    with open(raw_path, "w") as f:
        for i in range(60):
            f.write(json.dumps(_raw(i)) + "\n")
    out = str(tmp_path / "data")
    build_main(["--input", str(raw_path), "--out", out,
                "--shards", "2", "--val-frac", "0.2", "--test-frac", "0.2"])

    counts = json.load(open(out + "/count.json"))
    assert sum(counts.values()) == 60
    vocab = json.load(open(out + "/vocabulary.json"))
    assert vocab["type"]["textElement"] == 60
    assert set(vocab["font_family"]) == {"Font0", "Font1", "Font2"}

    # The built directory round-trips through the real pipeline.
    from flexdm_tpu.data import DatasetSpec

    spec = DatasetSpec("crello", out, batch_size=4)
    batch = next(iter(spec.make_dataset("train", batch_size=4)))
    assert batch["left"].shape == (4, 50, 1)
    assert batch["length"].max() <= 49
    items = spec.unbatch(batch)
    assert items[0]["elements"][0]["type"] in (
        "coloredBackground", "textElement", "svgElement"
    )
