"""TF-checkpoint converter mapping rules + raw crello schema ingestion."""

import json

import numpy as np
import pytest

from tools.convert_tf_checkpoint import convert, map_variable


def test_map_variable_rules():
    cases = {
        "model/encoder/input_layer/type/embeddings/.ATTRIBUTES/VARIABLE_VALUE":
            ("encoder", "input_type", "embedding"),
        "model/encoder/input_layer/image_embedding_special/embeddings":
            ("encoder", "input_image_embedding_special", "embedding"),
        "model/encoder/input_layer/image_embedding/kernel":
            ("encoder", "input_image_embedding", "kernel"),
        "model/blocks/seq2seq/seq2seq_0/attn/dense_query/kernel":
            ("blocks", "seq2seq_0", "attn", "query", "kernel"),
        "model/blocks/seq2seq/seq2seq_3/attn/combine_heads/bias":
            ("blocks", "seq2seq_3", "attn", "out", "bias"),
        "model/blocks/seq2seq/seq2seq_1/mlp/layers/0/kernel":
            ("blocks", "seq2seq_1", "mlp_0", "kernel"),
        "model/blocks/seq2seq/seq2seq_2/norm1/gamma":
            ("blocks", "seq2seq_2", "norm1", "scale"),
        "model/blocks/seq2seq/seq2seq_2/norm2/beta":
            ("blocks", "seq2seq_2", "norm2", "bias"),
        "model/decoder/decoders/left/kernel":
            ("decoder", "decoder_left", "kernel"),
        "model/decoder/decoders/text_embedding/bias":
            ("decoder", "decoder_text_embedding", "bias"),
    }
    for tf_path, expect in cases.items():
        assert map_variable(tf_path) == expect, tf_path
    assert map_variable("optimizer/iter") is None


def test_convert_places_variables(rico_spec):
    import jax
    from flexdm_tpu.data import split_device_batch
    from flexdm_tpu.models import MFPModel
    from flexdm_tpu.train import init_params

    spec = rico_spec
    model = MFPModel(spec.schema, latent_dim=16, num_blocks=1, num_heads=2,
                     attention_impl="xla")
    sample = split_device_batch(next(iter(spec.make_dataset("test", batch_size=2))))
    template = init_params(model, sample, seed=0)

    q_shape = template["params"]["blocks"]["seq2seq_0"]["attn"]["query"][
        "kernel"
    ].shape
    fake = {
        "model/blocks/seq2seq/seq2seq_0/attn/dense_query/kernel":
            np.full(q_shape, 3.5, np.float32),
        "model/unrelated/thing": np.zeros((2,), np.float32),
    }
    params, report = convert(fake, template)
    got = params["params"]["blocks"]["seq2seq_0"]["attn"]["query"]["kernel"]
    assert float(np.asarray(got)[0, 0]) == 3.5
    assert "model/unrelated/thing" in report["unmatched_tf"]
    assert len(report["unfilled"]) > 0  # everything else untouched


def test_convert_rejects_shape_mismatch(rico_spec):
    from flexdm_tpu.data import split_device_batch
    from flexdm_tpu.models import MFPModel
    from flexdm_tpu.train import init_params

    model = MFPModel(rico_spec.schema, latent_dim=16, num_blocks=1,
                     num_heads=2, attention_impl="xla")
    sample = split_device_batch(
        next(iter(rico_spec.make_dataset("test", batch_size=2)))
    )
    template = init_params(model, sample, seed=0)
    bad = {"model/blocks/seq2seq/seq2seq_0/attn/dense_query/kernel":
           np.zeros((3, 3), np.float32)}
    with pytest.raises(ValueError):
        convert(bad, template)


# ---------------------------------------------------------------------------
# Raw crello template schema
# ---------------------------------------------------------------------------

RAW_TEMPLATE = {
    "id": "abc123",
    "templateType": "regular",
    "width": 1080,
    "height": 1080,
    "group": "socialMedia",
    "format": "instagramPost",
    "template": [
        {
            "elements": [
                {"type": "coloredBackground", "uuid": "u0", "width": 1.0,
                 "height": 1.0, "opacity": 1.0, "color": "#ff0000",
                 "position": {"x": 0, "y": 0}},
                {"type": "textElement", "uuid": "u1", "width": 0.4,
                 "height": 0.1, "opacity": 1.0, "text": "Hello",
                 "font": "Roboto", "innerId": 7, "left": 0.1, "top": 0.2,
                 "someFutureField": 42},
                {"type": "groupElement", "uuid": "u2", "innerId": 8,
                 "elements": [
                     {"type": "svgElement", "uuid": "u3", "width": 0.1,
                      "height": 0.1, "position": {"x": 0.5, "y": 0.5},
                      "colors": []}
                 ]},
            ]
        }
    ],
}


def test_template_from_dict_and_iter():
    from flexdm_tpu.data.crello import (
        ColoredBackground,
        GroupElement,
        SVGElement,
        Template,
        TextElement,
    )

    tpl = Template.from_dict(RAW_TEMPLATE)
    assert tpl.id == "abc123"
    els = list(tpl.iter_elements())
    assert len(els) == 4  # 3 top-level + 1 nested in the group
    assert isinstance(els[0], ColoredBackground)
    assert isinstance(els[1], TextElement)
    assert isinstance(els[2], GroupElement)
    assert isinstance(els[3], SVGElement)
    assert els[1].is_v2 and not els[0].is_v2
    assert els[1].x == 0.1 and els[0].x == 0
    assert els[1].extra["someFutureField"] == 42  # tolerant to drift
    assert "crello.com" in tpl.url


def test_template_load_filters(tmp_path):
    from flexdm_tpu.data.crello import Template

    bad_video = dict(RAW_TEMPLATE, id="vid",
                     template=[{"elements": [{"type": "videoElement"}]}])
    non_regular = dict(RAW_TEMPLATE, id="nr", templateType="draft")
    path = tmp_path / "dump.jsonl"
    with open(path, "w") as f:
        for t in (RAW_TEMPLATE, bad_video, non_regular):
            f.write(json.dumps(t) + "\n")
    templates = Template.load(str(path))
    assert [t.id for t in templates] == ["abc123"]
    raw = Template.load(str(path), raw_format=True)
    assert len(raw) == 3
