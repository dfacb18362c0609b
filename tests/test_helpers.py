"""Helper-layer tests: SVG builders, retrieval, demo page."""

import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from flexdm_tpu.helpers import SVGBuilder, make_colormap
from flexdm_tpu.helpers.retrieve import ImageRetriever, TextRetriever


def sample_doc():
    return {
        "canvas_width": 200,
        "canvas_height": 100,
        "elements": [
            {
                "type": "coloredBackground",
                "left": 0.0, "top": 0.0, "width": 1.0, "height": 1.0,
                "opacity": 1.0, "color": [200, 100, 50],
            },
            {
                "type": "textElement",
                "left": 0.1, "top": 0.2, "width": 0.5, "height": 0.1,
                "opacity": 0.9, "color": [0, 0, 0], "font_family": "Font1",
            },
        ],
    }


def test_svg_builder_type_colormap():
    vocab = ["", "coloredBackground", "textElement"]
    builder = SVGBuilder(key="type", vocab=vocab, max_width=100)
    svg = builder(sample_doc())
    root = ET.fromstring(svg)
    assert root.get("width") == "100.0"  # 200 clamped to max_width
    assert root.get("height") == "50.0"  # aspect preserved
    rects = root.findall(".//{http://www.w3.org/2000/svg}rect")
    assert len(rects) >= 2
    assert root.get("viewBox") == "0 0 1 1"


def test_svg_builder_color_key():
    builder = SVGBuilder(key="color", colormap={})
    svg = builder(sample_doc())
    assert "rgb(200,100,50)" in svg


def test_svg_builder_text_rendering():
    builder = SVGBuilder(key="type", vocab=["textElement"], render_text=True)
    svg = builder(sample_doc())
    root = ET.fromstring(svg)
    texts = root.findall(".//{http://www.w3.org/2000/svg}text")
    assert len(texts) == 1
    assert "TEXT" in texts[0].text
    assert texts[0].get("font-family") == "Font1"


def test_rich_text_spans():
    from flexdm_tpu.helpers.rich_text import char_styles, iter_spans, split_lines

    text = "Hello\nWorld"
    element = {
        "text": text,
        "colorMap": [
            {"startIndex": 0, "endIndex": 4, "value": "#ff0000"},
            {"startIndex": 6, "endIndex": 10, "value": "#0000ff"},
        ],
        "boldMap": [{"startIndex": 0, "endIndex": 1, "value": True}],
        "italicMap": [],
    }
    styles = char_styles(element, len(text))
    lines = split_lines(text, None)
    assert lines == [(0, 5), (6, 11)]
    spans0 = list(iter_spans(text, styles, *lines[0]))
    # line 1: "He" bold red, "llo" red
    assert [s["text"] for s in spans0] == ["He", "llo"]
    assert spans0[0]["bold"] and not spans0[1]["bold"]
    assert spans0[0]["color"] == "#ff0000"
    spans1 = list(iter_spans(text, styles, *lines[1]))
    assert spans1[0]["text"] == "World" and spans1[0]["color"] == "#0000ff"


def test_rich_text_svg_rendering():
    builder = SVGBuilder(key="type", vocab=["textElement"], render_text=True)
    doc = sample_doc()
    doc["elements"][1]["raw"] = {
        "text": "Hi\nthere",
        "colorMap": [{"startIndex": 0, "endIndex": 7, "value": "#123456"}],
        "boldMap": [],
        "italicMap": [],
        "capitalize": True,
    }
    svg = builder(doc)
    root = ET.fromstring(svg)
    tspans = root.findall(".//{http://www.w3.org/2000/svg}tspan")
    assert len(tspans) >= 2
    assert tspans[0].get("fill") == "#123456"
    assert tspans[0].text == "HI"  # capitalized


def test_make_colormap_distinct():
    cmap = make_colormap(["a", "b", "c"])
    assert len(set(cmap.values())) == 3


@pytest.fixture(scope="module")
def store_dir(tmp_path_factory):
    """Synthetic crello-images / crello-texts store + assets."""
    from flexdm_tpu.data import example_proto, tfrecord

    root = tmp_path_factory.mktemp("store")
    rng = np.random.default_rng(0)
    hashes = [f"hash{i}" for i in range(8)]
    embs = rng.normal(size=(8, 512)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=-1, keepdims=True)

    # One shard containing all entries for each store, in its own dir.
    img_dir = root / "images_store"
    txt_dir = root / "texts_store"
    for d, key, value in (
        (img_dir, "image_hash", "image_embedding"),
        (txt_dir, "text_hash", "text_embedding"),
    ):
        os.makedirs(d, exist_ok=True)
        with tfrecord.RecordWriter(str(d / "train-00000-of-00001.tfrecord")) as w:
            fl = {
                key: [[h.encode()] for h in hashes],
                value: [[float(x) for x in row] for row in embs],
            }
            w.write(example_proto.encode_sequence_example({}, fl))
        with open(d / "count.json", "w") as f:
            f.write('{"train": 1}')
    # assets
    os.makedirs(img_dir / "images", exist_ok=True)
    os.makedirs(txt_dir / "texts", exist_ok=True)
    png = bytes.fromhex("89504e470d0a1a0a") + b"\x00" * 8  # fake png bytes
    for i, h in enumerate(hashes):
        with open(img_dir / "images" / f"{h}.png", "wb") as f:
            f.write(png)
        with open(txt_dir / "texts" / f"{h}.txt", "w") as f:
            f.write(f"text number {i}")
    return str(img_dir), str(txt_dir), hashes, embs


def test_image_retriever_exact_match(store_dir):
    img_dir, _, hashes, embs = store_dir
    r = ImageRetriever(img_dir)
    r.build()
    url = r.search(embs[3])
    assert url.startswith("data:image/png;base64,")


def test_text_retriever_exact_and_topk(store_dir):
    _, txt_dir, hashes, embs = store_dir
    r = TextRetriever(txt_dir)
    r.build()
    assert r.search(embs[5]) == "text number 5"
    # perturbed query still lands on the same neighbor
    q = embs[5] + 0.01 * np.random.default_rng(0).normal(size=512).astype(np.float32)
    assert r.search(q) == "text number 5"
    top2 = r.search(embs[5], k=2)
    assert top2[0] == "text number 5" and len(top2) == 2


@pytest.mark.slow
def test_demo_page(tmp_path, rico_dir):
    from flexdm_tpu.cli import train_main
    from flexdm_tpu.demo import run_demo

    job = str(tmp_path / "job")
    train_main([
        "--dataset_name", "rico", "--data_dir", rico_dir, "--job-dir", job,
        "--latent_dim", "32", "--num_blocks", "1", "--batch_size", "16",
        "--num_epochs", "1", "--validation_freq", "1",
        "--attention_impl", "xla", "--num_devices", "1",
    ])
    out = run_demo(job, task="pos", num_examples=2, out_path=str(tmp_path / "d.html"))
    page = open(out).read()
    assert "<svg" in page and "prediction" in page
    out2 = run_demo(job, task="elem", num_examples=2, num_iter=2,
                    out_path=str(tmp_path / "d2.html"))
    assert os.path.exists(out2)
    # pinned masked element (deterministic elem demo)
    out3 = run_demo(job, task="elem", num_examples=2, element=0,
                    out_path=str(tmp_path / "d3.html"))
    assert os.path.exists(out3)
    with pytest.raises(ValueError):
        run_demo(job, task="pos", num_examples=2, element=0)


def test_load_fonts_css_and_embedding(tmp_path):
    """fonts.css from a data dir is inlined as a <style> block in every SVG
    (reference svg_crello.py:130-147)."""
    from flexdm_tpu.helpers.svg import load_fonts_css

    css = (
        "@font-face {\n  font-family: Font1;\n"
        "  src: url(https://example.com/font1.ttf)\n}\n"
    )
    (tmp_path / "fonts.css").write_text(css)
    # file path and directory path both resolve
    assert load_fonts_css(str(tmp_path / "fonts.css")) == css
    assert load_fonts_css(str(tmp_path)) == css
    assert load_fonts_css(str(tmp_path / "missing")) is None

    builder = SVGBuilder(
        key="type", vocab=["", "coloredBackground", "textElement"],
        render_text=True, fonts_css=load_fonts_css(str(tmp_path)),
    )
    svg = builder(sample_doc())
    root = ET.fromstring(svg)
    styles = root.findall(".//{http://www.w3.org/2000/svg}style")
    assert styles and "Font1" in styles[0].text


def test_reference_fonts_css_parses():
    """The fonts.css shipped with the reference tree loads cleanly (the
    real data release carries the same file)."""
    import os

    from flexdm_tpu.helpers.svg import load_fonts_css

    ref = "/root/reference/src/mfp/mfp/data/crello"
    if not os.path.exists(os.path.join(ref, "fonts.css")):
        import pytest

        pytest.skip("reference fonts.css unavailable")
    css = load_fonts_css(ref)
    assert css.count("@font-face") > 500
    builder = SVGBuilder(key="type", vocab=["textElement"], fonts_css=css)
    svg = builder(sample_doc())
    assert "@font-face" in svg
