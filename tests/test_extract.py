"""Byte-identical extract invariant (MainViewModel.cs:1094-1146 analogue;
BASELINE.json input_hint)."""

from dedup.extract import extract_text
from dedup.synth import generate_pages


def test_extract_invariant_on_synth_corpus():
    pages, _ = generate_pages(300, seed=11)
    htmls = pages["html"].to_pylist()
    texts = pages["text"].to_pylist()
    for h, t in zip(htmls, texts):
        if t is None:
            continue
        assert extract_text(h) == t


def test_extract_edge_cases():
    assert extract_text(b"\xff\xfe") == ""
    assert extract_text("<html><body><p>a  b</p></body></html>") == "a b"
    assert extract_text("<p>x&amp;y &lt;z&gt;</p>") == "x&y <z>"
    assert extract_text("<head><title>T</title></head><p>body</p>") == "body"
    assert extract_text("<header>H</header><p>body</p>") == "body"
    assert extract_text("<script>var x=1;</script>ok") == "ok"
    assert extract_text("<!-- c -->ok") == "ok"
