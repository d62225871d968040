"""Multi-format sources (dedup/ingest.py:read_input): the same corpus
stored as parquet, CSV and JSONL must produce byte-identical dedup
assignments, with format auto-sniffed from file extensions and columns
pruned at (or immediately after) the parse."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyarrow import csv as pacsv

import ray.data

from dedup.config import DedupConfig
from dedup.ingest import _infer_format, read_input
from dedup.pipeline import run_dedup
from dedup.synth import generate_pages


def _write_formats(tmp_path):
    pages, _ = generate_pages(400, seed=21)
    t = pages.select(["url", "text"])
    # an extra column the pipeline must NOT load
    t = t.append_column("junk", pa.array(["x" * 50] * t.num_rows))
    pdir = tmp_path / "p"
    cdir = tmp_path / "c"
    jdir = tmp_path / "j"
    for d in (pdir, cdir, jdir):
        os.makedirs(d)
    pq.write_table(t, str(pdir / "part-0.parquet"))
    pacsv.write_csv(t, str(cdir / "part-0.csv"))
    with open(jdir / "part-0.jsonl", "w") as fh:
        for row in t.to_pylist():
            fh.write(json.dumps(row) + "\n")
    return str(pdir), str(cdir), str(jdir)


def test_infer_format(tmp_path):
    pdir, cdir, jdir = _write_formats(tmp_path)
    assert _infer_format(pdir) == "parquet"
    assert _infer_format(cdir) == "csv"
    assert _infer_format(jdir) == "jsonl"
    assert _infer_format(str(tmp_path / "c" / "part-0.csv")) == "csv"


def test_formats_identical_assignments(tmp_path):
    pdir, cdir, jdir = _write_formats(tmp_path)
    cfg = DedupConfig(near=False, simhash=False, substring=False)
    outs = {}
    for d in (pdir, cdir, jdir):
        ds = read_input(d, cfg)
        assert set(ds.schema().names) == {"url", "text"}  # junk pruned
        outs[d] = run_dedup(ds, cfg, check_html=False) \
            .sort("url").to_pandas().reset_index(drop=True)
    import pandas.testing as pdt
    pdt.assert_frame_equal(outs[cdir], outs[pdir])
    pdt.assert_frame_equal(outs[jdir], outs[pdir])


def test_csv_quoted_newlines_and_null(tmp_path):
    """CSV values containing newlines survive the parse; empty text
    parses as null and lands in the error state (CSV cannot represent
    null vs empty — documented mapping)."""
    t = pa.table({
        "url": ["https://a.example/1", "https://a.example/2",
                "https://a.example/3"],
        "text": ["line one\nline two, with comma " + "x" * 80,
                 None,
                 "plain " + "y" * 80],
    })
    d = tmp_path / "csv"
    os.makedirs(d)
    pacsv.write_csv(t, str(d / "f.csv"))
    cfg = DedupConfig(near=False, simhash=False, substring=False)
    ds = read_input(str(d), cfg)
    out = run_dedup(ds, cfg, check_html=False).sort("url").to_pandas()
    assert list(out["state"]) == ["unique", "error", "unique"]


def test_needed_columns_conditional():
    """ts/lang columns are read only when a key conjunct or keeper
    policy consumes them — pruning contract for wide corpora."""
    from dedup.config import DedupConfig
    from dedup.ingest import needed_columns
    base = DedupConfig(near=False, simhash=False, substring=False)
    assert needed_columns(base) == ["url", "text"]
    assert "warc_ts" in needed_columns(base.with_(key_ts=True))
    assert "warc_ts" in needed_columns(base.with_(keeper="newest"))
    assert "lang" in needed_columns(base.with_(key_lang=True))
    assert needed_columns(base, has_html=True)[-1] == "html"
