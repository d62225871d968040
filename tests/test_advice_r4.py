"""Round-4 ADVICE fixes: null keys in windowed_distinct, out-of-band
heavy-hitter totals, sentinel/id validation, source sniffing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray


def test_windowed_distinct_null_keys_counted_in_events_only():
    from dedup.windows import windowed_distinct
    base = pd.Timestamp("2024-01-01")
    rows = []
    for i in range(60):
        rows.append({"ts": base + pd.Timedelta(minutes=i),
                     "user_id": (i % 5) if i % 3 else None})
    t = pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)
    got = windowed_distinct(ray.data.from_arrow(t).repartition(4),
                            key_col="user_id").to_pandas()
    # SQL semantics: count(DISTINCT user_id) excludes nulls,
    # count(*) includes every event
    assert got["window_start"].tolist() == [base]
    assert got["n_distinct"].tolist() == [5]
    assert got["n_events"].tolist() == [60]
    # blocking invariance with nulls present
    got2 = windowed_distinct(ray.data.from_arrow(t).repartition(11),
                             key_col="user_id",
                             num_partitions=3).to_pandas()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  got2.reset_index(drop=True))


def test_grouped_heavy_hitters_nul_suffixed_token():
    from collections import Counter
    from dedup.textstats import grouped_heavy_hitters
    # the hot token ENDS with a NUL byte: under the old in-band
    # endswith-sentinel encoding its candidate row was misparsed as a
    # group total (corrupting totals AND dropping the candidate)
    hot = "boiler\x00"
    rows = []
    for i in range(40):
        rows.append({"doc_id": i, "lang": "en",
                     "text": " ".join([hot] * 3 + [f"w{i}", f"u{i}"])})
    cap = 8
    got = grouped_heavy_hitters(
        ray.data.from_items(rows).repartition(3), group_col="lang",
        capacity=cap).to_pandas()
    c = Counter()
    for r in rows:
        c.update(r["text"].split())
    n_g = sum(c.values())
    want = sorted(((g, t, n) for g, t, n in
                   (("en", t, n) for t, n in c.items()) if n * cap > n_g),
                  key=lambda x: (x[0], -x[2], x[1]))
    assert list(map(tuple, got.itertuples(index=False))) == want
    assert any(t == hot for _, t, _ in want)  # the NUL token survived


def test_minhash_decontaminate_rejects_negative_bench_ids():
    from dedup.minhash import minhash_decontaminate
    train = ray.data.from_items(
        [{"doc_id": i, "text": "alpha beta gamma delta epsilon " * 3}
         for i in range(4)])
    bench = ray.data.from_items(
        [{"doc_id": -1, "text": "alpha beta gamma delta epsilon " * 3}])
    with pytest.raises(ValueError, match="non-negative"):
        minhash_decontaminate(train, bench)


def test_bm25_topk_rejects_string_ids():
    from dedup.textstats import bm25_topk
    ds = ray.data.from_items(
        [{"url": f"http://x/{i}", "text": "a b c"} for i in range(4)])
    with pytest.raises(ValueError, match="integer"):
        bm25_topk(ds, [(0, "a")], id_col="url")


def test_infer_format_recurses_into_hive_partitions(tmp_path):
    from dedup.ingest import _infer_format
    d = tmp_path / "data" / "shard=0"
    d.mkdir(parents=True)
    (d / "part-0.csv").write_text("doc_id,text\n1,hello\n")
    assert _infer_format(str(tmp_path / "data")) == "csv"


def test_csv_missing_column_targeted_error(tmp_path):
    from dedup.config import DedupConfig
    from dedup.ingest import read_input
    p = tmp_path / "in.csv"
    p.write_text("doc_id,text\n1,hello\n")
    cfg = DedupConfig(id_col="doc_id", text_col="text",
                      key_lang=True, lang_col="lang")
    with pytest.raises(ValueError, match="lang"):
        read_input(str(p), cfg, format="csv")
