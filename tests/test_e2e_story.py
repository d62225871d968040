"""End-to-end curation story: the whole engine composed the way a
production pipeline would chain it —

    validate (data-quality gate)
    -> normalize (unicode pre-hash stage)
    -> curate (length/quality/repetition gates + survivor exact dedup)
    -> training-shard export (deterministic order)

asserting cross-stage invariants and byte-determinism across
partitionings."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from dedup.corpus import normalize_text
from dedup.curate import CurateConfig, curate
from dedup.sinks import write_training_shards
from dedup.validate import validate_rows


def _corpus():
    import numpy as np
    rng = np.random.default_rng(17)
    import itertools
    letters = "abcdefghijklmnopqrstuvwxyz"
    rare = ["".join(c) for c in itertools.islice(
        itertools.product(letters, repeat=3), 200)]
    # weave in stopwords so the quality gates see natural-prose ratios
    words = rare + ["the", "and", "of", "to", "in", "is", "it",
                    "that", "for", "was"] * 10
    rows = []
    for i in range(240):
        n = int(rng.integers(40, 120))
        rows.append({"doc_id": i,
                     "text": " ".join(rng.choice(words, size=n))})
    # planted pathologies the funnel must handle
    rows[3]["text"] = rows[1]["text"]            # exact dup
    rows[5]["text"] = "x"                        # too short
    rows[7]["text"] = "Café  du   Mondé " * 20  # NFC work
    rows[9]["text"] = None                       # null
    return rows


def test_end_to_end_curation_story(tmp_path):
    rows = _corpus()
    ds = ray.data.from_items(rows).repartition(5)

    # 1. validation gate: the report sees the planted null
    report = validate_rows(ds, [
        {"name": "text_not_null", "kind": "not_null", "col": "text"},
        {"name": "id_unique", "kind": "unique", "col": "doc_id"},
    ]).to_pylist()
    by = {r["rule"]: r for r in report}
    assert by["text_not_null"]["n_violations"] == 1
    assert by["text_not_null"]["examples"] == "9"
    assert by["id_unique"]["n_violations"] == 0

    # 2. unicode normalization (NFC + whitespace collapse), then
    # 3. curation funnel over the normalized text
    norm = normalize_text(ds, text_col="text")
    assert "text_norm" in norm.schema().names
    curated = curate(
        norm.map_batches(
            lambda t: t.rename_columns(["doc_id", "text"]),
            batch_format="pyarrow"),
        CurateConfig(min_chars=20)).materialize()
    cdf = curated.to_pandas().set_index("doc_id")
    assert cdf.loc[3, "verdict"] == "dup"       # exact twin of doc 1
    assert cdf.loc[1, "verdict"] == "kept"      # min-id keeper survives
    assert cdf.loc[5, "verdict"] != "kept"      # too short: gated out
    assert cdf.loc[9, "verdict"] != "kept"      # null: gated out

    # 4. shard export of the kept docs, deterministic training order
    kept_ids = set(cdf[cdf["verdict"] == "kept"].index)
    kept = ray.data.from_items(
        [r for r in rows if r["doc_id"] in kept_ids])
    out = write_training_shards(kept.repartition(4),
                                str(tmp_path / "shards"),
                                docs_per_shard=50)
    shard_dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    got_ids = []
    for d in shard_dirs:
        t = pq.read_table(os.path.join(out, d))
        got_ids.extend(t["doc_id"].to_pylist())
    assert sorted(got_ids) == sorted(kept_ids)   # exactly the kept docs
    n_full = len(kept_ids) // 50
    assert len(shard_dirs) == n_full + (1 if len(kept_ids) % 50 else 0)

    # determinism: the same story at a different partitioning is
    # byte-identical end to end
    ds2 = ray.data.from_items(rows).repartition(11)
    norm2 = normalize_text(ds2, text_col="text")
    curated2 = curate(
        norm2.map_batches(
            lambda t: t.rename_columns(["doc_id", "text"]),
            batch_format="pyarrow"),
        CurateConfig(min_chars=20))
    cdf2 = curated2.to_pandas().set_index("doc_id")
    assert cdf.sort_index().equals(cdf2.sort_index())
