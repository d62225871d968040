"""Keeper policy (tier dedup): which cluster member survives.

The default keeper='first' is the reference's greedy-scan representative
(MainViewModel.cs:1227-1234); longest/newest/oldest/priority prefer the
best-ranked member and tie-break to the same global order.
"""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from dedup.config import DedupConfig
from dedup.pipeline import run_dedup

BASE = "the quick brown fox jumps over the lazy dog again and again ok " * 2


def _cfg(**kw) -> DedupConfig:
    base = dict(id_col="doc_id", text_col="text", ts_col="", lang_col="",
                near=False, simhash=False, substring=False,
                normalize="c4", min_doc_bytes=32)
    base.update(kw)
    return DedupConfig(**base)


def _corpus():
    # docs 0/1/2 normalize identically but differ in raw length
    # (1 is double-spaced => longest; 2 is upper-cased, same length as 0);
    # 3/4 are an identical pair (all ranks tie); 5 is unique
    return pa.table({
        "doc_id": [0, 1, 2, 3, 4, 5],
        "text": [BASE,
                 BASE.replace(" ", "  "),
                 BASE.upper(),
                 BASE + " tail tail", BASE + " tail tail",
                 "completely different content that stands alone here ok " * 2],
        "ts": [10, 5, 99, 7, 7, 1],
        "tier": [3, 1, 2, 0, 5, 9],
    })


def _run(cfg, **kw):
    out = run_dedup(ray.data.from_arrow(_corpus()), cfg,
                    check_html=False, **kw).sort("doc_id").to_pandas()
    return dict(zip(out["doc_id"], out["state"])), \
        dict(zip(out["doc_id"], out["cluster_id"]))


def test_keeper_first_is_min_order():
    st, cid = _run(_cfg())
    assert st[0] == "keep" and st[1] == "delete" and st[2] == "delete"
    assert cid[0] == cid[1] == cid[2] == 0
    assert st[3] == "keep" and st[4] == "delete" and cid[4] == 3
    assert st[5] == "unique"


def test_keeper_longest_prefers_max_raw_length_then_order():
    st, cid = _run(_cfg(keeper="longest"))
    assert st[1] == "keep" and st[0] == "delete" and st[2] == "delete"
    assert cid[0] == cid[1] == cid[2] == 1
    # identical pair: lengths tie -> global-order minimum keeps
    assert st[3] == "keep" and st[4] == "delete" and cid[4] == 3


def test_keeper_newest_oldest_use_ts():
    st, cid = _run(_cfg(keeper="newest", ts_col="ts"))
    assert st[2] == "keep" and cid[0] == 2          # ts=99 wins
    assert st[3] == "keep" and st[4] == "delete"    # ts tie -> min id
    st, cid = _run(_cfg(keeper="oldest", ts_col="ts"))
    assert st[1] == "keep" and cid[0] == 1          # ts=5 wins


def test_keeper_priority_uses_column_and_reduce_path_matches():
    cfg = _cfg(keeper="priority", keeper_col="tier")
    st, cid = _run(cfg)
    assert st[0] == "keep" and cid[1] == 0          # tier=3 max in 0/1/2
    assert st[4] == "keep" and cid[3] == 4          # tier=5 beats tier=0
    # reduce-side label join must give byte-identical assignments
    st2, cid2 = _run(cfg, broadcast_threshold=0)
    assert st == st2 and cid == cid2


def test_keeper_validation():
    with pytest.raises(ValueError, match="keeper"):
        _cfg(keeper="best")
    with pytest.raises(ValueError, match="keeper_col"):
        _cfg(keeper="priority")
    with pytest.raises(ValueError, match="ts_col"):
        _cfg(keeper="newest")
