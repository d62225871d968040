"""validate_rows: per-rule counts, deterministic examples, null
handling, blocking invariance."""

import pyarrow as pa

import ray.data

from dedup.validate import validate_rows


def _ds(parts=3):
    t = pa.table({
        "doc_id": [1, 2, 3, 4, 5, 6, 7, 8],
        "email": ["a@x.com", "bad", None, "c@y.org", "nope", "d@z.io",
                  None, "e@w.net"],
        "size": [10, 5000, 30, None, -2, 40, 50, 60],
        "lang": ["en", "en", "de", "fr", None, "de", "en", "xx"],
    })
    return ray.data.from_arrow(t).repartition(parts)


RULES = [
    {"name": "email_format", "kind": "regex", "col": "email",
     "pattern": r"[^@]+@[^@]+\.[a-z]+"},
    {"name": "lang_in_set", "kind": "in_set", "col": "lang",
     "values": ["en", "de", "fr"]},
    {"name": "lang_unique", "kind": "unique", "col": "lang"},
    {"name": "size_not_null", "kind": "not_null", "col": "size"},
    {"name": "size_range", "kind": "range", "col": "size",
     "lo": 0, "hi": 100},
]


def test_validate_rows_counts_and_examples():
    got = validate_rows(_ds(), RULES).to_pylist()
    by = {r["rule"]: r for r in got}
    # regex: 6 non-null emails, 'bad' and 'nope' fail
    assert by["email_format"]["n_checked"] == 6
    assert by["email_format"]["n_violations"] == 2
    assert by["email_format"]["examples"] == "2,5"
    # in_set: 7 non-null langs, 'xx' fails
    assert by["lang_in_set"]["n_violations"] == 1
    assert by["lang_in_set"]["examples"] == "8"
    # unique: 8 rows, 5 distinct (en, de, fr, xx, NULL-sentinel) -> 3 extra
    assert by["lang_unique"]["n_checked"] == 8
    assert by["lang_unique"]["n_violations"] == 3
    assert by["lang_unique"]["examples"] == "de,en"
    # not_null: one null size
    assert by["size_not_null"]["n_violations"] == 1
    assert by["size_not_null"]["examples"] == "4"
    # range: 7 non-null sizes; 5000 and -2 out of [0, 100]
    assert by["size_range"]["n_checked"] == 7
    assert by["size_range"]["n_violations"] == 2
    assert by["size_range"]["examples"] == "2,5"


def test_validate_rows_blocking_invariant_and_clean():
    a = validate_rows(_ds(2), RULES).to_pylist()
    b = validate_rows(_ds(7), RULES).to_pylist()
    assert a == b
    clean = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2], "v": [3, 4]}))
    out = validate_rows(clean, [
        {"name": "v_ok", "kind": "range", "col": "v", "lo": 0, "hi": 10},
        {"name": "v_uni", "kind": "unique", "col": "v"}]).to_pylist()
    assert all(r["n_violations"] == 0 and r["examples"] == ""
               for r in out)
