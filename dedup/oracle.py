"""Single-process greedy reference oracle (test-only).

A ~100-line pure-Python reimplementation of the reference's scan
semantics (ScanAsync ordered loop MainViewModel.cs:694-781 + the
CompareFile conjunctive chain :996-1241), used to assert that the
distributed pipeline's cluster assignments match the greedy first-wins
algorithm exactly on small tables (SURVEY.md §5.1).

Faithful details:
  * deterministic global order: (root_rank, natural_key(id), id)
    (sort :879-882; tie-break per SURVEY.md §A.6);
  * ignore threshold strict ``<`` (:603);
  * unique/ignored/error rows never enter candidate lists (:713-716),
    but keep/delete rows remain matchable;
  * classified rows never probe again (:703-706);
  * probe with surviving candidates -> keep, survivors -> delete
    (:1227-1234); empty candidates -> unique (:769-777);
  * scope modes restrict admissible pairs (:618-688, :720-749).
"""

from __future__ import annotations

import pyarrow as pa

from .config import DedupConfig
from .keys import natural_key, root_rank, url_host, url_prefix, url_stem


def _scope_val(cfg: DedupConfig, row: dict, ident) -> str:
    if cfg.scope_col:
        return str(row.get(cfg.scope_col))
    if not isinstance(ident, str):
        return ""
    if cfg.scope in ("same_prefix", "diff_prefix"):
        return url_prefix(ident)
    if cfg.scope in ("same_host", "diff_host"):
        return url_host(ident)
    if cfg.scope in ("same_root", "diff_root"):
        return str(root_rank(ident, cfg.roots))
    return ""


def oracle_assign(rows: list[dict], cfg: DedupConfig) -> pa.Table:
    """rows: dicts with cfg.id_col / cfg.text_col (+ ts/lang cols).
    Returns (id_col, state, cluster_id, cluster_size) like the pipeline."""
    n = len(rows)
    ids = [r[cfg.id_col] for r in rows]
    texts = [r.get(cfg.text_col) for r in rows]
    string_ids = any(isinstance(i, str) for i in ids)
    sentinel = "" if string_ids else -1

    def order_of(i: int):
        ident = ids[i]
        if string_ids:
            rank = root_rank(ident, cfg.roots) if cfg.roots else 0
            return (rank, natural_key(ident), ident)
        return (int(ident),)

    order = sorted(range(n), key=order_of)
    state = ["idle"] * n
    cluster_of = [sentinel] * n

    for i in range(n):
        if texts[i] is None:
            state[i] = "error"
        elif len(texts[i]) < cfg.min_doc_bytes:
            state[i] = "ignored"

    scopes = [_scope_val(cfg, rows[i], ids[i]) for i in range(n)]
    same = cfg.scope.startswith("same_")
    diff = cfg.scope.startswith("diff_")

    stems = [url_stem(i).lower() for i in ids]

    def match(a: int, b: int) -> bool:
        """a = prober (earlier in global order), b = candidate."""
        if texts[a] != texts[b]:          # size+content+hash conjunction
            return False
        if cfg.stem_prefix and not stems[b].startswith(stems[a]):
            return False                  # CompareFilenameSimilar (:1064-1072)
        if cfg.key_ts and cfg.ts_col and rows[a].get(cfg.ts_col) != rows[b].get(cfg.ts_col):
            return False
        if cfg.key_lang and cfg.lang_col and rows[a].get(cfg.lang_col) != rows[b].get(cfg.lang_col):
            return False
        if same and scopes[a] != scopes[b]:
            return False
        if diff and scopes[a] == scopes[b]:
            return False
        return True

    for pos, i in enumerate(order):
        if state[i] != "idle":            # classified rows never probe (:703-706)
            continue
        if not cfg.exact:
            state[i] = "unique"
            continue
        survivors = [j for j in order
                     if j != i and state[j] not in ("unique", "ignored", "error")
                     and match(i, j)]
        if survivors:
            state[i] = "keep"
            cluster_of[i] = ids[i]
            for j in survivors:
                state[j] = "delete"
                cluster_of[j] = ids[i]
        else:
            state[i] = "unique"

    sizes = {}
    for i in range(n):
        if cluster_of[i] != sentinel:
            sizes[cluster_of[i]] = sizes.get(cluster_of[i], 0) + 1
    csize = [sizes.get(cluster_of[i], 1 if state[i] == "unique" else 0)
             for i in range(n)]
    id_type = pa.string() if string_ids else pa.int64()
    return pa.table({
        cfg.id_col: pa.array(ids, id_type),
        "state": pa.array(state, pa.string()),
        "cluster_id": pa.array(cluster_of, id_type),
        "cluster_size": pa.array(csize, pa.int64()),
    })
