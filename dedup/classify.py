"""Learned quality classifier: the model-based filter tier
(FineWeb-Edu / DCLM style) above the heuristic gates in curate.py —
train a logistic regression on a LABELED sample, score the whole corpus
distributed.

Scale shape:

    labeled set --map_batches(quality features)--> driver train
        (labeled data is small by nature — thousands of human/LLM
         labels against a trillion-doc corpus; the collect is bounded
         by the labeled-set size and sorted by id for determinism)
    corpus --map_batches(_Scorer)--> (id, score_e6, pred)
        (model broadcast once as numpy arrays — zero-copy per node;
         features recomputed per batch with the SAME vectorized
         quality_table kernel the SQL-checked quality_score query uses)

Determinism: features are the e6-quantized integers quality_table
emits; training sorts the labeled rows by id and runs fixed-iteration
full-batch gradient descent in float64 (no shuffling, no early stop on
wall-clock), so weights — and every downstream score — are identical
at any parallelism.  Tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .textstats import quality_table

#: feature column order (model vectors index into this)
FEATURES = ("alpha_ratio_e6", "digit_ratio_e6", "stopword_ratio_e6",
            "mean_token_len_e6", "log_len_e6")


def _feature_table(t: pa.Table, id_col: str, text_col: str) -> pa.Table:
    q = quality_table(t, id_col=id_col, text_col=text_col)
    n_chars = pc.utf8_length(pc.fill_null(t[text_col], "")) \
        .to_numpy(zero_copy_only=False).astype(np.float64)
    return q.append_column(
        "log_len_e6",
        pa.array(np.floor(np.log1p(n_chars) * 1e6).astype(np.int64),
                 pa.int64()))


def _matrix(t: pa.Table) -> np.ndarray:
    return np.column_stack([
        t[c].to_numpy(zero_copy_only=False).astype(np.float64) / 1e6
        for c in FEATURES])


def train_quality_classifier(labeled: ray.data.Dataset,
                             id_col: str = "doc_id",
                             text_col: str = "text",
                             label_col: str = "label",
                             epochs: int = 400,
                             lr: float = 1.0) -> dict:
    """Fit logistic regression on (text, 0/1 label) rows.  Returns the
    model dict {mu, sd, w, b} of float64 numpy arrays (standardization
    + weights) for ``quality_classify``.  The labeled set is collected
    driver-side (bounded by the labeled-set size — the op's contract)
    and sorted by id so training is deterministic."""

    def _feat(t: pa.Table) -> pa.Table:
        f = _feature_table(t, id_col, text_col)
        return f.append_column(label_col, t[label_col])

    rows = []
    for b in labeled.map_batches(_feat, batch_format="pyarrow") \
                    .iter_batches(batch_format="pyarrow"):
        rows.append(b)
    tab = pa.concat_tables(rows) if rows else None
    if tab is None or tab.num_rows == 0:
        raise ValueError("empty labeled set")
    order = pc.sort_indices(tab, sort_keys=[(id_col, "ascending")])
    tab = tab.take(order)
    x = _matrix(tab)
    y = tab[label_col].to_numpy(zero_copy_only=False).astype(np.float64)
    if not ((y == 0) | (y == 1)).all():
        raise ValueError("labels must be 0/1")
    mu = x.mean(axis=0)
    sd = np.maximum(x.std(axis=0), 1e-9)
    xs = (x - mu) / sd
    w = np.zeros(x.shape[1])
    b = 0.0
    n = len(y)
    for _ in range(epochs):
        z = xs @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (xs.T @ g) / n
        b -= lr * float(g.mean())
    return {"mu": mu, "sd": sd, "w": w, "b": np.float64(b)}


class _Scorer:
    def __init__(self, model_ref, threshold_e6: int, id_col: str,
                 text_col: str) -> None:
        m = ray.get(model_ref) if isinstance(model_ref, ray.ObjectRef) \
            else model_ref
        self.mu, self.sd, self.w, self.b = m["mu"], m["sd"], m["w"], m["b"]
        self.threshold_e6 = threshold_e6
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        f = _feature_table(t, self.id_col, self.text_col)
        x = (_matrix(f) - self.mu) / self.sd
        z = x @ self.w + float(self.b)
        score = np.floor(1.0 / (1.0 + np.exp(-z)) * 1e6).astype(np.int64)
        return pa.table({
            self.id_col: t[self.id_col],
            "score_e6": pa.array(score, pa.int64()),
            "pred": pa.array((score >= self.threshold_e6)
                             .astype(np.int64), pa.int64()),
        })


def quality_classify(ds: ray.data.Dataset, model: dict,
                     threshold: float = 0.5,
                     id_col: str = "doc_id", text_col: str = "text",
                     concurrency=(1, 8)) -> ray.data.Dataset:
    """Score every doc with a trained model: (id, score_e6,
    pred 0|1 at ``threshold``).  Model broadcast once; one
    map_batches, no shuffle."""
    ref = ray.put({k: np.asarray(v, dtype=np.float64)
                   for k, v in model.items()})
    return ds.map_batches(
        _Scorer,
        fn_constructor_kwargs={"model_ref": ref,
                               "threshold_e6": int(threshold * 1e6),
                               "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow", concurrency=concurrency)
