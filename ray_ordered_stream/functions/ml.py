"""Distributed training of a linear quality classifier (logistic
regression) — the "distill a heuristic into a model" stage of a
training-data pipeline (e.g. bootstrap labels from an integer quality rule,
then learn a smooth scorer to rank the rest of the corpus).

Full-batch gradient descent, deliberately: the gradient is a SUM of
per-row terms, so each iteration is one wave of per-block partials
((X^T r, loss, n) — feature-dim floats per block, independent of row
count) folded on the driver, exactly the ``train_centroids_distributed``
ref-loop shape. No SGD batch ordering means the result is independent of
partitioning up to float summation order — pinned by a serial-conformance
test. Blocks are materialized ONCE and every iteration is plain tasks
over the same refs (no pipeline re-execution).

Feature standardization (optional, on by default) runs as one extra
partial pass (sum, sumsq, n) and is folded into the returned weights so
``predict_proba`` applies to RAW features.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _xy(t: pa.Table, feature_cols: list[str], label_col: str):
    x = np.column_stack(
        [
            t[c].to_numpy(zero_copy_only=False).astype(np.float64)
            for c in feature_cols
        ]
    )
    y = t[label_col].to_numpy(zero_copy_only=False).astype(np.float64)
    return x, y


def train_logreg(
    ds,
    feature_cols: list[str],
    label_col: str,
    iters: int = 50,
    lr: float = 0.5,
    l2: float = 1e-4,
    standardize: bool = True,
):
    """Fit logistic regression distributedly. Returns
    ``(weights, bias, history)`` with weights/bias in RAW feature space
    (standardization folded in) and ``history`` the per-iteration mean
    log-loss."""
    import ray

    refs = [
        r
        for r in ds.select_columns(feature_cols + [label_col]).to_arrow_refs()
    ]
    d = len(feature_cols)

    @ray.remote
    def moments(t: pa.Table):
        if not t.num_rows:
            return np.zeros(d), np.zeros(d), 0
        x, _ = _xy(t, feature_cols, label_col)
        return x.sum(axis=0), (x * x).sum(axis=0), len(x)

    if standardize:
        parts = ray.get([moments.remote(r) for r in refs])
        s1 = sum(p[0] for p in parts)
        s2 = sum(p[1] for p in parts)
        n = sum(p[2] for p in parts)
        if n == 0:
            raise ValueError("empty dataset")
        mu = s1 / n
        var = np.maximum(s2 / n - mu * mu, 1e-12)
        sd = np.sqrt(var)
    else:
        mu = np.zeros(d)
        sd = np.ones(d)

    @ray.remote
    def grad(wb: np.ndarray, m: np.ndarray, s: np.ndarray, t: pa.Table):
        """(d(w), d(b), summed log-loss, n) of this block under (w, b)."""
        if not t.num_rows:
            return np.zeros(d), 0.0, 0.0, 0
        x, y = _xy(t, feature_cols, label_col)
        xs = (x - m) / s
        z = xs @ wb[:-1] + wb[-1]
        p = 1.0 / (1.0 + np.exp(-z))
        r = p - y
        eps = 1e-12
        loss = -(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)).sum()
        return xs.T @ r, float(r.sum()), float(loss), len(y)

    wb = np.zeros(d + 1)
    history = []
    for _ in range(int(iters)):
        wbr = ray.put(wb)
        parts = ray.get([grad.remote(wbr, mu, sd, r) for r in refs])
        gw = sum(p[0] for p in parts)
        gb = sum(p[1] for p in parts)
        loss = sum(p[2] for p in parts)
        n = sum(p[3] for p in parts)
        history.append(loss / max(n, 1))
        wb[:-1] -= lr * (gw / n + l2 * wb[:-1])
        wb[-1] -= lr * (gb / n)

    # fold standardization into raw-space weights:
    # w_std . (x - mu)/sd + b  ==  (w_std/sd) . x + (b - w_std . mu/sd)
    w_raw = wb[:-1] / sd
    b_raw = float(wb[-1] - (wb[:-1] * mu / sd).sum())
    return w_raw, b_raw, history


def predict_proba(ds, feature_cols: list[str], w: np.ndarray, b: float,
                  out_col: str = "score"):
    """Score a Dataset under a trained linear model: one matmul per batch
    against the broadcast weights, sigmoid, new float column."""
    wv = np.asarray(w, dtype=np.float64)
    bb = float(b)

    def f(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return t.append_column(out_col, pa.array([], pa.float64()))
        x = np.column_stack(
            [
                t[c].to_numpy(zero_copy_only=False).astype(np.float64)
                for c in feature_cols
            ]
        )
        p = 1.0 / (1.0 + np.exp(-(x @ wv + bb)))
        return t.append_column(out_col, pa.array(p, pa.float64()))

    return ds.map_batches(f, batch_format="pyarrow")
