"""Distributed training of a linear quality classifier (logistic
regression) — the "distill a heuristic into a model" stage of a
training-data pipeline (e.g. bootstrap labels from an integer quality rule,
then learn a smooth scorer to rank the rest of the corpus).

Full-batch gradient descent, deliberately: the gradient is a SUM of
per-row terms, so each iteration is one wave of per-worker partials
((X^T r, loss, n) — feature-dim floats per worker, independent of row
count) folded on the driver. No SGD batch ordering means the result is
independent of partitioning up to float summation order — pinned by a
serial-conformance test.

The iteration loop runs against PLASMA-CACHED SHARDS: a one-time task
wave coalesces the materialized blocks into per-shard standardized
numpy matrices in the object store (d float64 per row — the selected
numeric columns only, never the text), then every GD round is one tiny
task per shard whose matrix argument is a zero-copy plasma read (numpy
float64 is plasma-zero-copy, and Ray schedules each round's task onto
the node that already holds its shard). That keeps the 50-plus
synchronization rounds off repeated Arrow→numpy decodes and avoids
actor-process spawn entirely; only O(iters × shards × d) floats cross
the wire after the one-time shard build.

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
    concurrency: int | None = None,
):
    """Fit logistic regression distributedly. Returns
    ``(weights, bias, history)`` with weights/bias in RAW feature space
    (standardization folded in) and ``history`` the per-iteration mean
    log-loss. ``concurrency`` caps the shard count of the cached
    gradient shards (default: min(#blocks, 8))."""
    import ray

    refs = [
        r
        for r in ds.select_columns(feature_cols + [label_col]).to_arrow_refs()
    ]
    d = len(feature_cols)
    n_shards = max(1, min(len(refs), concurrency or 8))

    @ray.remote(num_returns=3)
    def _build(shard_refs, fcols, lcol):
        """Coalesce one shard's blocks into plasma: (X, y, moments)."""
        xs, ys = [], []
        for t in ray.get(list(shard_refs)):
            if t.num_rows:
                x, y = _xy(t, fcols, lcol)
                xs.append(x)
                ys.append(y)
        x = np.concatenate(xs) if xs else np.zeros((0, len(fcols)))
        y = np.concatenate(ys) if ys else np.zeros(0)
        return x, y, (x.sum(axis=0), (x * x).sum(axis=0), len(y))

    @ray.remote
    def _standardize(x, m, s):
        return (x - m) / s

    @ray.remote
    def _grad(wb: np.ndarray, x, y):
        """(d(w), d(b), summed log-loss, n) of this shard under (w, b)."""
        if not len(y):
            return np.zeros(len(wb) - 1), 0.0, 0.0, 0
        z = x @ wb[:-1] + wb[-1]
        p = 1.0 / (1.0 + np.exp(-z))
        r = p - y
        eps = 1e-12
        loss = -(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)).sum()
        return x.T @ r, float(r.sum()), float(loss), len(y)

    built = [
        _build.remote(refs[i::n_shards], feature_cols, label_col)
        for i in range(n_shards)
    ]
    xrefs = [b[0] for b in built]
    yrefs = [b[1] for b in built]
    parts = ray.get([b[2] for b in built])
    n = sum(p[2] for p in parts)
    if n == 0:
        raise ValueError("empty dataset")
    if standardize:
        mu = sum(p[0] for p in parts) / n
        var = np.maximum(sum(p[1] for p in parts) / n - mu * mu, 1e-12)
        sd = np.sqrt(var)
        # one extra plasma copy per shard; the raw-X refs drop right after
        xrefs = [_standardize.remote(x, mu, sd) for x in xrefs]
    else:
        mu = np.zeros(d)
        sd = np.ones(d)

    wb = np.zeros(d + 1)
    history = []
    for _ in range(int(iters)):
        parts = ray.get(
            [_grad.remote(wb, x, y) for x, y in zip(xrefs, yrefs)]
        )
        gw = sum(p[0] for p in parts)
        gb = sum(p[1] for p in parts)
        loss = sum(p[2] for p in parts)
        history.append(loss / n)
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
