"""Distributed logistic regression vs a serial same-math implementation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _data(n=2000, d=4, seed=9):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)) * np.array([1.0, 5.0, 0.5, 2.0])
    w_true = np.array([2.0, -0.3, 4.0, 0.0])
    z = x @ w_true - 0.5
    y = (1.0 / (1.0 + np.exp(-z)) > rng.uniform(size=n)).astype(np.int64)
    cols = {f"f{i}": x[:, i] for i in range(d)}
    cols["y"] = y
    return pd.DataFrame(cols), x, y


def _serial_logreg(x, y, iters, lr, l2):
    mu, sd = x.mean(axis=0), np.sqrt(np.maximum(x.var(axis=0), 1e-12))
    xs = (x - mu) / sd
    w = np.zeros(x.shape[1])
    b = 0.0
    n = len(y)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(xs @ w + b)))
        r = p - y
        w -= lr * (xs.T @ r / n + l2 * w)
        b -= lr * (r.sum() / n)
    return w / sd, float(b - (w * mu / sd).sum())


def test_train_logreg_matches_serial_and_separates(ray_session):
    import ray.data as rd

    from ray_ordered_stream.functions.ml import predict_proba, train_logreg

    df, x, y = _data()
    feats = [f"f{i}" for i in range(4)]
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(5)
    w, b, hist = train_logreg(ds, feats, "y", iters=40, lr=0.5, l2=1e-4)
    ws, bs = _serial_logreg(x, y.astype(np.float64), 40, 0.5, 1e-4)
    # full-batch GD: identical math, only float summation order differs
    assert np.allclose(w, ws, rtol=1e-8, atol=1e-10)
    assert abs(b - bs) < 1e-8
    # loss decreases and the model actually separates
    assert hist[-1] < hist[0] * 0.7
    scored = predict_proba(ds, feats, w, b).to_pandas()
    acc = ((scored["score"] > 0.5).astype(int) == scored["y"]).mean()
    assert acc > 0.8  # labels are sampled from the sigmoid: Bayes error is real


def test_train_logreg_partition_invariant(ray_session):
    import ray.data as rd

    from ray_ordered_stream.functions.ml import train_logreg

    df, _, _ = _data(n=600, seed=11)
    feats = [f"f{i}" for i in range(4)]
    t = pa.Table.from_pandas(df)
    w2, b2, _ = train_logreg(
        rd.from_arrow(t).repartition(2), feats, "y", iters=25
    )
    w7, b7, _ = train_logreg(
        rd.from_arrow(t).repartition(7), feats, "y", iters=25
    )
    assert np.allclose(w2, w7, rtol=1e-7)
    assert abs(b2 - b7) < 1e-7
