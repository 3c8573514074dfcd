"""Event-time windows over the transcript stream (tumbling / sliding /
session).

Mandated by BASELINE.json north_rule (the reference itself delegates
windowing to Beam's watermark machinery — visible only in its tests,
OrderBookProcessingPipelineTest.java:204-217 — and to downstream SQL,
README.md:105-140; the semantics here are standard event-time windowing).

Design (SURVEY.md §2.5, §7.1.5):
- window-id assignment is a vectorized ``map_batches`` over zero-copy Arrow;
- count-style aggregates use partial pre-aggregation per batch followed by a
  small ``groupby().aggregate`` — the shuffle moves one row per
  (key, window, batch), not one per turn;
- order-dependent products (text_digest) and session windows (per-key gap
  merge) use ``groupby(key).map_groups`` — a per-key sorted replay, the batch
  analogue of the in-actor state path.

All functions take/return ``ray.data.Dataset`` and never materialize input.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .schema import KEY

_US = 1_000_000


def _size_us(seconds: float) -> int:
    return int(seconds * _US)


def assign_tumbling(ds, size_s: float, ts: str = "ts"):
    """Add window_start/window_end columns (vectorized)."""
    size = _size_us(size_s)

    def f(t: pa.Table) -> pa.Table:
        tsi = pc.cast(t[ts], pa.int64())
        ws_i = pc.multiply(pc.divide(tsi, size), size)  # integer division (ts >= epoch)
        ws = pc.cast(ws_i, pa.timestamp("us"))
        we = pc.cast(pc.add(ws_i, size), pa.timestamp("us"))
        return t.append_column("window_start", ws).append_column("window_end", we)

    return ds.map_batches(f, batch_format="pyarrow")


def tumbling_counts(ds, size_s: float, key: str = KEY, ts: str = "ts"):
    """Tumbling-window per-key aggregate: turn_count plus per-role counts.

    Scale path: per-batch partial aggregation -> groupby over partials.
    """
    size = _size_us(size_s)

    def partial(t: pa.Table) -> pa.Table:
        tsi = pc.cast(t[ts], pa.int64()).to_numpy(zero_copy_only=False)
        ws = (tsi // size) * size
        df = pd.DataFrame(
            {
                key: t[key].to_pandas(),
                "window_start": ws,
                "role": t["role"].to_pandas(),
            }
        )
        g = df.groupby([key, "window_start"], sort=False)
        out = g.agg(
            turn_count=("role", "size"),
            n_user=("role", lambda s: int((s == "user").sum())),
            n_assistant=("role", lambda s: int((s == "assistant").sum())),
        ).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    from ray.data.aggregate import Sum

    partials = ds.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby([key, "window_start"]).aggregate(
        Sum("turn_count", alias_name="turn_count"),
        Sum("n_user", alias_name="n_user"),
        Sum("n_assistant", alias_name="n_assistant"),
    )

    def finish(t: pa.Table) -> pa.Table:
        ws = pc.cast(t["window_start"], pa.timestamp("us"))
        we = pc.cast(pc.add(t["window_start"], size), pa.timestamp("us"))
        t = t.drop_columns(["window_start"])
        return t.append_column("window_start", ws).append_column("window_end", we)

    return agg.map_batches(finish, batch_format="pyarrow")


def tumbling_digest(ds, size_s: float, key: str = KEY, ts: str = "ts", seq: str = "turn_idx"):
    """Tumbling windows with an order-dependent text digest (md5 of texts
    concatenated in turn order) — the conformance variant (FIXTURES.md §4)."""
    size = _size_us(size_s)
    with_w = assign_tumbling(ds, size_s, ts)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(seq, kind="stable")
        return pd.DataFrame(
            {
                key: [g[key].iloc[0]],
                "window_start": [g["window_start"].iloc[0]],
                "window_end": [g["window_end"].iloc[0]],
                "turn_count": [len(g)],
                "text_digest": [hashlib.md5("|".join(g["text"]).encode()).hexdigest()],
            }
        )

    return with_w.groupby([key, "window_start"]).map_groups(
        per_group, batch_format="pandas"
    )


def sliding_counts(ds, size_s: float, step_s: float, key: str = KEY, ts: str = "ts"):
    """Sliding windows: each row explodes into the ceil(size/step) windows
    containing it (vectorized repeat), then partial + global aggregation."""
    size, step = _size_us(size_s), _size_us(step_s)
    n_w = -(-size // step)  # windows per row

    def explode_partial(t: pa.Table) -> pa.Table:
        tsi = pc.cast(t[ts], pa.int64()).to_numpy(zero_copy_only=False)
        # last window start containing the row, then walk back n_w starts
        last_ws = (tsi // step) * step
        offs = (np.arange(n_w) * step)[None, :]
        ws = last_ws[:, None] - offs                     # (rows, n_w)
        valid = (ws + size) > tsi[:, None]
        valid &= ws >= 0
        keys = np.repeat(np.asarray(t[key].to_pandas(), dtype=object), n_w)
        df = pd.DataFrame(
            {key: keys[valid.ravel()], "window_start": ws.ravel()[valid.ravel()]}
        )
        out = df.groupby([key, "window_start"], sort=False).size().rename("turn_count").reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    from ray.data.aggregate import Sum

    partials = ds.map_batches(explode_partial, batch_format="pyarrow")
    agg = partials.groupby([key, "window_start"]).aggregate(
        Sum("turn_count", alias_name="turn_count")
    )

    def finish(t: pa.Table) -> pa.Table:
        ws = pc.cast(t["window_start"], pa.timestamp("us"))
        we = pc.cast(pc.add(t["window_start"], size), pa.timestamp("us"))
        t = t.drop_columns(["window_start"])
        return t.append_column("window_start", ws).append_column("window_end", we)

    return agg.map_batches(finish, batch_format="pyarrow")


def session_windows(ds, gap_s: float, key: str = KEY, ts: str = "ts"):
    """Session windows: per-key gap merge (a new session starts when the gap
    to the previous turn exceeds ``gap_s``). Per-key sorted replay via
    map_groups — gap merge is inherently per-key (SURVEY.md §7.3)."""
    gap = _size_us(gap_s)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts, kind="stable")
        tsi = g[ts].astype("datetime64[us]").astype("int64").to_numpy()
        new_session = np.ones(len(g), dtype=bool)
        new_session[1:] = (tsi[1:] - tsi[:-1]) > gap
        sid = np.cumsum(new_session) - 1
        out = (
            pd.DataFrame({"sid": sid, "tsv": tsi})
            .groupby("sid")
            .agg(session_start=("tsv", "min"), session_end=("tsv", "max"), turn_count=("tsv", "size"))
            .reset_index()
        )
        out[key] = g[key].iloc[0]
        out["session_id"] = out["sid"].astype("int64")
        out["session_start"] = pd.to_datetime(out["session_start"], unit="us").astype(
            "datetime64[us]"
        )
        out["session_end"] = pd.to_datetime(out["session_end"], unit="us").astype(
            "datetime64[us]"
        )
        return out[[key, "session_id", "session_start", "session_end", "turn_count"]]

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")
