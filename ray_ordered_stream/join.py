"""Stateful stream-stream join of role-partitioned turn streams.

Mandated by BASELINE.json north_rule (the reference pipeline contains no
generic join — SURVEY.md §2.5; this operator is owned by our engine design):
the `user` and `assistant` turn streams of each conversation are
co-partitioned on ``conv_id`` and each user turn is matched to the *next*
assistant turn (first assistant turn with a larger ``turn_idx``), optionally
bounded by an event-time window on ``ts``.

Batch implementation (closed input): bucket both sides by hash(conv_id) % B
(ONE shuffle, same key as every other stage — SURVEY.md §7.3), then a
vectorized ``pandas.merge_asof(by=conv_id, direction="forward")`` per bucket.
The streaming variant buffers both sides in the ordered-state actors and
emits on watermark (see ``stream.py``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .partitioning import key_partition_codes
from .schema import KEY, SEQ

JOIN_COLUMNS = [
    KEY,
    "user_turn_idx",
    "assistant_turn_idx",
    "user_text",
    "assistant_text",
    "lag_us",
]


def join_user_assistant(
    ds,
    key: str = KEY,
    seq: str = SEQ,
    left_role: str = "user",
    right_role: str = "assistant",
    within_us: int | None = None,
    num_buckets: int = 16,
):
    """Per-key forward as-of join of the two role streams.

    Returns a Dataset with ``JOIN_COLUMNS`` (inner join: user turns with no
    later assistant turn are dropped; with ``within_us`` also bounded by
    event time).
    """

    def add_bucket(t: pa.Table) -> pa.Table:
        b = key_partition_codes(t[key], num_buckets)
        return t.append_column("__bucket", pa.array(b, pa.int64()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["role"] == left_role]
        right = g[g["role"] == right_role]
        if left.empty or right.empty:
            return pd.DataFrame({c: pd.Series(dtype=_dtype(c)) for c in JOIN_COLUMNS})
        # merge_asof needs the `on` key sorted and strictly forward matching:
        # match on turn_idx with a +1 offset so "next" means strictly greater.
        lf = left[[key, seq, "text", "ts"]].rename(
            columns={seq: "user_turn_idx", "text": "user_text", "ts": "user_ts"}
        )
        rf = right[[key, seq, "text", "ts"]].rename(
            columns={seq: "assistant_turn_idx", "text": "assistant_text", "ts": "assistant_ts"}
        )
        lf["__on"] = lf["user_turn_idx"].astype("int64") + 1
        rf["__on"] = rf["assistant_turn_idx"].astype("int64")
        lf = lf.sort_values("__on", kind="stable")
        rf = rf.sort_values("__on", kind="stable")
        m = pd.merge_asof(lf, rf, on="__on", by=key, direction="forward")
        m = m.dropna(subset=["assistant_turn_idx"])
        m["assistant_turn_idx"] = m["assistant_turn_idx"].astype("int32")
        m["user_turn_idx"] = m["user_turn_idx"].astype("int32")
        m["lag_us"] = (
            m["assistant_ts"].astype("datetime64[us]").astype("int64")
            - m["user_ts"].astype("datetime64[us]").astype("int64")
        ).astype("int64")
        if within_us is not None:
            m = m[m["lag_us"] <= within_us]
        return m[JOIN_COLUMNS].reset_index(drop=True)

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")
    return bucketed.groupby("__bucket").map_groups(per_bucket, batch_format="pandas")


def _dtype(col: str):
    if col in (KEY, "user_text", "assistant_text"):
        return "object"
    if col in ("user_turn_idx", "assistant_turn_idx"):
        return "int32"
    return "int64"
