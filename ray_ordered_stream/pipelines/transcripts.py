"""Derive a transcript-shaped ordered stream from the ``events`` test table.

The correctness harness (``__ray_entry__``) needs ordered-processing queries
whose oracle is ANSI SQL over the pre-registered testdata views, so we map
``events`` to the transcript shape deterministically:

    conv_id  = cast(user_id as string)
    turn_idx = per-user rank of (ts, event_id) - 1        (int32)
    role     = event_type, text = props, ts = ts

Sequence assignment is a per-key operation (≙ the simulator's per-contract
seqId counter, business-model/.../Matcher.java:219-225): one groupby(user_id)
shuffle, rank vectorized inside each group. The arrival order fed to the
engine is a deterministic hash permutation of event_id — the engine's output
is arrival-invariant (that is the whole point), which the oracle states as a
plain ORDER BY.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..schema import ARRIVAL, KEY, SEQ


def derive_transcripts(events_ds):
    """events Dataset -> transcript-shaped Dataset (in no particular order)."""

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        out = pd.DataFrame(
            {
                KEY: g["user_id"].astype("int64").astype(str),
                SEQ: np.arange(len(g), dtype=np.int32),
                "role": g["event_type"],
                "text": g["props"],
                "tool": "",
                "ts": g["ts"].astype("datetime64[us]"),
                "event_id": g["event_id"].astype("int64"),
            }
        )
        return out

    return events_ds.groupby("user_id").map_groups(rank_group, batch_format="pandas")


def with_shuffled_arrival(ds):
    """Deterministic pseudo-random arrival order: Knuth-hash of event_id."""

    def f(t: pa.Table) -> pa.Table:
        ev = t["event_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        arr = (ev * np.uint64(2654435761)) % np.uint64(1 << 32)
        return t.append_column(ARRIVAL, pa.array(arr.astype(np.int64), pa.int64()))

    return ds.map_batches(f, batch_format="pyarrow")
