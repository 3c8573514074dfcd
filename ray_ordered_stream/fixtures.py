"""Deterministic synthetic transcript generator + serial-replay oracle.

Plays the role of the reference's simulator (SURVEY.md §2.4): per-key
monotone sequence assignment ≙ Matcher seqId counters
(business-model/.../Matcher.java:219-225), power-law key-activity skew ≙
Simulator.degreeDistribution (Simulator.java:61-70, default --degree 2 at
simulator/.../App.java:46-48), simulated-time ladder ≙
MatcherContext.buildSimulated (MatcherContext.java:136-138).

The oracle re-expresses the reference's test pattern (serial in-order replay,
order-book-pipeline/.../OrderBookProcessingPipelineTest.java:65-78,159-176)
as: sort by (conv_id, turn_idx), drop duplicate (conv_id, turn_idx) keeping
the earliest arrival, emit one row per turn with a 1-based per-key emit_seq.

Everything is seeded and vectorized (numpy); no external data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .schema import ARRIVAL, KEY, SEQ, TRANSCRIPT_SCHEMA

_ROLES = np.array(["user", "assistant", "tool", "system"])


def gen_transcripts(
    n_convs: int = 8,
    min_turns: int = 4,
    max_turns: int = 50,
    degree: float = 2.0,
    seed: int = 42,
    start_ts: str = "2025-01-01T00:00:00",
    rate: float = 10.0,
    lateness: int = 0,
    dup_rate: float = 0.0,
    end_sentinel: bool = True,
) -> pa.Table:
    """Generate a transcript table in *arrival order* with an ``arrival_seq``
    column.

    ``lateness`` bounds how far (in global stream positions) a row may arrive
    from its in-order slot; ``dup_rate`` re-delivers that fraction of rows at
    a later arrival position (duplicates must be dropped + counted by the
    engine, ≙ docs/pipeline-design.md:117-122).
    """
    rng = np.random.default_rng(seed)

    # Power-law activity: conv i gets turns in [min_turns, max_turns] by
    # 1 - (i/n)^degree (reference Simulator.java:61-70 shape).
    i = np.arange(n_convs, dtype=np.float64)
    frac = 1.0 - (i / max(n_convs, 1)) ** degree
    turns = (min_turns + frac * (max_turns - min_turns)).astype(np.int64)
    turns = np.maximum(turns, 2 if end_sentinel else 1)

    n = int(turns.sum())
    conv_codes = np.repeat(np.arange(n_convs), turns)
    starts = np.zeros(n_convs, dtype=np.int64)
    starts[1:] = np.cumsum(turns)[:-1]
    turn_idx = (np.arange(n) - starts[conv_codes]).astype(np.int32)

    conv_ids = np.char.add("c", np.char.zfill(np.arange(n_convs).astype("U10"), 7))
    conv_arr = pa.array(conv_ids, pa.string())
    conv_col = conv_arr.take(pa.array(conv_codes))

    # Roles: turn 0 = system, then user/assistant alternating with a tool turn
    # every 5th; final turn of a conv = "end" sentinel (≙ lastContractMessage,
    # marketdata.proto:41). Encoded as small-int codes + one dictionary take
    # (np.char/np.where over tens of millions of U-strings is minutes-slow).
    role_names = pa.array(["user", "assistant", "tool", "system", "end"], pa.string())
    role_code = (turn_idx % 2 == 1).astype(np.int8)  # user/assistant
    role_code[(turn_idx > 0) & (turn_idx % 5 == 0)] = 2
    role_code[turn_idx == 0] = 3
    if end_sentinel:
        role_code[turn_idx == (turns[conv_codes] - 1).astype(np.int32)] = 4
    role = role_names.take(pa.array(role_code.astype(np.int64)))
    tool_names = pa.array(["", "search"], pa.string())
    tool = tool_names.take(pa.array((role_code == 2).astype(np.int64)))

    # Deterministic payload text; order-sensitive content per (conv, turn).
    # Arrow concat kernels: vectorized in C, identical output to the previous
    # np.char implementation.
    import pyarrow.compute as pc

    h = (conv_codes * 1_000_003 + turn_idx.astype(np.int64) * 7919) % 99_991
    text = pc.binary_join_element_wise(
        "turn ",
        pc.cast(pa.array(turn_idx.astype(np.int64)), pa.string()),
        " of ",
        conv_col,
        " payload ",
        pc.cast(pa.array(h), pa.string()),
        "",
    )

    # Simulated-time ladder: conversations interleave on a global clock;
    # within a conv, ts is strictly increasing in turn_idx.
    base = np.datetime64(start_ts, "us")
    step_us = int(1_000_000 / rate)
    conv_offset = (conv_codes * 137) % 1000  # stagger conv start times
    ts = base + ((turn_idx.astype(np.int64) * n_convs + conv_offset + conv_codes) * step_us).astype(
        "timedelta64[us]"
    )

    tbl = pa.table(
        {
            KEY: conv_col,
            SEQ: pa.array(turn_idx, pa.int32()),
            "role": role,
            "text": text,
            "tool": tool,
            "ts": pa.array(ts, pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )

    # Arrival permutation: global in-order position = sort by (ts, conv, turn);
    # bounded lateness = jitter of at most `lateness` positions.
    order = np.lexsort((turn_idx, conv_codes, ts.astype(np.int64)))
    inorder_pos = np.empty(n, dtype=np.float64)
    inorder_pos[order] = np.arange(n, dtype=np.float64)
    if lateness > 0:
        inorder_pos += rng.uniform(0, lateness, size=n)

    if dup_rate > 0.0:
        n_dup = int(n * dup_rate)
        dup_rows = rng.choice(n, size=n_dup, replace=False)
        dup_pos = inorder_pos[dup_rows] + rng.uniform(1, max(lateness, 2), size=n_dup)
        tbl = pa.concat_tables([tbl, tbl.take(dup_rows)])
        inorder_pos = np.concatenate([inorder_pos, dup_pos])

    arrival = np.argsort(np.argsort(inorder_pos, kind="stable"), kind="stable")
    tbl = tbl.append_column(ARRIVAL, pa.array(arrival, pa.int64()))
    return tbl.take(np.argsort(arrival, kind="stable"))


def tiny_fixture(name: str) -> pa.Table:
    """Named conformance fixtures (FIXTURES.md §1, 'Standard fixture
    instances'). All single-digit sizes; arrival order is the row order."""
    if name == "t_inorder":
        t = gen_transcripts(n_convs=1, min_turns=3, max_turns=3, end_sentinel=False)
        return _with_arrival(t, np.arange(3))
    if name == "t_reverse":
        t = gen_transcripts(n_convs=1, min_turns=3, max_turns=3, end_sentinel=False)
        return _with_arrival(t, np.array([2, 1, 0]))
    if name == "t_gap":
        t = gen_transcripts(n_convs=1, min_turns=6, max_turns=6, end_sentinel=False)
        # withhold turn 1 until the end: arrival 0,2,3,4,5 then 1
        return _with_arrival(t, np.array([0, 5, 1, 2, 3, 4]))
    if name == "t_dup":
        t = gen_transcripts(n_convs=1, min_turns=4, max_turns=4, end_sentinel=False)
        dup = t.take([0, 2])  # re-deliver turns 0 and 2 at the end
        t = pa.concat_tables([t, dup])
        return _with_arrival(t, np.arange(6))
    if name == "t_multi":
        return gen_transcripts(
            n_convs=8, min_turns=10, max_turns=50, lateness=20, dup_rate=0.05, seed=7
        )
    if name == "t_skew":
        return gen_transcripts(
            n_convs=200, min_turns=10, max_turns=500, degree=2.0, lateness=200, dup_rate=0.01
        )
    raise KeyError(name)


def _with_arrival(t: pa.Table, arrival_rank: np.ndarray) -> pa.Table:
    """Reorder rows (given in sequence order) to the given arrival ranks;
    ``arrival_rank[i]`` is the stream position of row ``i``."""
    if ARRIVAL in t.column_names:
        t = t.drop_columns([ARRIVAL])
    order = np.argsort(arrival_rank, kind="stable")
    t = t.take(order)
    return t.append_column(ARRIVAL, pa.array(np.arange(len(order)), pa.int64()))


# ---------------------------------------------------------------------------
# Serial-replay oracle (pandas; intentionally naive and obviously correct)
# ---------------------------------------------------------------------------


def oracle_ordered(t: pa.Table) -> pd.DataFrame:
    """Expected ordered output: dedup (conv, turn) keep earliest arrival,
    sort by (conv, turn), 1-based per-key emit_seq. Sorted (conv, turn)."""
    df = t.to_pandas()
    if ARRIVAL in df.columns:
        df = df.sort_values(ARRIVAL, kind="stable")
    df = df.drop_duplicates([KEY, SEQ], keep="first")
    df = df.sort_values([KEY, SEQ], kind="stable").reset_index(drop=True)
    df["emit_seq"] = df.groupby(KEY).cumcount() + 1
    return df.drop(columns=[ARRIVAL], errors="ignore")


def oracle_final_status(t: pa.Table) -> pd.DataFrame:
    """Expected final per-key status after the whole stream is drained
    (assuming contiguous 0-based turn_idx per conv in the fixture)."""
    df = t.to_pandas()
    uniq = df.drop_duplicates([KEY, SEQ])
    g = uniq.groupby(KEY)
    out = pd.DataFrame(
        {
            "received_count": df.groupby(KEY).size(),
            "duplicate_count": df.groupby(KEY).size() - g.size(),
            "result_count": g.size(),
            "last_processed_sequence": g[SEQ].max().astype("int64"),
            "buffered_count": 0,
            "last_event_received": g.apply(lambda x: bool((x["role"] == "end").any()), include_groups=False),
        }
    ).reset_index()
    return out
