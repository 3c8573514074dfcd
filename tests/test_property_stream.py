"""Property-based tests for the streaming session-window accumulator and the
CEP matcher: for ANY key/timestamp layout and ANY chunking of the (per-key
ordered) emission, the streamed output equals the batch oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from ray_ordered_stream.cep import PatternMatcher
from ray_ordered_stream.schema import KEY, SEQ
from ray_ordered_stream.stream_ops import SessionAccumulator

US = 1_000_000
GAP_S = 5.0


def _table(keys, tss, roles=None):
    n = len(keys)
    return pa.table(
        {
            KEY: pa.array([f"k{k}" for k in keys], pa.string()),
            SEQ: pa.array(range(n), pa.int32()),
            "role": pa.array(roles if roles is not None else ["user"] * n,
                             pa.string()),
            "ts": pa.array(
                (np.asarray(tss, dtype=np.float64) * US).astype("int64"),
                pa.int64(),
            ).cast(pa.timestamp("us")),
        }
    )


def _session_oracle(df: pd.DataFrame, gap_s: float) -> pd.DataFrame:
    rows = []
    for k, g in df.sort_values([KEY, "ts"]).groupby(KEY, sort=True):
        tss = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        sid = 0
        start = end = tss[0]
        cnt = 1
        for t in tss[1:]:
            if t - end > gap_s * US:
                rows.append((k, sid, start, end, cnt))
                sid += 1
                start = end = t
                cnt = 1
            else:
                end = t
                cnt += 1
        rows.append((k, sid, start, end, cnt))
    return pd.DataFrame(
        rows, columns=[KEY, "session_id", "start", "end", "turn_count"]
    )


@settings(max_examples=40, deadline=None)
@given(
    n_keys=st.integers(1, 4),
    n_events=st.integers(1, 40),
    seed=st.integers(0, 10_000),
    n_chunks=st.integers(1, 9),
)
def test_session_accumulator_any_layout_any_chunking(
    n_keys, n_events, seed, n_chunks
):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, n_keys, n_events)
    # per-event ts increments 0..3*gap => sessions split at random points;
    # global ts-sorted feed keeps watermark vs. per-key order consistent
    tss = np.cumsum(rng.uniform(0, 3 * GAP_S, n_events))
    tbl = _table(keys, tss)
    df = tbl.to_pandas()
    exp = _session_oracle(df, GAP_S).sort_values([KEY, "session_id"]).reset_index(
        drop=True
    )

    acc = SessionAccumulator(GAP_S)
    outs = []
    step = -(-n_events // n_chunks)
    for i in range(n_chunks):
        s = tbl.slice(i * step, step)
        if s.num_rows:
            acc.update(s)
            outs.append(acc.take_closed())
    outs.append(acc.take_closed(final=True))
    got = (
        pa.concat_tables(outs)
        .to_pandas()
        .sort_values([KEY, "session_id"])
        .reset_index(drop=True)
    )
    assert got[KEY].tolist() == exp[KEY].tolist()
    assert got["session_id"].tolist() == exp["session_id"].tolist()
    assert got["turn_count"].tolist() == exp["turn_count"].tolist()
    assert (
        got["session_start"].astype("datetime64[us]").astype("int64").tolist()
        == exp["start"].tolist()
    )
    assert (
        got["session_end"].astype("datetime64[us]").astype("int64").tolist()
        == exp["end"].tolist()
    )


@settings(max_examples=40, deadline=None)
@given(
    n_keys=st.integers(1, 3),
    n_events=st.integers(1, 60),
    seed=st.integers(0, 10_000),
    pat_len=st.integers(1, 3),
    n_chunks=st.integers(1, 9),
)
def test_pattern_matcher_any_roles_any_chunking(
    n_keys, n_events, seed, pat_len, n_chunks
):
    rng = np.random.default_rng(seed)
    alphabet = ["a", "b", "c"]
    pattern = [alphabet[i] for i in rng.integers(0, 3, pat_len)]
    keys = np.sort(rng.integers(0, n_keys, n_events))
    # per-key consecutive seqs (the ordered-emission contract)
    seqs = np.zeros(n_events, dtype=np.int64)
    for k in np.unique(keys):
        m = keys == k
        seqs[m] = np.arange(m.sum())
    roles = [alphabet[i] for i in rng.integers(0, 3, n_events)]
    tbl = pa.table(
        {
            KEY: pa.array([f"k{k}" for k in keys], pa.string()),
            SEQ: pa.array(seqs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "ts": pa.array(np.arange(n_events) * US, pa.int64()).cast(
                pa.timestamp("us")
            ),
        }
    )
    # brute force over the per-key ordered stream
    df = tbl.to_pandas()
    exp = []
    for k, g in df.sort_values([KEY, SEQ]).groupby(KEY, sort=True):
        rs = g["role"].tolist()
        sq = g[SEQ].tolist()
        for i in range(len(g) - pat_len + 1):
            if rs[i : i + pat_len] == pattern:
                exp.append((k, sq[i], sq[i + pat_len - 1]))
    exp = sorted(exp)

    m = PatternMatcher(pattern)
    outs = []
    step = -(-n_events // n_chunks)
    for i in range(n_chunks):
        s = tbl.slice(i * step, step)
        if s.num_rows:
            outs.append(m.update(s))
    got = pa.concat_tables(outs).to_pandas()
    got = sorted(zip(got[KEY], got["start_seq"], got["end_seq"]))
    assert got == exp


@settings(max_examples=30, deadline=None)
@given(
    n_keys=st.integers(1, 4),
    n_events=st.integers(1, 50),
    seed=st.integers(0, 10_000),
    n_chunks=st.integers(1, 8),
    size_s=st.integers(2, 30),
    step_frac=st.integers(1, 4),
)
def test_sliding_accumulator_any_layout_any_chunking(
    n_keys, n_events, seed, n_chunks, size_s, step_frac
):
    from ray_ordered_stream.stream_ops import WindowAccumulator

    step_s = max(1, size_s // step_frac)
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, n_keys, n_events)
    tss = np.sort(rng.uniform(0, 120, n_events))  # global ts-sorted feed
    tbl = _table(keys, tss)

    # oracle: explode each row into its covering hops, count per (key, ws)
    size, step = size_s * US, step_s * US
    tsi = (tss * US).astype("int64")
    n_w = -(-size // step)
    last_ws = (tsi // step) * step
    ws = last_ws[:, None] - (np.arange(n_w) * step)[None, :]
    valid = ((ws + size) > tsi[:, None]) & (ws >= 0)
    rep = np.repeat(np.arange(n_events), n_w)[valid.ravel()]
    exp = {}
    for i, w in zip(rep, ws.ravel()[valid.ravel()]):
        exp[(f"k{keys[i]}", int(w))] = exp.get((f"k{keys[i]}", int(w)), 0) + 1

    acc = WindowAccumulator(float(size_s), step_s=float(step_s))
    outs = []
    chunk = -(-n_events // n_chunks)
    for i in range(n_chunks):
        s = tbl.slice(i * chunk, chunk)
        if s.num_rows:
            acc.update(s)
            outs.append(acc.take_closed())
    outs.append(acc.take_closed(final=True))
    got = {}
    for o in outs:
        d = o.to_pydict()
        for k, w, c in zip(
            d[KEY],
            [int(pd.Timestamp(x).value // 1000) for x in d["window_start"]],
            d["turn_count"],
        ):
            assert (k, w) not in got, "window released twice"
            got[(k, w)] = c
    assert got == exp
