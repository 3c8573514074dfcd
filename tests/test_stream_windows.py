"""Streaming sliding/session window accumulators (stream_ops) vs pandas
oracles, plus end-to-end sink wiring through run_stream.

These are the streaming counterparts the north rule mandates alongside the
tumbling accumulator (BASELINE.json north_rule: "tumbling/sliding/session
windows, watermarks"); the batch equivalents live in windows.py.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ray_ordered_stream.fixtures import gen_transcripts, oracle_ordered
from ray_ordered_stream.schema import KEY, SEQ
from ray_ordered_stream.state import OrderedConfig
from ray_ordered_stream.stream_ops import SessionAccumulator, WindowAccumulator

US = 1_000_000


def _sliding_oracle(df: pd.DataFrame, size_s: float, step_s: float) -> pd.DataFrame:
    size, step = int(size_s * US), int(step_s * US)
    n_w = -(-size // step)
    tsi = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    last_ws = (tsi // step) * step
    ws = last_ws[:, None] - (np.arange(n_w) * step)[None, :]
    valid = ((ws + size) > tsi[:, None]) & (ws >= 0)
    rep = np.repeat(np.arange(len(df)), n_w)[valid.ravel()]
    out = pd.DataFrame(
        {
            KEY: df[KEY].to_numpy()[rep],
            "window_start": ws.ravel()[valid.ravel()],
            "n_user": (df["role"].to_numpy()[rep] == "user").astype("int64"),
            "n_assistant": (df["role"].to_numpy()[rep] == "assistant").astype("int64"),
        }
    )
    g = out.groupby([KEY, "window_start"], sort=True)
    return (
        g.agg(
            turn_count=("n_user", "size"),
            n_user=("n_user", "sum"),
            n_assistant=("n_assistant", "sum"),
        )
        .reset_index()
    )


def _feed_chunks(acc, tbl: pa.Table, n_chunks: int) -> list[pa.Table]:
    """Feed a ts-ordered table in n chunks, draining closed output between
    feeds (the epoch cadence)."""
    outs = []
    n = tbl.num_rows
    step = -(-n // n_chunks)
    for i in range(n_chunks):
        acc.update(tbl.slice(i * step, step))
        outs.append(acc.take_closed())
    outs.append(acc.take_closed(final=True))
    return outs


def test_sliding_accumulator_matches_batch_oracle():
    t = gen_transcripts(n_convs=6, min_turns=8, max_turns=40, seed=7)
    exp_df = oracle_ordered(t)
    inorder = pa.Table.from_pandas(
        exp_df.sort_values("ts", kind="stable"), preserve_index=False
    )
    acc = WindowAccumulator(120.0, step_s=45.0)
    outs = _feed_chunks(acc, inorder, 5)
    # watermark gating actually released something before the final flush
    assert sum(o.num_rows for o in outs[:-1]) > 0
    got = (
        pa.concat_tables(outs)
        .to_pandas()
        .assign(
            window_start=lambda d: d["window_start"]
            .astype("datetime64[us]")
            .astype("int64")
        )
        .sort_values([KEY, "window_start"])
        .reset_index(drop=True)
    )[[KEY, "window_start", "turn_count", "n_user", "n_assistant"]]
    exp = _sliding_oracle(exp_df, 120.0, 45.0)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def _mk(key_ts: list[tuple[str, float]], role: str = "user") -> pa.Table:
    keys, tss = zip(*key_ts)
    return pa.table(
        {
            KEY: pa.array(keys, pa.string()),
            SEQ: pa.array(range(len(keys)), pa.int32()),
            "role": pa.array([role] * len(keys), pa.string()),
            "ts": pa.array(
                (np.asarray(tss) * US).astype("int64"), pa.int64()
            ).cast(pa.timestamp("us")),
        }
    )


def test_session_accumulator_sessions_and_sids():
    # key a: ts 0,1,2 | 10,11 | 30  (gap 5) -> three sessions, sids 0,1,2
    # key b: ts 0, 20            -> two sessions
    acc = SessionAccumulator(5.0)
    acc.update(_mk([("a", 0), ("b", 0), ("a", 1), ("a", 2)]))
    acc.update(_mk([("a", 10), ("a", 11), ("b", 20)]))
    early = acc.take_closed()          # watermark 20: a's [0..2] closed (2+5<20)
    assert early.num_rows >= 1
    acc.update(_mk([("a", 30)]))
    rest = pa.concat_tables([acc.take_closed(), acc.take_closed(final=True)])
    got = (
        pa.concat_tables([early, rest])
        .to_pandas()
        .sort_values([KEY, "session_id"])
        .reset_index(drop=True)
    )
    exp = pd.DataFrame(
        {
            KEY: ["a", "a", "a", "b", "b"],
            "session_id": [0, 1, 2, 0, 1],
            "start_s": [0, 10, 30, 0, 20],
            "end_s": [2, 11, 30, 0, 20],
            "turn_count": [3, 2, 1, 1, 1],
        }
    )
    assert got["session_id"].tolist() == exp["session_id"].tolist()
    assert got[KEY].tolist() == exp[KEY].tolist()
    assert got["turn_count"].tolist() == exp["turn_count"].tolist()
    assert (
        got["session_start"].astype("datetime64[us]").astype("int64") // US
    ).tolist() == exp["start_s"].tolist()
    assert (
        got["session_end"].astype("datetime64[us]").astype("int64") // US
    ).tolist() == exp["end_s"].tolist()


def test_session_chain_merge_needs_second_pass():
    # open A=[0,100] (events 0,60,100), then a batch lands B=[20,30] and
    # C=[90,95] with gap 5: sorted by start the single-pass boundary check
    # sees C.start(90) - B.end(30) > gap, but C overlaps A -- the chain
    # merge must iterate to collapse all three into [0,100].
    acc = SessionAccumulator(5.0, allowed_lateness_s=1000.0)
    acc.update(_mk([("k", 0), ("k", 60), ("k", 100)]))
    assert len(acc._kc) == 3  # gap 5 -> three singletons... bridge them:
    acc.update(_mk([("k", 3), ("k", 57), ("k", 97)]))
    assert len(acc._kc) == 3
    # now the true second-pass case: a long open session + nested later ones
    acc2 = SessionAccumulator(5.0, allowed_lateness_s=1000.0)
    acc2.update(_mk([("k", 0), ("k", 4), ("k", 8)]))      # open [0,8]
    acc2.update(_mk([("k", 2), ("k", 12)]))               # [2,2] inside, [12] chains
    out = acc2.take_closed(final=True).to_pandas()
    assert len(out) == 1
    assert out["turn_count"].iloc[0] == 5
    assert out["session_end"].iloc[0].timestamp() == 12.0


def test_session_snapshot_restore_continuity():
    chunks = [
        _mk([("a", 0), ("b", 0), ("a", 1)]),
        _mk([("a", 50), ("b", 51)]),
        _mk([("a", 100), ("b", 101), ("a", 102)]),
    ]
    ref = SessionAccumulator(5.0)
    for c in chunks[:2]:
        ref.update(c)
    ref.take_closed()  # releases some sessions -> sid counters advance
    snap = ref.snapshot()
    dup = SessionAccumulator(5.0)
    dup.restore(snap)
    ref.update(chunks[2])
    dup.update(chunks[2])
    a = pa.concat_tables([ref.take_closed(final=True)]).to_pandas()
    b = pa.concat_tables([dup.take_closed(final=True)]).to_pandas()
    pd.testing.assert_frame_equal(a, b)


@pytest.fixture(scope="module")
def sliding_stream_files(tmp_path_factory, ray_session):
    t = gen_transcripts(
        n_convs=10, min_turns=10, max_turns=50, lateness=40, dup_rate=0.02, seed=33
    )
    d = tmp_path_factory.mktemp("landing_sw")
    n, n_files = t.num_rows, 6
    step = -(-n // n_files)
    files = []
    for i in range(n_files):
        f = d / f"part-{i:05d}.parquet"
        pq.write_table(t.slice(i * step, step), f)
        files.append(str(f))
    return t, files


def test_stream_sliding_and_session_sinks_e2e(sliding_stream_files, tmp_path):
    from ray_ordered_stream.epochs import run_stream

    t, files = sliding_stream_files
    # per-conv turn spacing is n_convs/rate = 1.0s, so gap 0.5s makes every
    # turn its own session (exercises per-key sid progression end to end)
    cfg = OrderedConfig(
        window_size_s=120.0, window_step_s=60.0, window_lateness_s=15.0,
        session_gap_s=0.5,
    )
    res = run_stream(files, str(tmp_path / "run"), cfg, num_partitions=3,
                     files_per_epoch=2)
    exp = oracle_ordered(t)

    win = (
        res.sinks["windows"].read().to_pandas()
        .assign(
            window_start=lambda d: d["window_start"]
            .astype("datetime64[us]")
            .astype("int64")
        )
        .sort_values([KEY, "window_start"])
        .reset_index(drop=True)
    )[[KEY, "window_start", "turn_count", "n_user", "n_assistant"]]
    wexp = _sliding_oracle(exp, 120.0, 60.0)
    pd.testing.assert_frame_equal(win, wexp, check_dtype=False)

    ses = (
        res.sinks["sessions"].read().to_pandas()
        .sort_values([KEY, "session_id"])
        .reset_index(drop=True)
    )
    sexp = exp.sort_values([KEY, "ts"], kind="stable").reset_index(drop=True)
    sexp["session_id"] = sexp.groupby(KEY).cumcount()
    assert len(ses) == len(sexp)
    assert (ses["turn_count"] == 1).all()
    pd.testing.assert_frame_equal(
        ses[[KEY, "session_id"]].reset_index(drop=True),
        sexp[[KEY, "session_id"]].reset_index(drop=True),
        check_dtype=False,
    )
    assert (
        ses["session_start"].astype("datetime64[us]").to_numpy()
        == sexp["ts"].astype("datetime64[us]").to_numpy()
    ).all()


def test_stream_joiner_within_us_matches_batch(ray_session):
    """Streaming joiner with an event-time bound == batch join_user_assistant
    with the same within_us."""
    import ray.data

    from ray_ordered_stream.join import join_user_assistant
    from ray_ordered_stream.stream_ops import StreamJoiner

    t = gen_transcripts(n_convs=8, min_turns=10, max_turns=40, seed=17)
    exp_df = oracle_ordered(t)
    within = 3_000_000  # 3s; per-conv spacing is 1s -> some pairs drop
    inorder = pa.Table.from_pandas(
        exp_df.sort_values([KEY, SEQ], kind="stable"), preserve_index=False
    )
    j = StreamJoiner(within_us=within)
    outs = []
    n_chunks = 6
    step = -(-inorder.num_rows // n_chunks)
    for i in range(n_chunks):
        outs.append(j.update(inorder.slice(i * step, step)))
    got = (
        pa.concat_tables(outs)
        .to_pandas()
        .sort_values([KEY, "user_turn_idx"])
        .reset_index(drop=True)
    )
    ds = ray.data.from_arrow(
        pa.Table.from_pandas(exp_df, preserve_index=False)
    )
    exp = (
        join_user_assistant(ds, within_us=within)
        .to_pandas()
        .sort_values([KEY, "user_turn_idx"])
        .reset_index(drop=True)
    )
    assert len(exp) > 0
    pd.testing.assert_frame_equal(
        got[[KEY, "user_turn_idx", "assistant_turn_idx", "lag_us"]],
        exp[[KEY, "user_turn_idx", "assistant_turn_idx", "lag_us"]],
        check_dtype=False,
    )


def test_session_merge_many_nested_singletons_converges():
    """Regression (review): one long open session + 65+ late singletons
    inside it must collapse to ONE session (per-key cummax merge, not a
    capped prev-element chain)."""
    acc = SessionAccumulator(5.0, allowed_lateness_s=10_000.0)
    acc.update(_mk([("k", 0.0), ("k", 4.0), ("k", 1000.0)]))  # opens [0,4],[1000]
    acc.update(_mk([("k", 4.0 + 4.96 * i) for i in range(1, 202)]))  # bridge chain
    out = acc.take_closed(final=True).to_pandas()
    assert len(out) == 1
    assert out["turn_count"].iloc[0] == 204
