"""Streaming driver tests: exactly-once sinks, checkpoint/resume equality,
in-actor streaming windows and join vs their batch/oracle counterparts
(FIXTURES.md t_resume / t_windows / t_join)."""

import shutil
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ray_ordered_stream.epochs import run_stream
from ray_ordered_stream.fixtures import gen_transcripts, oracle_ordered
from ray_ordered_stream.schema import ARRIVAL, KEY, SEQ
from ray_ordered_stream.state import OrderedConfig


@pytest.fixture(scope="module")
def stream_files(tmp_path_factory, ray_session):
    """Arrival-ordered multi-file landing directory (8 files)."""
    t = gen_transcripts(
        n_convs=12, min_turns=10, max_turns=60, lateness=60, dup_rate=0.03, seed=21
    )
    d = tmp_path_factory.mktemp("landing")
    n, n_files = t.num_rows, 8
    step = -(-n // n_files)
    files = []
    for i in range(n_files):
        f = d / f"part-{i:05d}.parquet"
        pq.write_table(t.slice(i * step, step), f)
        files.append(str(f))
    return t, files


def read_sink(res, name):
    return res.sinks[name].read().to_pandas()


def test_stream_end_to_end_and_exactly_once(stream_files, tmp_path):
    t, files = stream_files
    out = str(tmp_path / "run1")
    cfg = OrderedConfig(window_size_s=60.0, stream_join=True)
    res = run_stream(files, out, cfg, num_partitions=3, files_per_epoch=2,
                     collect_final_status=True)

    exp = oracle_ordered(t)
    got = (
        read_sink(res, "ordered")
        .sort_values([KEY, SEQ], kind="stable")
        .reset_index(drop=True)
    )
    assert res.total_emitted == len(exp)
    pd.testing.assert_frame_equal(
        got[[KEY, SEQ, "text", "emit_seq"]], exp[[KEY, SEQ, "text", "emit_seq"]]
    )
    # completion protocol on the final status
    fin = res.final_status
    assert (fin["buffered_count"] == 0).all()
    assert fin["result_count"].sum() == len(exp)

    # streaming windows == batch oracle (pandas)
    win = (
        read_sink(res, "windows")
        .sort_values([KEY, "window_start"])
        .reset_index(drop=True)
    )
    df = exp.copy()
    df["window_start"] = df["ts"].dt.floor("60s")
    wexp = (
        df.groupby([KEY, "window_start"])
        .agg(
            turn_count=("role", "size"),
            n_user=("role", lambda s: (s == "user").sum()),
            n_assistant=("role", lambda s: (s == "assistant").sum()),
        )
        .reset_index()
        .sort_values([KEY, "window_start"])
        .reset_index(drop=True)
    )
    assert len(win) == len(wexp)
    assert (win["turn_count"].values == wexp["turn_count"].values).all()
    assert (win["n_user"].values == wexp["n_user"].values).all()

    # streaming join == serial oracle (next assistant turn per user turn)
    joined = (
        read_sink(res, "joined")
        .sort_values([KEY, "user_turn_idx"])
        .reset_index(drop=True)
    )
    jexp_rows = []
    for k, g in exp.groupby(KEY):
        users = g[g["role"] == "user"]
        assistants = g[g["role"] == "assistant"]
        for _, u in users.iterrows():
            nxt = assistants[assistants[SEQ] > u[SEQ]]
            if len(nxt):
                jexp_rows.append((k, u[SEQ], nxt.iloc[0][SEQ]))
    assert len(joined) == len(jexp_rows)
    assert [
        (r[KEY], r["user_turn_idx"], r["assistant_turn_idx"])
        for _, r in joined.iterrows()
    ] == [(a, int(b), int(c)) for a, b, c in jexp_rows]


def test_kill_and_resume_equality(stream_files, tmp_path):
    t, files = stream_files
    cfg = OrderedConfig(window_size_s=60.0, stream_join=True,
                        session_gap_s=0.5,
                        pattern=("user", "tool", "user"))

    out_full = str(tmp_path / "full")
    res_full = run_stream(files, out_full, cfg, num_partitions=3, files_per_epoch=2)

    out_crash = str(tmp_path / "crash")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_stream(
            files, out_crash, cfg, num_partitions=3, files_per_epoch=2,
            fail_after_epoch=1,
        )
    res_resumed = run_stream(
        files, out_crash, cfg, num_partitions=3, files_per_epoch=2, resume=True
    )
    assert res_resumed.epochs_skipped == 2  # epochs 0,1 committed pre-crash

    for sink in ("ordered", "status", "windows", "joined", "sessions", "matches"):
        a = read_sink(res_full, sink)
        b = read_sink(res_resumed, sink)
        cols = sorted(a.columns)
        a = a[cols].sort_values(cols, kind="stable").reset_index(drop=True)
        b = b[cols].sort_values(cols, kind="stable").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


def test_resume_noop_when_complete(stream_files, tmp_path):
    t, files = stream_files
    out = str(tmp_path / "done")
    r1 = run_stream(files, out, OrderedConfig(), num_partitions=2, files_per_epoch=2)
    r2 = run_stream(files, out, OrderedConfig(), num_partitions=2, files_per_epoch=2)
    assert r2.epochs_run == 0
    assert r2.epochs_skipped == len(files) // 2
    assert (
        r1.sinks["ordered"].total_committed_rows()
        == r2.sinks["ordered"].total_committed_rows()
    )


def test_partition_count_must_match_checkpoint(stream_files, tmp_path):
    # SURVEY.md §7.4.1: P is recorded in the checkpoint lineage; resuming
    # with a different P must NOT silently resume from a partial cut — it
    # raises (both grow AND shrink, where the extra partitions' keyed state
    # would otherwise be silently dropped). resume=False restarts clean.
    t, files = stream_files
    out = str(tmp_path / "pmix")
    run_stream(files[:4], out, OrderedConfig(), num_partitions=3, files_per_epoch=2)
    with pytest.raises(ValueError, match="3 partitions"):
        run_stream(files, out, OrderedConfig(), num_partitions=4, files_per_epoch=2)
    with pytest.raises(ValueError, match="3 partitions"):
        run_stream(files, out, OrderedConfig(), num_partitions=2, files_per_epoch=2)
    res = run_stream(files, out, OrderedConfig(), num_partitions=4,
                     files_per_epoch=2, resume=False)
    assert res.epochs_skipped == 0
    exp = oracle_ordered(t)
    got = (
        read_sink(res, "ordered")
        .sort_values([KEY, SEQ], kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[[KEY, SEQ, "text", "emit_seq"]], exp[[KEY, SEQ, "text", "emit_seq"]]
    )
    # the restart rewrote the lineage meta: same-P resume is a clean no-op
    res2 = run_stream(files, out, OrderedConfig(), num_partitions=4,
                      files_per_epoch=2)
    assert res2.epochs_run == 0


def test_checkpoint_overwrite_clears_stale_buffer(tmp_path):
    # ADVICE r1: re-writing an epoch checkpoint whose previous write had a
    # non-empty buffer must not leave the stale buffer.parquet behind.
    from ray_ordered_stream.checkpoint import (
        read_partition_checkpoint,
        write_partition_checkpoint,
    )

    root = str(tmp_path / "out")
    buf = pa.table({"conv_id": ["c"], "turn_idx": pa.array([5], pa.int32())})
    write_partition_checkpoint(root, 0, 3, {"counters": {}, "buffer": buf})
    snap = read_partition_checkpoint(root, 0, 3)
    assert snap["buffer"] is not None and snap["buffer"].num_rows == 1
    write_partition_checkpoint(root, 0, 3, {"counters": {}, "buffer": None})
    snap = read_partition_checkpoint(root, 0, 3)
    assert snap["buffer"] is None  # no phantom rows


def test_checkpoint_compaction_bounds_restore(tmp_path):
    # Full snapshots every K epochs bound restore to <= K delta reads.
    from ray_ordered_stream.checkpoint import (
        read_merged_checkpoint,
        write_partition_checkpoint,
    )

    root = str(tmp_path / "out")
    for e in range(60):
        full = e % 16 == 0
        counters = {f"k{e}": (1, 0, 1, e + 1, False, "")}
        if full:  # full snapshot carries everything seen so far
            counters = {f"k{i}": (1, 0, 1, i + 1, False, "") for i in range(e + 1)}
        write_partition_checkpoint(
            root, 0, e, {"counters": counters, "buffer": None}, full=full
        )
    snap = read_merged_checkpoint(root, 0, 59)
    assert len(snap["counters"]) == 60
    assert snap["counters"]["k59"][3] == 60
    # deleting pre-base epochs must not affect restore (bounded lineage)
    import shutil

    for e in range(48):
        shutil.rmtree(tmp_path / "out" / "ckpt" / "p=00000" / f"epoch-{e:05d}")
    snap2 = read_merged_checkpoint(root, 0, 59)
    assert {k for k in snap2["counters"]} >= {f"k{i}" for i in range(48, 60)}


def _write_files_atomic(tbl, d, n_files, start=0, total=None):
    import os

    total = total or n_files
    n = tbl.num_rows
    step = -(-n // total)
    out = []
    for i in range(start, start + n_files):
        tmp = d / f"part-{i:05d}.parquet.tmp"
        pq.write_table(tbl.slice(i * step, step), tmp)
        os.replace(tmp, d / f"part-{i:05d}.parquet")
        out.append(str(d / f"part-{i:05d}.parquet"))
    return out


def test_continuous_source_processes_midrun_files(tmp_path, ray_session):
    # files land WHILE the loop runs (producer thread, write+rename), then a
    # stop sentinel; every turn must be processed exactly once.
    import threading
    import time

    from ray_ordered_stream.epochs import run_stream_continuous

    t = gen_transcripts(n_convs=10, min_turns=8, max_turns=30, lateness=40,
                        dup_rate=0.02, seed=33)
    land = tmp_path / "landing"
    land.mkdir()
    _write_files_atomic(t, land, 4, start=0, total=10)

    def producer():
        time.sleep(0.6)
        _write_files_atomic(t, land, 6, start=4, total=10)
        time.sleep(0.3)
        (land / "_STOP").write_text("")

    th = threading.Thread(target=producer)
    th.start()
    res = run_stream_continuous(
        str(land), str(tmp_path / "out"),
        OrderedConfig(window_size_s=60.0, session_gap_s=0.5,
                      pattern=("user", "tool", "user")),
        num_partitions=3, files_per_epoch=2, poll_interval_s=0.1,
        collect_final_status=True,
    )
    th.join()
    exp = oracle_ordered(t)
    assert res.total_emitted == len(exp)
    got = (
        read_sink(res, "ordered")
        .sort_values([KEY, SEQ], kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[[KEY, SEQ, "text", "emit_seq"]], exp[[KEY, SEQ, "text", "emit_seq"]]
    )
    assert (res.final_status["buffered_count"] == 0).all()

    # the session and CEP side outputs also commit exactly once in
    # continuous mode (flush epoch covers whatever the watermark left open)
    ses = read_sink(res, "sessions")
    assert len(ses) == len(exp)  # gap 0.5s < 1.0s spacing -> one per turn
    assert (ses["turn_count"] == 1).all()
    matches = read_sink(res, "matches")
    n_pat = 0
    for _k, g in exp.sort_values([KEY, SEQ]).groupby(KEY):
        rs = g["role"].tolist()
        n_pat += sum(
            rs[i : i + 3] == ["user", "tool", "user"] for i in range(len(rs) - 2)
        )
    assert len(matches) == n_pat > 0


def test_continuous_crash_resume_exactly_once(tmp_path, ray_session):
    # crash after epoch 1, more files land, resume -> identical output to an
    # uninterrupted run over the same file sequence.
    from ray_ordered_stream.epochs import run_stream, run_stream_continuous

    t = gen_transcripts(n_convs=8, min_turns=8, max_turns=25, lateness=30,
                        dup_rate=0.02, seed=34)
    land = tmp_path / "landing"
    land.mkdir()
    files = _write_files_atomic(t, land, 6, start=0, total=6)

    out = str(tmp_path / "out")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_stream_continuous(
            str(land), out, num_partitions=3, files_per_epoch=2,
            poll_interval_s=0.05, fail_after_epoch=1,
        )
    (land / "_STOP").write_text("")
    res = run_stream_continuous(
        str(land), out, num_partitions=3, files_per_epoch=2, poll_interval_s=0.05
    )
    assert res.epochs_skipped >= 1

    ref = run_stream(files, str(tmp_path / "ref"), num_partitions=3,
                     files_per_epoch=2)
    for sink in ("ordered", "status"):
        a = read_sink(res, sink)
        b = read_sink(ref, sink)
        cols = sorted(a.columns)
        a = a[cols].sort_values(cols, kind="stable").reset_index(drop=True)
        b = b[cols].sort_values(cols, kind="stable").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


def test_long_stream_compaction_resume(tmp_path, ray_session):
    # 12 epochs, full checkpoints every 4: resume after a crash must read
    # only from the newest FULL base (bounded lineage) and reproduce the
    # uninterrupted output.
    from ray_ordered_stream.epochs import run_stream

    t = gen_transcripts(n_convs=10, min_turns=10, max_turns=40, lateness=50,
                        dup_rate=0.02, seed=77)
    d = tmp_path / "landing"
    d.mkdir()
    n, n_files = t.num_rows, 12
    step = -(-n // n_files)
    files = []
    for i in range(n_files):
        f = d / f"part-{i:05d}.parquet"
        pq.write_table(t.slice(i * step, step), f)
        files.append(str(f))

    ref = run_stream(files, str(tmp_path / "ref"), num_partitions=3,
                     files_per_epoch=1, checkpoint_full_every=4)
    assert ref.epochs_run == 12

    out = str(tmp_path / "crash")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_stream(files, out, num_partitions=3, files_per_epoch=1,
                   checkpoint_full_every=4, fail_after_epoch=9)
    # FULL markers exist at epochs 0,4,8 for every partition
    for p in range(3):
        for e in (0, 4, 8):
            assert (Path(out) / "ckpt" / f"p={p:05d}" / f"epoch-{e:05d}" / "_FULL").exists()
    # deleting pre-base delta epochs must not hurt the resume (bounded read)
    import shutil as _sh

    for p in range(3):
        for e in range(0, 7):
            if e % 4 != 0:
                _sh.rmtree(Path(out) / "ckpt" / f"p={p:05d}" / f"epoch-{e:05d}",
                           ignore_errors=True)
    res = run_stream(files, out, num_partitions=3, files_per_epoch=1,
                     checkpoint_full_every=4)
    assert res.epochs_skipped >= 9
    for sink in ("ordered", "status"):
        a = read_sink(ref, sink)
        b = read_sink(res, sink)
        cols = sorted(a.columns)
        a = a[cols].sort_values(cols, kind="stable").reset_index(drop=True)
        b = b[cols].sort_values(cols, kind="stable").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


def test_rerun_overwrites_byte_identical(tmp_path, stream_files):
    # deterministic re-run: running the same stream into the same out_root
    # twice produces byte-identical sink parts (the property exactly-once
    # overwrite relies on).
    import hashlib

    from ray_ordered_stream.epochs import run_stream

    t, files = stream_files
    out = str(tmp_path / "out")
    run_stream(files, out, num_partitions=3, files_per_epoch=2, resume=False)

    def digest():
        h = {}
        for f in sorted(Path(out).glob("ordered/epoch=*/*.parquet")):
            h[str(f)] = hashlib.md5(f.read_bytes()).hexdigest()
        return h

    first = digest()
    assert first
    run_stream(files, out, num_partitions=3, files_per_epoch=2, resume=False)
    assert digest() == first


def test_composite_key_ordering(ray_session, tmp_path):
    # composite (session, contract)-style key through the full engine
    import ray.data as rd

    from ray_ordered_stream.ordered import ordered_process
    from ray_ordered_stream.partitioning import composite_key

    rows = []
    for sess in ("s1", "s2"):
        for contract in (1, 2):
            for seq in (2, 0, 1):  # shuffled arrival per composite key
                rows.append(
                    {"session": sess, "contract": contract, "turn_idx": seq,
                     "text": f"{sess}/{contract}/{seq}"}
                )
    ds = composite_key(rd.from_items(rows), ["session", "contract"], "conv_id")
    res = ordered_process(ds, OrderedConfig(), num_partitions=2)
    got = res.ordered.to_pandas().sort_values(["conv_id", "turn_idx"])
    assert len(got) == len(rows)
    # per composite key, emit_seq follows turn order
    for _, g in got.groupby("conv_id"):
        assert list(g["emit_seq"]) == [1, 2, 3]
        assert list(g["turn_idx"]) == [0, 1, 2]


def test_continuous_idle_timeout_flushes_partial_group(tmp_path, ray_session):
    # 3 files with files_per_epoch=2 and NO stop sentinel: the idle timeout
    # must fire (review r2: unassigned leftovers used to reset the idle
    # clock forever), the partial group must be processed, and open windows
    # must be flushed by the terminal flush epoch.
    from ray_ordered_stream.epochs import run_stream_continuous

    t = gen_transcripts(n_convs=6, min_turns=6, max_turns=20, lateness=20,
                        dup_rate=0.0, seed=55)
    land = tmp_path / "landing"
    land.mkdir()
    _write_files_atomic(t, land, 3, start=0, total=3)
    res = run_stream_continuous(
        str(land), str(tmp_path / "out"),
        OrderedConfig(window_size_s=3600.0),
        num_partitions=2, files_per_epoch=2,
        poll_interval_s=0.05, idle_timeout_s=1.0,
    )
    exp = oracle_ordered(t)
    assert res.total_emitted == len(exp)  # all 3 files processed
    # every (key, window) present — including those only closed by the
    # terminal flush
    win = read_sink(res, "windows")
    df = exp.copy()
    df["window_start"] = df["ts"].dt.floor("3600s")
    n_exp = df.groupby([KEY, "window_start"]).ngroups
    assert len(win) == n_exp
    assert win["turn_count"].sum() == len(exp)


def _book_stream(seed=19):
    """Transcript stream augmented with deterministic book-event columns."""
    import numpy as np

    t = gen_transcripts(n_convs=8, min_turns=8, max_turns=30, lateness=20,
                        seed=seed)
    ev = np.arange(t.num_rows, dtype=np.int64)
    side = np.where(ev % 2 == 0, "BUY", "SELL")
    typ = np.where(ev % 5 == 0, "EXECUTED", "NEW")
    return (
        t.append_column("type", pa.array(typ, pa.string()))
        .append_column("side", pa.array(side, pa.string()))
        .append_column("price", pa.array(ev % 15 + 1, pa.int64()))
        .append_column("qty", pa.array(ev % 6 + 1, pa.int64()))
    )


def test_depth_sink_streams_and_resumes_identically(tmp_path, ray_session):
    """The 'depth' sink emits per-epoch snapshots of touched keys (the
    micro-batch analogue of the reference's continuous market_depth
    output); the last snapshot per key equals the final book, and a
    crash-resume run reproduces the sink byte-identically."""
    import pyarrow.compute as pc

    from ray_ordered_stream.book import flatten_depth
    from ray_ordered_stream.ordered import OrderedProcessor

    t = _book_stream()
    files = []
    land = tmp_path / "landing"
    land.mkdir()
    n, nf = t.num_rows, 6
    step = -(-n // nf)
    for i in range(nf):
        f = land / f"part-{i:05d}.parquet"
        pq.write_table(t.slice(i * step, step), f)
        files.append(str(f))
    cfg = OrderedConfig(with_book=True, book_depth=4, warmup_rows=0)

    res = run_stream(files, str(tmp_path / "a"), cfg, num_partitions=3,
                     files_per_epoch=2)
    depth = res.sinks["depth"].read().to_pandas()
    assert len(depth) > 0

    # final snapshot per key (max seq_id) == a fresh one-shot run's book
    import pandas as pd

    last = (
        depth.sort_values(["key", "seq_id"], kind="stable")
        .drop_duplicates("key", keep="last")
        .reset_index(drop=True)
    )
    proc = OrderedProcessor(cfg, num_partitions=3)
    proc.feed_epoch(t, pd.Timestamp("1970-01-01"))
    exp = proc.book_depth_table(4).to_pandas()
    proc.shutdown()
    fl_last = flatten_depth(pa.Table.from_pandas(last, preserve_index=False))
    fl_exp = flatten_depth(pa.Table.from_pandas(
        exp.rename(columns={"key": "key"}), preserve_index=False))
    a = fl_last.to_pandas().sort_values(["conv_id", "side", "level"]).reset_index(drop=True)
    b = fl_exp.to_pandas().sort_values(["conv_id", "side", "level"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    # crash after epoch 1, resume: depth sink content identical to run A
    with pytest.raises(RuntimeError):
        run_stream(files, str(tmp_path / "b"), cfg, num_partitions=3,
                   files_per_epoch=2, fail_after_epoch=1)
    res_b = run_stream(files, str(tmp_path / "b"), cfg, num_partitions=3,
                       files_per_epoch=2)
    da = depth.sort_values(["key", "seq_id"], kind="stable").reset_index(drop=True)
    db = (
        res_b.sinks["depth"].read().to_pandas()
        .sort_values(["key", "seq_id"], kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(da, db)


def test_continuous_salt_waits_for_first_files(tmp_path, ray_session):
    """Consumer started on an EMPTY landing dir with salt_hot_keys=True must
    wait for the first files (not permanently record a pin-free lineage),
    then pin hot keys and process everything exactly once."""
    import threading
    import time

    from ray_ordered_stream.checkpoint import read_lineage_meta
    from ray_ordered_stream.epochs import run_stream_continuous

    t = gen_transcripts(n_convs=8, min_turns=10, max_turns=60, lateness=30,
                        dup_rate=0.0, seed=44, degree=3.0)
    land = tmp_path / "landing"
    land.mkdir()
    out = tmp_path / "out"

    def producer():
        time.sleep(0.8)  # consumer is already polling an empty dir
        _write_files_atomic(t, land, 6, start=0, total=6)
        time.sleep(0.3)
        (land / "_STOP").write_text("")

    th = threading.Thread(target=producer)
    th.start()
    res = run_stream_continuous(
        str(land), str(out), OrderedConfig(),
        num_partitions=3, files_per_epoch=2, poll_interval_s=0.1,
        salt_hot_keys=True, idle_timeout_s=30.0,
    )
    th.join()
    exp = oracle_ordered(t)
    assert res.total_emitted == len(exp)
    meta = read_lineage_meta(str(out))
    assert meta is not None and meta.get("overrides"), meta
    got = (
        read_sink(res, "ordered")
        .sort_values([KEY, SEQ], kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[[KEY, SEQ, "text"]], exp[[KEY, SEQ, "text"]]
    )


def test_ingest_ts_stamp_deterministic_and_monotone(stream_files, tmp_path):
    """stamp_ingest_ts: every ordered-sink row carries the committing
    epoch's tick; re-running after an injected crash reproduces the SAME
    ingest_ts per row (exactly-once includes the latency surface), and
    within a key ingest_ts is monotone in turn_idx (a turn cannot commit
    before its predecessors)."""
    t, files = stream_files
    cfg = OrderedConfig(stamp_ingest_ts=True)
    full = run_stream(files, str(tmp_path / "full"), cfg,
                      num_partitions=3, files_per_epoch=2)
    got = (
        read_sink(full, "ordered")
        .sort_values([KEY, SEQ], kind="stable")
        .reset_index(drop=True)
    )
    assert "ingest_ts" in got.columns
    # epoch ticks: 1970-01-01 + epoch seconds
    ep = got["ingest_ts"].astype("int64") // 1_000_000_000
    assert (ep >= 0).all() and (ep < len(files) // 2 + 1).all()
    assert (
        got.groupby(KEY)["ingest_ts"].apply(lambda s: s.is_monotonic_increasing)
    ).all()

    out = str(tmp_path / "resumed")
    with pytest.raises(RuntimeError):
        run_stream(files, out, cfg, num_partitions=3, files_per_epoch=2,
                   fail_after_epoch=1)
    resumed = run_stream(files, out, cfg, num_partitions=3, files_per_epoch=2)
    got2 = (
        read_sink(resumed, "ordered")
        .sort_values([KEY, SEQ], kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, got2)
