"""End-to-end engine tests: ordered_process over Ray Datasets vs the serial
oracle, multi-partition determinism (same output at P=2 and P=8), final
status completion — the pipeline-level re-expression of
OrderBookProcessingPipelineTest (reference, see SURVEY.md §5)."""

import pandas as pd
import pyarrow as pa
import pytest

from ray_ordered_stream.fixtures import oracle_final_status, oracle_ordered, tiny_fixture
from ray_ordered_stream.ordered import OrderedProcessor, ordered_process
from ray_ordered_stream.schema import KEY, SEQ
from ray_ordered_stream.state import OrderedConfig

TS = pd.Timestamp("2025-06-01")


def sorted_df(ds_or_tbl):
    if isinstance(ds_or_tbl, pa.Table):
        df = ds_or_tbl.to_pandas()
    else:
        df = ds_or_tbl.to_pandas()
    return df.sort_values([KEY, SEQ], kind="stable").reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
def test_ordered_process_table_input():
    t = tiny_fixture("t_multi")
    res = ordered_process(t, OrderedConfig(), num_partitions=2)
    got = sorted_df(res.ordered)
    exp = oracle_ordered(t)
    pd.testing.assert_frame_equal(
        got[[KEY, SEQ, "text", "emit_seq"]], exp[[KEY, SEQ, "text", "emit_seq"]]
    )


@pytest.mark.usefixtures("ray_session")
def test_ordered_process_dataset_input_and_partition_invariance():
    import ray.data as rd

    t = tiny_fixture("t_skew")
    ds = rd.from_arrow(t).repartition(8)
    out = {}
    for P in (2, 8):
        res = ordered_process(ds, OrderedConfig(), num_partitions=P)
        out[P] = sorted_df(res.ordered)
    pd.testing.assert_frame_equal(out[2], out[8])
    exp = oracle_ordered(t)
    pd.testing.assert_frame_equal(
        out[2][[KEY, SEQ, "text", "emit_seq"]], exp[[KEY, SEQ, "text", "emit_seq"]]
    )


@pytest.mark.usefixtures("ray_session")
def test_final_status_completion_protocol():
    # ≙ run-perf-test.sh check_processing_progress: all input rows accounted
    # for; every key fully processed with empty buffers.
    t = tiny_fixture("t_multi")
    proc = OrderedProcessor(OrderedConfig(), num_partitions=4)
    proc.feed_epoch(t, TS)
    fin = proc.final_status(TS).to_pandas()
    exp = oracle_final_status(t).sort_values(KEY).reset_index(drop=True)
    fin = fin.sort_values(KEY).reset_index(drop=True)
    assert fin["result_count"].sum() == exp["result_count"].sum()
    assert (fin["buffered_count"] == 0).all()
    assert fin["last_event_received"].all()
    assert list(fin["received_count"]) == list(exp["received_count"])
    assert list(fin["duplicate_count"]) == list(exp["duplicate_count"])
    proc.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_multi_epoch_streaming_feed():
    t = tiny_fixture("t_multi")
    proc = OrderedProcessor(OrderedConfig(), num_partitions=3)
    n = t.num_rows
    step = 101
    for i, lo in enumerate(range(0, n, step)):
        proc.feed_epoch(t.slice(lo, min(step, n - lo)), TS + pd.Timedelta(seconds=i))
    res = proc.datasets()
    got = sorted_df(res.ordered)
    exp = oracle_ordered(t)
    pd.testing.assert_frame_equal(
        got[[KEY, SEQ, "text", "emit_seq"]], exp[[KEY, SEQ, "text", "emit_seq"]]
    )
    assert proc.buffered_rows() == 0
    proc.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_hot_key_overrides_do_not_change_results():
    from ray_ordered_stream.partitioning import compute_hot_key_overrides

    t = tiny_fixture("t_skew")
    ov = compute_hot_key_overrides(t, KEY, 4)
    assert len(ov) > 0
    res = ordered_process(t, OrderedConfig(), num_partitions=4, overrides=ov)
    got = sorted_df(res.ordered)
    exp = oracle_ordered(t)
    pd.testing.assert_frame_equal(
        got[[KEY, SEQ, "text", "emit_seq"]], exp[[KEY, SEQ, "text", "emit_seq"]]
    )


@pytest.mark.usefixtures("ray_session")
def test_emit_cap_with_drain_loop():
    t = tiny_fixture("t_multi")
    res = ordered_process(
        t, OrderedConfig(max_emit_per_round=40), num_partitions=2
    )
    got = sorted_df(res.ordered)
    exp = oracle_ordered(t)
    pd.testing.assert_frame_equal(
        got[[KEY, SEQ, "text", "emit_seq"]], exp[[KEY, SEQ, "text", "emit_seq"]]
    )


@pytest.mark.usefixtures("ray_session")
def test_engine_level_every_event_status_trajectory():
    # FIXTURES.md §3 golden trajectory through the FULL engine (P=1 keeps the
    # global arrival order; ≙ OrderBookProcessingPipelineTest.java:140-195).
    t = tiny_fixture("t_reverse")
    res = ordered_process(
        t, OrderedConfig(status_every_event=True), num_partitions=1
    )
    s = res.status.to_pandas()
    assert list(s["received_count"]) == [1, 2, 3]
    assert list(s["buffered_count"]) == [1, 2, 0]
    assert s["last_processed_sequence"].iloc[2] == 2
    assert list(s["result_count"]) == [0, 0, 3]
    exp = oracle_ordered(t)
    got = sorted_df(res.ordered)
    pd.testing.assert_frame_equal(
        got[[KEY, SEQ, "text", "emit_seq"]], exp[[KEY, SEQ, "text", "emit_seq"]]
    )


@pytest.mark.usefixtures("ray_session")
def test_range_partitioning_matches_oracle():
    from ray_ordered_stream.partitioning import compute_range_bounds

    t = tiny_fixture("t_multi")
    bounds = compute_range_bounds(t, KEY, 3)
    assert len(bounds) >= 1
    proc = OrderedProcessor(OrderedConfig(), num_partitions=3, range_bounds=bounds)
    proc.feed_epoch(t, TS)
    res = proc.datasets()
    got = sorted_df(res.ordered)
    exp = oracle_ordered(t)
    pd.testing.assert_frame_equal(
        got[[KEY, SEQ, "text", "emit_seq"]], exp[[KEY, SEQ, "text", "emit_seq"]]
    )
    proc.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_null_key_rows_quarantined_to_dlq():
    import pyarrow as pa

    t = tiny_fixture("t_multi")
    # corrupt two rows: null conv_id / null turn_idx
    bad = pa.table(
        {
            KEY: pa.array([None, "cX"], pa.string()),
            SEQ: pa.array([0, None], pa.int32()),
            "role": pa.array(["user", "user"]),
            "text": pa.array(["b1", "b2"]),
            "tool": pa.array(["", ""]),
            "ts": t["ts"].slice(0, 2),
            "arrival_seq": pa.array([10**9, 10**9 + 1], pa.int64()),
        }
    )
    nullable_schema = pa.schema([pa.field(f.name, f.type, nullable=True) for f in t.schema])
    mixed = pa.concat_tables([t.cast(nullable_schema), bad.cast(nullable_schema)])
    proc = OrderedProcessor(OrderedConfig(), num_partitions=2)
    proc.feed_epoch(mixed, TS)
    res = proc.datasets()
    got = sorted_df(res.ordered)
    exp = oracle_ordered(t)  # clean rows only
    pd.testing.assert_frame_equal(
        got[[KEY, SEQ, "text", "emit_seq"]], exp[[KEY, SEQ, "text", "emit_seq"]]
    )
    import ray

    dlq = [ray.get(w.take_dlq.remote()) for w in proc.workers]
    dlq_rows = sum(d.num_rows for d in dlq if d is not None)
    assert dlq_rows == 2
    proc.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_locality_split_matches_oracle(tmp_path, monkeypatch):
    # locality_split routes each node's partitions through a node-affine
    # _read_and_split_parts task. One local node can't host two raylets, so
    # stub the affinity strategy to DEFAULT and fake a 2-node partition map —
    # this exercises the full data path (parts pruning, per-node task fan-out,
    # shard-ref reassembly) minus the placement hint itself.
    import numpy as np
    import pyarrow.parquet as pq
    import ray
    import ray.util.scheduling_strategies as rss

    from ray_ordered_stream.fixtures import gen_transcripts

    monkeypatch.setattr(
        rss, "NodeAffinitySchedulingStrategy", lambda node_id, soft: "DEFAULT"
    )
    t = gen_transcripts(n_convs=40, min_turns=3, max_turns=30, lateness=8,
                        dup_rate=0.1)
    files = []
    for i, lo in enumerate(range(0, t.num_rows, 211)):
        p = str(tmp_path / f"f{i:03d}.parquet")
        pq.write_table(t.slice(lo, 211), p)
        files.append(p)
    proc = OrderedProcessor(
        OrderedConfig(locality_split=True, warmup_rows=256), num_partitions=4
    )
    nd = list(proc._node_parts())[0]
    proc._node_parts_cache = {nd: [0, 2], "other-node": [3, 1]}
    e_refs, _ = proc.feed_epoch(files, TS)
    em = pa.concat_tables(ray.get(e_refs))
    got = sorted_df(em)
    exp = oracle_ordered(t)
    pd.testing.assert_frame_equal(
        got[[KEY, SEQ, "text", "emit_seq"]], exp[[KEY, SEQ, "text", "emit_seq"]]
    )
    proc.shutdown()
