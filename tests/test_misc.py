"""Tests for the debug sinks (≙ StandardOutput/JSONOutputConsumer) and the
stats tracker (≙ StatsTracker)."""

import io

import pyarrow as pa

from ray_ordered_stream.debug import format_turn, show_turns
from ray_ordered_stream.fixtures import tiny_fixture
from ray_ordered_stream.metrics import StatsTracker


def test_show_turns_formats_rows():
    t = tiny_fixture("t_inorder")
    buf = io.StringIO()
    n = show_turns(t, limit=2, file=buf)
    lines = buf.getvalue().strip().splitlines()
    assert n == 2 and len(lines) == 2
    assert lines[0].startswith("[c0000000#0]")
    assert "system" in lines[0]


def test_format_turn_tool_suffix():
    s = format_turn(
        {"conv_id": "c1", "turn_idx": 5, "role": "tool", "text": "x", "tool": "search", "ts": None}
    )
    assert s.endswith("(tool=search)")


def test_stats_tracker_rates_and_percentiles():
    st = StatsTracker(window_s=10.0)
    for i in range(10):
        st.record(100, 1000, t=float(i))
    r = st.rates(t=9.0)
    assert r["rows_per_sec"] == round(1000.0 / 9.0, 1)  # 1000 rows over a 9s span
    stage = st.stage("drain")
    for ms in (1, 2, 3, 4, 100):
        stage.record(rows=10, wall_s=ms / 1000)
    s = stage.summary()
    assert s["rows"] == 50 and s["calls"] == 5
    assert s["lat_max"] == 0.1
    assert s["lat_p50"] == 0.003
    # window trimming: events older than window drop out
    st.record(1, 0, t=100.0)
    r2 = st.rates(t=100.0)
    assert r2["rows_per_sec"] >= 0


def test_stream_result_metrics_surface(tmp_path, ray_session):
    import pyarrow.parquet as pq

    from ray_ordered_stream.epochs import run_stream
    from ray_ordered_stream.fixtures import gen_transcripts

    t = gen_transcripts(n_convs=4, min_turns=5, max_turns=10, seed=9)
    f = tmp_path / "in.parquet"
    pq.write_table(t, f)
    res = run_stream([str(f)], str(tmp_path / "out"), num_partitions=2,
                     files_per_epoch=1)
    m = res.metrics
    assert m["rates"]["rows_per_sec"] > 0
    (stage,) = [s for s in m["stages"] if s["stage"] == "epoch_commit"]
    assert stage["rows"] == res.total_emitted
    assert stage["calls"] == res.epochs_run
    assert stage["lat_p50"] >= 0


def test_completion_summary_watermark(ray_session):
    import pandas as pd

    from ray_ordered_stream.fixtures import gen_transcripts
    from ray_ordered_stream.ordered import OrderedProcessor
    from ray_ordered_stream.state import OrderedConfig

    t = gen_transcripts(n_convs=6, min_turns=4, max_turns=10, seed=8)
    proc = OrderedProcessor(OrderedConfig(warmup_rows=0), num_partitions=2)
    proc.feed_epoch(t, pd.Timestamp("1970-01-01"))
    s = proc.completion_summary()
    # the global watermark is the slowest partition's frontier: somewhere
    # between the stream's earliest and latest event time
    import pyarrow.compute as pc

    lo = pc.min(t["ts"].cast("int64")).as_py()
    hi = pc.max(t["ts"].cast("int64")).as_py()
    assert s["watermark_us"] is not None
    assert lo <= s["watermark_us"] <= hi
    proc.shutdown()
