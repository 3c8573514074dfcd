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


def test_verify_ordered(ray_session, tmp_path):
    import pandas as pd
    import ray.data as rd

    from ray_ordered_stream.fixtures import gen_transcripts
    from ray_ordered_stream.ordered import ordered_process
    from ray_ordered_stream.state import OrderedConfig
    from ray_ordered_stream.validate import verify_ordered

    t = gen_transcripts(n_convs=12, min_turns=5, max_turns=40, lateness=25,
                        dup_rate=0.02, seed=21)
    res = ordered_process(rd.from_arrow(t), OrderedConfig(), num_partitions=3)
    out = res.ordered.materialize()
    rep = verify_ordered(out)
    assert rep["ok"], rep
    assert rep["rows"] == out.count()
    assert rep["keys"] == 12

    # corrupt: drop one middle turn of one key -> gap detected
    df = out.to_pandas()
    victim = df[(df["conv_id"] == df["conv_id"].iloc[0])].sort_values("turn_idx")
    drop_idx = victim.index[len(victim) // 2]
    bad = rd.from_pandas(df.drop(index=drop_idx))
    rep2 = verify_ordered(bad)
    assert not rep2["ok"] and rep2["gap_keys"] == 1

    # corrupt: duplicate a row -> dup detected
    dup = rd.from_pandas(pd.concat([df, df.iloc[[3]]], ignore_index=True))
    rep3 = verify_ordered(dup)
    assert not rep3["ok"] and rep3["dup_keys"] == 1


def test_export_dataset_resumes_and_skips_finished_parts(
    tmp_path, ray_session
):
    import json
    import os

    import numpy as np
    import pandas as pd
    import ray.data

    from ray_ordered_stream.sink import export_dataset

    df = pd.DataFrame(
        {"id": np.arange(100, dtype="int64"), "v": np.arange(100) * 2}
    )
    ds = ray.data.from_pandas(df).repartition(4)

    s1 = export_dataset(ds, str(tmp_path), name="exp")
    assert s1["parts_written"] == 4 and s1["parts_skipped"] == 0
    assert s1["rows"] == 100
    root = tmp_path / "exp"
    assert (root / "_SUCCESS").exists()
    assert json.loads((root / "_SUCCESS").read_text())["rows"] == 100

    # simulate a failed run: one part lost mid-write (no manifest), one
    # manifest lost; finished parts must be skipped untouched
    (root / "part-00001.parquet").unlink()
    (root / "_manifests" / "part-00001.json").unlink()
    (root / "_manifests" / "part-00003.json").unlink()
    (root / "_SUCCESS").unlink()
    mtime0 = os.path.getmtime(root / "part-00000.parquet")

    s2 = export_dataset(ds, str(tmp_path), name="exp")
    assert s2["parts_written"] == 2 and s2["parts_skipped"] == 2
    assert s2["rows"] == 100
    assert os.path.getmtime(root / "part-00000.parquet") == mtime0
    assert (root / "_SUCCESS").exists()

    got = (
        ray.data.read_parquet(sorted(str(p) for p in root.glob("*.parquet")))
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, df)

    # third run: everything skipped
    s3 = export_dataset(ds, str(tmp_path), name="exp")
    assert s3["parts_written"] == 0 and s3["parts_skipped"] == 4


def test_export_partitioned_hive_layout_and_resume(ray_session, tmp_path):
    import json
    from pathlib import Path

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from ray_ordered_stream.sink import export_partitioned

    t = pa.table(
        {
            "doc_id": pa.array(range(60), pa.int64()),
            "lang": pa.array([["en", "de", "fr"][i % 3] for i in range(60)]),
            "n": pa.array([i * 2 for i in range(60)], pa.int64()),
        }
    )
    ds = rd.from_arrow(t).repartition(4)
    s1 = export_partitioned(ds, str(tmp_path), by="lang", name="docs")
    root = tmp_path / "docs"
    assert (root / "_SUCCESS").exists()
    assert s1["rows"] == 60 and s1["blocks_skipped"] == 0
    assert sorted(s1["values"]) == ["de", "en", "fr"]
    # hive dirs prune by value
    en = pq.read_table(str(root / "lang=en"))
    assert set(en["lang"].to_pylist()) == {"en"} and en.num_rows == 20

    # full re-run: everything skipped, files untouched
    f = next((root / "lang=en").glob("*.parquet"))
    mt = f.stat().st_mtime_ns
    s2 = export_partitioned(ds, str(tmp_path), by="lang", name="docs")
    assert s2["blocks_written"] == 0 and s2["blocks_skipped"] == s1["n_blocks"]
    assert s2["rows"] == 60 and f.stat().st_mtime_ns == mt

    # crash-sim: drop one block manifest -> only that block rewrites
    man = sorted((root / "_manifests").glob("block-*.json"))[1]
    victim = json.loads(man.read_text())
    man.unlink()
    s3 = export_partitioned(ds, str(tmp_path), by="lang", name="docs")
    assert s3["blocks_written"] == 1 and s3["rows"] == 60
    # whole-table content identical to the input (read per hive dir —
    # _SUCCESS/_manifests would trip a naive directory read)
    back = pa.concat_tables(
        [pq.read_table(str(root / f"lang={v}")) for v in ("en", "de", "fr")]
    ).sort_by("doc_id")
    assert back.select(["doc_id", "n"]).equals(t.select(["doc_id", "n"]))
    assert {Path(x["file"]).parent.name for x in victim["files"]} <= {
        "lang=en", "lang=de", "lang=fr"
    }
