"""Skew salting in the streaming drivers: hot-key partition pins sampled
from the stream head, persisted in the checkpoint lineage (routing IS
lineage), honored across crash-resume and across checkpoint rescaling.

North rule: "range-partitioned, skew-salted shuffles on hot conv_ids" —
the pins spread distinct hot keys round-robin so no partition accumulates
several of them (a single hot key remains inherently serial, same as the
reference; partitioning.py module docstring).
"""

import json
from pathlib import Path

import pandas as pd
import pyarrow.parquet as pq
import pytest

from ray_ordered_stream.epochs import run_stream
from ray_ordered_stream.fixtures import gen_transcripts, oracle_ordered
from ray_ordered_stream.schema import KEY, SEQ
from ray_ordered_stream.state import OrderedConfig


@pytest.fixture(scope="module")
def skewed_files(tmp_path_factory, ray_session):
    """Power-law conv activity (degree 3: few conversations dominate)."""
    t = gen_transcripts(
        n_convs=16, min_turns=6, max_turns=120, degree=3.0, lateness=50,
        dup_rate=0.02, seed=77,
    )
    d = tmp_path_factory.mktemp("landing_skew")
    n, n_files = t.num_rows, 6
    step = -(-n // n_files)
    files = []
    for i in range(n_files):
        f = d / f"part-{i:05d}.parquet"
        pq.write_table(t.slice(i * step, step), f)
        files.append(str(f))
    return t, files


def _meta(out_root: str) -> dict:
    return json.loads((Path(out_root) / "ckpt" / "meta.json").read_text())


def _ordered(res) -> pd.DataFrame:
    return (
        res.sinks["ordered"].read().to_pandas()
        .sort_values([KEY, SEQ], kind="stable")
        .reset_index(drop=True)
    )


def test_salted_run_matches_plain_and_persists_pins(skewed_files, tmp_path):
    t, files = skewed_files
    cfg = OrderedConfig(window_size_s=30.0)
    plain = run_stream(files, str(tmp_path / "plain"), cfg, num_partitions=4,
                       files_per_epoch=2)
    salted = run_stream(files, str(tmp_path / "salted"), cfg, num_partitions=4,
                        files_per_epoch=2, salt_hot_keys=True)

    exp = oracle_ordered(t)
    for res in (plain, salted):
        got = _ordered(res)
        pd.testing.assert_frame_equal(
            got[[KEY, SEQ, "text", "emit_seq"]],
            exp[[KEY, SEQ, "text", "emit_seq"]],
        )
    # pins recorded in the lineage meta, heaviest-first round-robin over P
    meta = _meta(str(tmp_path / "salted"))
    ov = meta["overrides"]
    assert len(ov) == 8  # 2 * partitions
    assert sorted(set(ov.values())) == [0, 1, 2, 3]
    assert "overrides" not in _meta(str(tmp_path / "plain"))


def test_salted_crash_resume_uses_recorded_pins(skewed_files, tmp_path):
    """The resumed run routes with the lineage's pins even when the flag is
    NOT passed again — otherwise keys would miss their checkpointed state."""
    t, files = skewed_files
    cfg = OrderedConfig(window_size_s=30.0, session_gap_s=0.5)

    full = run_stream(files, str(tmp_path / "full"), cfg, num_partitions=3,
                      files_per_epoch=2, salt_hot_keys=True)
    out_crash = str(tmp_path / "crash")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_stream(files, out_crash, cfg, num_partitions=3, files_per_epoch=2,
                   salt_hot_keys=True, fail_after_epoch=0)
    pins_before = _meta(out_crash)["overrides"]
    resumed = run_stream(files, out_crash, cfg, num_partitions=3,
                         files_per_epoch=2)  # no salt flag
    assert _meta(out_crash)["overrides"] == pins_before
    for sink in ("ordered", "status", "windows", "sessions"):
        a = full.sinks[sink].read().to_pandas()
        b = resumed.sinks[sink].read().to_pandas()
        cols = sorted(a.columns)
        a = a[cols].sort_values(cols, kind="stable").reset_index(drop=True)
        b = b[cols].sort_values(cols, kind="stable").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


def test_rescale_remaps_pins_and_resumes(skewed_files, tmp_path):
    """Rescaling a salted lineage remaps the pins over new_P, migrates the
    keyed state with the NEW pins, and the resumed run matches an
    uninterrupted plain run's content."""
    from ray_ordered_stream.rescale import rescale_checkpoint

    t, files = skewed_files
    cfg = OrderedConfig(window_size_s=30.0)
    full = run_stream(files, str(tmp_path / "full"), cfg, num_partitions=2,
                      files_per_epoch=2)

    out = str(tmp_path / "resc")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_stream(files, out, cfg, num_partitions=2, files_per_epoch=2,
                   salt_hot_keys=True, fail_after_epoch=1)
    old_pins = _meta(out)["overrides"]
    rescale_checkpoint(out, epoch=1, old_P=2, new_P=4)
    new_pins = _meta(out)["overrides"]
    assert list(new_pins) == list(old_pins)          # same keys, same order
    assert sorted(set(new_pins.values())) == [0, 1, 2, 3]

    resumed = run_stream(files, out, cfg, num_partitions=4, files_per_epoch=2,
                         collect_final_status=True)
    assert resumed.epochs_skipped == 2
    pd.testing.assert_frame_equal(
        _ordered(resumed)[[KEY, SEQ, "text", "emit_seq"]],
        _ordered(full)[[KEY, SEQ, "text", "emit_seq"]],
    )
    fin = resumed.final_status
    assert (fin["buffered_count"] == 0).all()
    assert fin["result_count"].sum() == len(oracle_ordered(t))
