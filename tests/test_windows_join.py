"""Window + join operators vs pandas oracles (FIXTURES.md §4)."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from ray_ordered_stream.fixtures import gen_transcripts
from ray_ordered_stream.join import join_user_assistant
from ray_ordered_stream.schema import KEY, SEQ
from ray_ordered_stream.windows import (
    session_windows,
    sliding_counts,
    tumbling_counts,
    tumbling_digest,
)


@pytest.fixture(scope="module")
def stream(ray_session):
    import ray.data as rd

    t = gen_transcripts(n_convs=10, min_turns=8, max_turns=40, seed=11)
    return t, rd.from_arrow(t).repartition(4)


def test_tumbling_counts_vs_pandas(stream):
    t, ds = stream
    size_s = 60.0
    got = (
        tumbling_counts(ds, size_s)
        .to_pandas()
        .sort_values([KEY, "window_start"])
        .reset_index(drop=True)
    )
    df = t.to_pandas()
    df["window_start"] = df["ts"].dt.floor("60s")
    exp = (
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
    assert len(got) == len(exp)
    assert (got["turn_count"].values == exp["turn_count"].values).all()
    assert (got["n_user"].values == exp["n_user"].values).all()
    assert (got["n_assistant"].values == exp["n_assistant"].values).all()
    assert (got["window_start"].values == exp["window_start"].values).all()
    assert (
        (got["window_end"] - got["window_start"]).dt.total_seconds() == size_s
    ).all()


def test_tumbling_digest_vs_pandas(stream):
    t, ds = stream
    got = (
        tumbling_digest(ds, 120.0)
        .to_pandas()
        .sort_values([KEY, "window_start"])
        .reset_index(drop=True)
    )
    df = t.to_pandas()
    df["window_start"] = df["ts"].dt.floor("120s")
    exp = (
        df.sort_values(SEQ)
        .groupby([KEY, "window_start"])
        .agg(text_digest=("text", lambda s: hashlib.md5("|".join(s).encode()).hexdigest()))
        .reset_index()
        .sort_values([KEY, "window_start"])
        .reset_index(drop=True)
    )
    assert list(got["text_digest"]) == list(exp["text_digest"])


def test_sliding_counts_vs_pandas(stream):
    t, ds = stream
    size_s, step_s = 120.0, 30.0
    got = (
        sliding_counts(ds, size_s, step_s)
        .to_pandas()
        .sort_values([KEY, "window_start"])
        .reset_index(drop=True)
    )
    df = t.to_pandas()
    tsi = df["ts"].astype("int64")
    rows = []
    for k, g in df.groupby(KEY):
        gi = g["ts"].astype("int64")
        for _, tv in gi.items():
            last = (tv // int(step_s * 1e6)) * int(step_s * 1e6)
            w = last
            while w + size_s * 1e6 > tv and w >= 0:
                rows.append((k, w))
                w -= int(step_s * 1e6)
    exp = (
        pd.DataFrame(rows, columns=[KEY, "ws"])
        .groupby([KEY, "ws"])
        .size()
        .rename("turn_count")
        .reset_index()
        .sort_values([KEY, "ws"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got["turn_count"].values == exp["turn_count"].values).all()
    assert (got["window_start"].astype("int64").values == exp["ws"].values).all()


def test_session_windows_vs_pandas(ray_session):
    import ray.data as rd

    # build conversations with deliberate ts gaps
    t = gen_transcripts(n_convs=6, min_turns=10, max_turns=30, seed=5)
    df = t.to_pandas()
    # inject gaps: every 7th turn of a conv jumps by 1 hour
    bump = (df[SEQ] % 7 == 0) & (df[SEQ] > 0)
    df.loc[bump, "ts"] = df.loc[bump, "ts"] + pd.Timedelta(hours=1)
    # keep ts monotone per conv after bump: cumulative max
    df = df.sort_values([KEY, SEQ])
    df["ts"] = df.groupby(KEY)["ts"].cummax()
    ds = rd.from_pandas(df).repartition(3)

    gap_s = 600.0
    got = (
        session_windows(ds, gap_s)
        .to_pandas()
        .sort_values([KEY, "session_id"])
        .reset_index(drop=True)
    )

    exp_rows = []
    for k, g in df.groupby(KEY):
        g = g.sort_values("ts")
        tsi = g["ts"].astype("int64").to_numpy()
        new_s = np.ones(len(g), bool)
        new_s[1:] = (tsi[1:] - tsi[:-1]) > gap_s * 1e6
        sid = np.cumsum(new_s) - 1
        for s in np.unique(sid):
            m = sid == s
            exp_rows.append((k, int(s), tsi[m].min(), tsi[m].max(), int(m.sum())))
    exp = pd.DataFrame(
        exp_rows, columns=[KEY, "session_id", "start", "end", "turn_count"]
    ).sort_values([KEY, "session_id"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["turn_count"].values == exp["turn_count"].values).all()
    assert (got["session_start"].astype("int64").values == exp["start"].values).all()
    assert (got["session_end"].astype("int64").values == exp["end"].values).all()


def test_join_user_assistant_vs_pandas(stream):
    t, ds = stream
    got = (
        join_user_assistant(ds)
        .to_pandas()
        .sort_values([KEY, "user_turn_idx"])
        .reset_index(drop=True)
    )
    df = t.to_pandas()
    exp_rows = []
    for k, g in df.groupby(KEY):
        users = g[g["role"] == "user"].sort_values(SEQ)
        assistants = g[g["role"] == "assistant"].sort_values(SEQ)
        for _, u in users.iterrows():
            nxt = assistants[assistants[SEQ] > u[SEQ]]
            if len(nxt):
                a = nxt.iloc[0]
                exp_rows.append(
                    (
                        k,
                        u[SEQ],
                        a[SEQ],
                        u["text"],
                        a["text"],
                        int(a["ts"].value - u["ts"].value) // 1000,
                    )
                )
    exp = pd.DataFrame(
        exp_rows,
        columns=[
            KEY,
            "user_turn_idx",
            "assistant_turn_idx",
            "user_text",
            "assistant_text",
            "lag_us",
        ],
    ).sort_values([KEY, "user_turn_idx"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["assistant_turn_idx"].values == exp["assistant_turn_idx"].values).all()
    assert list(got["assistant_text"]) == list(exp["assistant_text"])
    assert (got["lag_us"].values == exp["lag_us"].values).all()
