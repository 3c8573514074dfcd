"""Generic as-of and interval (range) join operators (join.py) vs brute-force
pandas oracles. The oracled end-to-end variants are queries
``asof_event_order`` / ``interval_follow_purchases``."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(df: pd.DataFrame):
    import ray.data

    return ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


@pytest.fixture(scope="module")
def frames(ray_session):
    rng = np.random.default_rng(11)
    n_l, n_r = 400, 300
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 12, n_l),
            "lt": rng.integers(0, 1000, n_l).astype("int64"),
            "lid": np.arange(n_l, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 15, n_r),  # some keys absent on either side
            "rt": rng.integers(0, 1000, n_r).astype("int64"),
            "rid": np.arange(n_r, dtype="int64"),
            "v": rng.normal(size=n_r),
        }
    )
    return left, right


def test_asof_join_backward_matches_bruteforce(frames):
    from ray_ordered_stream.join import asof_join

    left, right = frames
    # deterministic: dedup right per (k, rt) keep max rid, like the operator
    got = (
        asof_join(
            _ds(left), _ds(right), key="k", on="lt", right_on="rt",
            right_cols=["rt", "rid"], right_tiebreak="rid", by_int=True,
            num_partitions=3,
        )
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    rd = (
        right.sort_values(["k", "rt", "rid"], kind="stable")
        .drop_duplicates(["k", "rt"], keep="last")
    )
    rows = []
    for _, lr in left.iterrows():
        cand = rd[(rd["k"] == lr["k"]) & (rd["rt"] <= lr["lt"])]
        if len(cand):
            best = cand.sort_values(["rt", "rid"]).iloc[-1]
            rows.append((lr["lid"], best["rid"]))
    exp = pd.DataFrame(rows, columns=["lid", "rid"]).astype("int64")
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(
        got[["lid", "rid"]].reset_index(drop=True),
        exp.sort_values("lid").reset_index(drop=True),
    )


def test_asof_join_forward(frames):
    from ray_ordered_stream.join import asof_join

    left, right = frames
    got = (
        asof_join(
            _ds(left), _ds(right), key="k", on="lt", right_on="rt",
            right_cols=["rt", "rid"], right_tiebreak="rid",
            direction="forward", by_int=True, num_partitions=3,
        )
        .to_pandas()
    )
    rd = (
        right.sort_values(["k", "rt", "rid"], kind="stable")
        .drop_duplicates(["k", "rt"], keep="last")
    )
    n_exp = sum(
        bool(len(rd[(rd["k"] == lr["k"]) & (rd["rt"] >= lr["lt"])]))
        for _, lr in left.iterrows()
    )
    assert len(got) == n_exp
    # forward: matched rt >= lt
    assert (got["rt"] >= got["lt"]).all()


def test_interval_join_pairs_matches_bruteforce(frames):
    from ray_ordered_stream.join import interval_join

    left, right = frames
    lo, hi = 0, 100
    got = (
        interval_join(
            _ds(left), _ds(right), key="k", left_on="lt", right_on="rt",
            lower_us=lo, upper_us=hi, mode="pairs", by_int=True,
            num_partitions=3,
        )
        .to_pandas()
        .sort_values(["lid", "rid"])
        .reset_index(drop=True)
    )
    m = left.merge(right, on="k")
    m = m[(m["rt"] > m["lt"] + lo) & (m["rt"] <= m["lt"] + hi)]
    exp = m[["lid", "rid"]].sort_values(["lid", "rid"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["lid", "rid"]], exp)


def test_interval_join_agg_counts_and_sums(frames):
    from ray_ordered_stream.join import interval_join

    left, right = frames
    got = (
        interval_join(
            _ds(left), _ds(right), key="k", left_on="lt", right_on="rt",
            lower_us=0, upper_us=100, value_col="v", mode="agg", by_int=True,
            num_partitions=3,
        )
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    assert len(got) == len(left)  # every left row present, zero-match included
    m = left.merge(right, on="k")
    m = m[(m["rt"] > m["lt"]) & (m["rt"] <= m["lt"] + 100)]
    exp_n = m.groupby("lid").size().reindex(left["lid"], fill_value=0)
    assert (got.set_index("lid")["n_matches"].reindex(left["lid"]) == exp_n).all()
    exp_s = m.groupby("lid")["v"].sum().reindex(left["lid"], fill_value=0.0)
    assert np.allclose(
        got.set_index("lid")["sum_v"].reindex(left["lid"]), exp_s, atol=1e-9
    )


def test_asof_join_timestamp_columns(ray_session):
    """Datetime on-columns work end to end (the oracled query's shape)."""
    from ray_ordered_stream.join import asof_join

    left = pd.DataFrame(
        {
            "k": [1, 1, 2],
            "ts": pd.to_datetime(["2024-01-05", "2024-01-20", "2024-01-10"]),
        }
    )
    right = pd.DataFrame(
        {
            "k": [1, 1, 2, 3],
            "rts": pd.to_datetime(
                ["2024-01-01", "2024-01-10", "2024-02-01", "2024-01-01"]
            ),
            "tag": ["a", "b", "c", "d"],
        }
    )
    got = (
        asof_join(
            _ds(left), _ds(right), key="k", on="ts", right_on="rts",
            right_cols=["rts", "tag"], right_tiebreak="tag", by_int=True,
            num_partitions=2,
        )
        .to_pandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    # k=2 event at 01-10 has no rts <= it?  01-10 < 02-01 -> no match, dropped
    assert got["tag"].tolist() == ["a", "b"]


def test_asof_join_null_right_values_still_match(ray_session):
    """A match whose right VALUE is null must survive (match detection uses
    an explicit indicator, not value non-nullness)."""
    from ray_ordered_stream.join import asof_join

    left = pd.DataFrame({"k": [1, 1], "lt": [10, 20]})
    right = pd.DataFrame(
        {"k": [1, 1], "rt": [5, 15], "val": pd.array([None, 7.0], dtype="float64")}
    )
    got = (
        asof_join(_ds(left), _ds(right), key="k", on="lt", right_on="rt",
                  right_cols=["rt", "val"], by_int=True, num_partitions=2)
        .to_pandas()
        .sort_values("lt")
        .reset_index(drop=True)
    )
    assert len(got) == 2          # lt=10 matches rt=5 (val null), lt=20 rt=15
    assert np.isnan(got["val"].iloc[0]) and got["val"].iloc[1] == 7.0


def test_asof_join_right_only_time_column(ray_session):
    """'Does a preceding right row exist' — right side carries nothing but
    the key and the on column."""
    from ray_ordered_stream.join import asof_join

    left = pd.DataFrame({"k": [1, 2], "lt": [10, 10]})
    right = pd.DataFrame({"k": [1], "rt": [5]})
    got = asof_join(
        _ds(left), _ds(right), key="k", on="lt", right_on="rt",
        right_cols=["rt"], by_int=True, num_partitions=2,
    ).to_pandas()
    assert got["k"].tolist() == [1]  # k=2 has no right rows -> dropped


def test_asof_join_left_column_named_like_right_on(ray_session):
    """A left column sharing the right_on name must not defeat the
    matched-row filter."""
    from ray_ordered_stream.join import asof_join

    left = pd.DataFrame({"k": [1, 2], "lt": [10, 10], "rt": [999, 999]})
    right = pd.DataFrame({"k": [1], "rt": [5], "rid": [42]})
    got = asof_join(
        _ds(left), _ds(right), key="k", on="lt", right_on="rt",
        right_cols=["rt", "rid"], by_int=True, num_partitions=2,
    ).to_pandas()
    # only k=1 matches; k=2's unmatched row must be dropped (not kept with
    # a NaN rid crashing the int restore)
    assert got["k"].tolist() == [1]
    assert got["rid"].tolist() == [42]


def test_hash_join_all_modes(ray_session):
    import ray.data as rd

    from ray_ordered_stream.join import hash_join

    left = pd.DataFrame(
        {
            "k": [1, 2, 3, 4, 5, 5],
            "lv": ["a", "b", "c", "d", "e", "f"],
        }
    )
    right = pd.DataFrame(
        {
            "rk": [2, 2, 4, 6],
            "rv": [20, 21, 40, 60],
        }
    )
    lds = rd.from_pandas(left).repartition(3)
    rds = rd.from_pandas(right).repartition(2)

    inner = hash_join(
        lds, rds, "k", how="inner", right_key="rk", by_int=True
    ).to_pandas()
    exp = left.merge(right.rename(columns={"rk": "k"}), on="k", how="inner")
    assert sorted(map(tuple, inner[["k", "lv", "rv"]].values)) == sorted(
        map(tuple, exp[["k", "lv", "rv"]].values)
    )

    semi = hash_join(
        lds, rds, "k", how="semi", right_key="rk", by_int=True
    ).to_pandas()
    assert sorted(semi["lv"]) == ["b", "d"]
    assert sorted(semi.columns) == ["k", "lv"]  # right cols not emitted

    anti = hash_join(
        lds, rds, "k", how="anti", right_key="rk", by_int=True
    ).to_pandas()
    assert sorted(anti["lv"]) == ["a", "c", "e", "f"]

    # anti against an empty right side keeps everything
    anti_all = hash_join(
        lds, rd.from_pandas(right.iloc[0:0]), "k", how="anti",
        right_key="rk", by_int=True,
    ).to_pandas()
    assert sorted(anti_all["lv"]) == ["a", "b", "c", "d", "e", "f"]

    # string keys route through the FNV exchange
    sl = rd.from_pandas(pd.DataFrame({"k": ["x", "y", "z"], "lv": [1, 2, 3]}))
    sr = rd.from_pandas(pd.DataFrame({"k": ["y"], "rv": [9]}))
    got = hash_join(sl, sr, "k", how="inner").to_pandas()
    assert got[["k", "lv", "rv"]].values.tolist() == [["y", 2, 9]]

    # right join keeps unmatched right rows (k=6); outer keeps both sides
    rj = hash_join(
        lds, rds, "k", how="right", right_key="rk", by_int=True
    ).to_pandas()
    assert sorted(rj["rv"]) == [20, 21, 40, 60]
    assert rj.loc[rj["rv"] == 60, "lv"].isna().all()
    oj = hash_join(
        lds, rds, "k", how="outer", right_key="rk", by_int=True
    ).to_pandas()
    exp_o = left.merge(right.rename(columns={"rk": "k"}), on="k", how="outer")
    assert len(oj) == len(exp_o)
    assert sorted(oj["k"].astype("int64")) == sorted(exp_o["k"].astype("int64"))

    # outer against an empty right side degrades to the left rows
    oj_empty = hash_join(
        lds, rd.from_pandas(right.iloc[0:0]), "k", how="outer",
        right_key="rk", by_int=True,
    ).to_pandas()
    assert sorted(oj_empty["lv"]) == ["a", "b", "c", "d", "e", "f"]


def test_hash_join_property_vs_pandas(ray_session):
    """Randomized equivalence: every join mode matches the pandas oracle on
    frames with skewed keys, missing keys, and duplicate right rows."""
    import ray.data as rd

    rng = np.random.default_rng(17)
    for trial in range(3):
        left = pd.DataFrame(
            {
                "k": rng.integers(0, 40, size=200),
                "lv": rng.integers(0, 1000, size=200),
            }
        )
        right = pd.DataFrame(
            {
                "k": rng.integers(20, 60, size=80),  # partial overlap
                "rv": rng.integers(0, 1000, size=80),
            }
        )
        from ray_ordered_stream.join import hash_join

        lds = rd.from_pandas(left).repartition(4)
        rds = rd.from_pandas(right).repartition(3)
        for how in ("inner", "left", "right", "outer", "semi", "anti"):
            got = hash_join(lds, rds, "k", how=how, by_int=True).to_pandas()
            if how in ("inner", "left", "right", "outer"):
                exp = left.merge(right, on="k", how=how)
                key = ["k", "lv", "rv"]
                got = got.fillna({"lv": -1, "rv": -1})
                exp = exp.fillna({"lv": -1, "rv": -1})
            elif how == "semi":
                exp = left[left["k"].isin(right["k"])]
                key = ["k", "lv"]
            else:
                exp = left[~left["k"].isin(right["k"])]
                key = ["k", "lv"]
            assert sorted(map(tuple, got[key].values)) == sorted(
                map(tuple, exp[key].values)
            ), (trial, how)


def test_bloom_filter_guarantees_and_semi_prefilter(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from ray_ordered_stream.functions.bloom import Bloom, build_bloom_from_refs
    from ray_ordered_stream.join import hash_join

    rng = np.random.default_rng(13)
    present = rng.choice(100000, size=2000, replace=False).astype("int64")
    absent = (rng.choice(100000, size=2000, replace=False) + 200000).astype(
        "int64"
    )
    b = Bloom(1 << 16, 4)
    b.add_column(pa.array(present))
    # no false negatives, ever
    assert b.maybe_contains(pa.array(present)).all()
    # false-positive rate sane for this sizing (~(k n / m)^k scale)
    fp = b.maybe_contains(pa.array(absent)).mean()
    assert fp < 0.05, fp
    # string keys work too
    bs = Bloom(1 << 16, 4)
    bs.add_column(pa.array([f"k{v}" for v in present[:500]]))
    assert bs.maybe_contains(pa.array([f"k{v}" for v in present[:500]])).all()

    # bloom-prefiltered semi == plain semi == pandas oracle
    left = pd.DataFrame(
        {"k": rng.integers(0, 500, size=3000).astype("int64"),
         "v": np.arange(3000, dtype="int64")}
    )
    right = pd.DataFrame(
        {"rk": rng.integers(250, 750, size=1000).astype("int64")}
    )
    lds = ray.data.from_pandas(left).repartition(4)
    rds = ray.data.from_pandas(right).repartition(3)
    got = (
        hash_join(lds, rds, "k", how="semi", right_key="rk", by_int=True,
                  bloom_prefilter=True, bloom_bits=1 << 12)
        .to_pandas().sort_values("v").reset_index(drop=True)
    )
    exp = left[left["k"].isin(set(right["rk"]))].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    # driver-side partial-merge parity
    refs = list(ray.data.from_pandas(right).repartition(3).to_arrow_refs())
    merged = build_bloom_from_refs(refs, "rk", 1 << 12)
    assert merged.maybe_contains(pa.array(right["rk"].to_numpy())).all()


def test_broadcast_join_inner_left(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ray_ordered_stream.join import broadcast_join

    left = pa.table(
        {
            "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "k": pa.array([10, 20, 30, 20, 99], pa.int64()),
        }
    )
    right = pa.table(
        {
            "rk": pa.array([10, 20, 30], pa.int64()),
            "name": ["a", "b", "c"],
            "extra": pa.array([7, 8, 9], pa.int64()),
        }
    )
    inner = (
        broadcast_join(
            rd.from_arrow(left).repartition(3),
            rd.from_arrow(right),
            key="k",
            right_key="rk",
            right_cols=["name"],
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert inner["id"].tolist() == [1, 2, 3, 4]
    assert inner["name"].tolist() == ["a", "b", "c", "b"]
    assert "extra" not in inner.columns

    lj = (
        broadcast_join(
            rd.from_arrow(left).repartition(2),
            rd.from_arrow(right),
            key="k",
            right_key="rk",
            how="left",
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert len(lj) == 5
    assert pd.isna(lj.loc[4, "name"]) and lj.loc[4, "id"] == 5


def test_hash_join_composite_keys_vs_duckdb(ray_session):
    """Composite-key inner/left/semi/anti vs DuckDB on the same frames —
    including a routing-critical check: tuples sharing one component must
    still only match on the full tuple."""
    import duckdb
    import ray

    from ray_ordered_stream.join import hash_join

    rng = np.random.default_rng(31)
    nl, nr = 700, 400
    L = pd.DataFrame(
        {
            "a": rng.integers(0, 12, nl).astype(np.int64),
            "b": rng.choice(["x", "y", "z"], nl),
            "lv": np.arange(nl, dtype=np.int64),
        }
    )
    R = pd.DataFrame(
        {
            "ra": rng.integers(0, 12, nr).astype(np.int64),
            "rb": rng.choice(["x", "y", "z", "w"], nr),
            "rv": np.arange(nr, dtype=np.int64) * 10,
        }
    )
    con = duckdb.connect()
    con.register("L", L)
    con.register("R", R)
    lds = ray.data.from_pandas(L).repartition(5)
    rds = ray.data.from_pandas(R).repartition(4)

    def canon(df, cols):
        return (
            df[cols]
            .sort_values(cols, kind="stable")
            .reset_index(drop=True)
        )

    # inner
    got = hash_join(
        lds, rds, key=["a", "b"], right_key=["ra", "rb"], right_cols=["rv"]
    ).to_pandas()
    want = con.sql(
        "SELECT a, b, lv, rv FROM L JOIN R ON a = ra AND b = rb"
    ).df()
    cols = ["a", "b", "lv", "rv"]
    assert canon(got, cols).equals(
        canon(want, cols).astype({c: got[c].dtype for c in cols})
    )

    # semi / anti partition the left exactly
    semi = hash_join(
        lds, rds, key=["a", "b"], right_key=["ra", "rb"], how="semi"
    ).to_pandas()
    anti = hash_join(
        lds, rds, key=["a", "b"], right_key=["ra", "rb"], how="anti"
    ).to_pandas()
    wsemi = con.sql(
        "SELECT * FROM L WHERE EXISTS (SELECT 1 FROM R WHERE a=ra AND b=rb)"
    ).df()
    assert len(semi) == len(wsemi) and len(semi) + len(anti) == nl
    assert set(map(tuple, semi[["a", "b", "lv"]].to_numpy())) == set(
        map(tuple, wsemi[["a", "b", "lv"]].to_numpy())
    )

    # left join NULL fill
    lgot = hash_join(
        lds, rds, key=["a", "b"], right_key=["ra", "rb"],
        right_cols=["rv"], how="left",
    ).to_pandas()
    wleft = con.sql(
        "SELECT a, b, lv, rv FROM L LEFT JOIN R ON a = ra AND b = rb"
    ).df()
    assert len(lgot) == len(wleft)
    assert int(lgot["rv"].isna().sum()) == int(wleft["rv"].isna().sum())


def test_asof_join_composite_keys_vs_duckdb(ray_session):
    import duckdb
    import ray

    from ray_ordered_stream.join import asof_join

    rng = np.random.default_rng(37)
    nl, nr = 500, 300
    L = pd.DataFrame(
        {
            "a": rng.integers(0, 6, nl).astype(np.int64),
            "b": rng.choice(["x", "y"], nl),
            "t": rng.integers(0, 1000, nl).astype(np.int64),
            "lv": np.arange(nl, dtype=np.int64),
        }
    )
    R = pd.DataFrame(
        {
            "a": rng.integers(0, 6, nr).astype(np.int64),
            "b": rng.choice(["x", "y"], nr),
            "rt": rng.integers(0, 1000, nr).astype(np.int64),
            "rv": np.arange(nr, dtype=np.int64) * 7,
        }
    )
    # deterministic: unique (a, b, rt) on the right
    R = R.drop_duplicates(["a", "b", "rt"]).reset_index(drop=True)
    got = (
        asof_join(
            ray.data.from_pandas(L).repartition(4),
            ray.data.from_pandas(R).repartition(3),
            key=["a", "b"],
            on="t",
            right_on="rt",
            right_cols=["rv"],
            direction="backward",
        )
        .to_pandas()
        .sort_values(["lv"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("L", L)
    con.register("R", R)
    want = con.sql(
        """
        SELECT L.lv, R.rv FROM L
        ASOF JOIN R ON L.a = R.a AND L.b = R.b AND L.t >= R.rt
        ORDER BY L.lv
        """
    ).df()
    assert len(got) == len(want)
    assert (got["lv"].to_numpy() == want["lv"].to_numpy()).all()
    assert (got["rv"].to_numpy(np.int64) == want["rv"].to_numpy(np.int64)).all()


def test_packed_key_composite_bridge(ray_session):
    """packed_key gives the remaining single-key operators a composite
    key: grouped_topk over a packed (a, b) behaves like per-tuple top-k."""
    import ray

    from ray_ordered_stream.functions.topk import grouped_topk
    from ray_ordered_stream.join import packed_key

    rng = np.random.default_rng(41)
    n = 400
    df = pd.DataFrame(
        {
            "a": rng.integers(0, 3, n).astype(np.int64),
            "b": rng.choice(["x", "y"], n),
            "v": rng.integers(0, 1000, n).astype(np.int64),
            "id": np.arange(n, dtype=np.int64),
        }
    )
    ds = packed_key(
        ray.data.from_pandas(df).repartition(4), ["a", "b"]
    )
    got = (
        grouped_topk(ds, "_key", "v", k=2, tiebreak="id")
        .to_pandas()
        .sort_values(["a", "b", "v", "id"], ascending=[True, True, False, True])
        .reset_index(drop=True)
    )
    # grouped_topk flips the tiebreak with the value when descending
    want = (
        df.sort_values(["v", "id"], ascending=[False, False])
        .groupby(["a", "b"])
        .head(2)
        .sort_values(["a", "b", "v", "id"], ascending=[True, True, False, True])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in ("a", "b", "v", "id"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None)
@given(
    nl=st.integers(1, 120),
    nr=st.integers(0, 80),
    nk=st.integers(1, 6),
    seed=st.integers(0, 10_000),
    how=st.sampled_from(["inner", "left", "semi", "anti"]),
)
def test_hash_join_composite_property_vs_pandas(
    ray_session, nl, nr, nk, seed, how
):
    import ray

    from ray_ordered_stream.join import hash_join

    rng = np.random.default_rng(seed)
    L = pd.DataFrame(
        {
            "a": rng.integers(0, nk, nl).astype(np.int64),
            "b": rng.choice(["x", "y"], nl),
            "lv": np.arange(nl, dtype=np.int64),
        }
    )
    R = pd.DataFrame(
        {
            "a": rng.integers(0, nk, max(nr, 0)).astype(np.int64),
            "b": rng.choice(["x", "y"], max(nr, 0)),
            "rv": np.arange(max(nr, 0), dtype=np.int64),
        }
    )
    got = hash_join(
        ray.data.from_pandas(L).repartition(3),
        ray.data.from_pandas(R).repartition(2),
        key=["a", "b"],
        how=how,
        right_cols=["rv"] if how in ("inner", "left") else None,
    ).to_pandas()
    if how in ("inner", "left"):
        want = L.merge(R, on=["a", "b"], how=how)
        assert len(got) == len(want)
        if len(want):  # Ray's to_pandas drops columns on empty results
            assert sorted(got["lv"].tolist()) == sorted(want["lv"].tolist())
    else:
        hit = L.merge(
            R[["a", "b"]].drop_duplicates(), on=["a", "b"], how="left",
            indicator=True,
        )["_merge"].eq("both").to_numpy()
        want_n = int(hit.sum()) if how == "semi" else int((~hit).sum())
        assert len(got) == want_n
