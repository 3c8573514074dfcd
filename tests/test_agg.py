"""exchange_groupby vs pandas oracles."""

import numpy as np
import pandas as pd
import ray.data


def test_exchange_groupby_matches_pandas_oracle():
    from ray_ordered_stream.agg import exchange_groupby

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "k1": rng.choice(["a", "b", "c"], size=500),
            "k2": rng.integers(0, 4, size=500).astype("int64"),
            "v": rng.normal(size=500),
            "w": rng.integers(0, 100, size=500).astype("int64"),
        }
    )
    ds = ray.data.from_pandas(df).repartition(6)
    got = (
        exchange_groupby(
            ds,
            ["k1", "k2"],
            {
                "n": (None, "count"),
                "sv": ("v", "sum"),
                "mv": ("v", "mean"),
                "lo": ("w", "min"),
                "hi": ("w", "max"),
            },
        )
        .to_pandas()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    exp = (
        df.groupby(["k1", "k2"], as_index=False)
        .agg(
            n=("v", "size"), sv=("v", "sum"), mv=("v", "mean"),
            lo=("w", "min"), hi=("w", "max"),
        )
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[exp.columns], exp, check_exact=False, rtol=1e-12
    )


def test_exchange_groupby_single_key_and_empty_blocks():
    from ray_ordered_stream.agg import exchange_groupby

    df = pd.DataFrame({"k": ["x"] * 3 + ["y"], "v": [1.0, 2.0, 3.0, 4.0]})
    ds = ray.data.from_pandas(df).repartition(8)  # more blocks than rows
    got = (
        exchange_groupby(ds, "k", {"s": ("v", "sum"), "n": (None, "count")})
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got["s"].tolist() == [6.0, 4.0]
    assert got["n"].tolist() == [3, 1]


def test_exchange_groupby_null_keys():
    from ray_ordered_stream.agg import exchange_groupby

    df = pd.DataFrame(
        {
            "k": ["a", None, "a", None, "b"],
            "v": [1.0, 2.0, 3.0, 4.0, 5.0],
        }
    )
    got = (
        exchange_groupby(
            ray.data.from_pandas(df).repartition(3),
            "k",
            {"n": (None, "count"), "s": ("v", "sum")},
        )
        .to_pandas()
        .sort_values("k", na_position="last")
        .reset_index(drop=True)
    )
    # null keys form their own group (dropna=False) and survive the
    # exchange (the key hash stringifies them consistently)
    assert got["n"].tolist() == [2, 1, 2]
    assert got["s"].tolist() == [4.0, 5.0, 6.0]
    assert got["k"].isna().tolist() == [False, False, True]

def test_exchange_groupby_empty_leading_blocks_single_group():
    # ADVICE r2: a single group + many blocks means most of the P
    # partitions receive no rows; every reduce placeholder must still
    # emit the merged (keys + alias) schema, including when the FIRST
    # block is empty (its partial previously omitted _gk).
    from ray_ordered_stream.agg import exchange_groupby

    df = pd.DataFrame({"k": ["only"] * 5, "v": np.arange(5.0)})
    empty = df.iloc[0:0]
    ds = ray.data.from_pandas([empty, empty, df, empty])
    got = exchange_groupby(
        ds, "k", {"s": ("v", "sum"), "n": (None, "count")},
        num_partitions=6,
    ).to_pandas()
    assert sorted(got.columns) == ["k", "n", "s"]
    assert got["k"].tolist() == ["only"]
    assert got["s"].tolist() == [10.0]
    assert got["n"].tolist() == [5]


def test_exchange_groupby_zero_block_input_keeps_agg_schema():
    # ADVICE r2: zero-block input must return the AGGREGATED schema, not
    # the raw input schema.
    from ray_ordered_stream.agg import exchange_groupby

    df = pd.DataFrame({"k": pd.Series([], dtype=str),
                       "v": pd.Series([], dtype="float64"),
                       "extra": pd.Series([], dtype="int64")})
    ds = ray.data.from_pandas(df)
    out = exchange_groupby(ds, "k", {"s": ("v", "sum"), "n": (None, "count")})
    # (Dataset.to_pandas() drops columns for all-empty blocks — a Ray
    # quirk — so assert on the blocks themselves.)
    blocks = [ray.get(r) for r in out.to_arrow_refs()]
    assert all(sorted(t.schema.names) == ["k", "n", "s"] for t in blocks)
    assert sum(t.num_rows for t in blocks) == 0

def test_rollup_and_cube_set_enumeration():
    from ray_ordered_stream.agg import cube_sets, rollup_sets

    assert rollup_sets(["a", "b"]) == [["a", "b"], ["a"], []]
    assert cube_sets(["a", "b"]) == [["a", "b"], ["a"], ["b"], []]


def test_grouping_sets_matches_pandas_rollup():
    from ray_ordered_stream.agg import grouping_sets, rollup_sets

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "k1": rng.choice(["a", "b", None], size=400),
            "k2": rng.choice(["x", "y"], size=400),
            "v": rng.normal(size=400),
        }
    )
    keys = ["k1", "k2"]
    got = (
        grouping_sets(
            ray.data.from_pandas(df).repartition(5),
            keys,
            rollup_sets(keys),
            {"n": (None, "count"), "s": ("v", "sum"), "m": ("v", "mean")},
        )
        .to_pandas()
        .sort_values(["grouping_id", "k1", "k2"], na_position="first")
        .reset_index(drop=True)
    )
    pieces = []
    for gid, ks in [(0, ["k1", "k2"]), (1, ["k1"]), (3, [])]:
        if ks:
            p = df.groupby(ks, dropna=False, as_index=False).agg(
                n=("v", "size"), s=("v", "sum"), m=("v", "mean")
            )
        else:
            p = pd.DataFrame(
                {"n": [len(df)], "s": [df["v"].sum()], "m": [df["v"].mean()]}
            )
        for k in keys:
            if k not in ks:
                p[k] = None
        p["grouping_id"] = gid
        pieces.append(p)
    exp = (
        pd.concat(pieces, ignore_index=True)[got.columns]
        .sort_values(["grouping_id", "k1", "k2"], na_position="first")
        .reset_index(drop=True)
    )
    # a data-NULL key at gid=0 is distinct from a rolled-up NULL at gid>0
    assert (got["grouping_id"] == 0).sum() == df.groupby(
        keys, dropna=False
    ).ngroups
    pd.testing.assert_frame_equal(got, exp, check_exact=False, rtol=1e-12)


def test_grouping_sets_rejects_bad_set():
    import pytest

    from ray_ordered_stream.agg import grouping_sets

    ds = ray.data.from_pandas(pd.DataFrame({"k": ["a"], "v": [1.0]}))
    with pytest.raises(ValueError):
        grouping_sets(ds, ["k"], [["nope"]], {"n": (None, "count")})


def test_pivot_wider_matches_pandas_with_empty_cells():
    from ray_ordered_stream.agg import pivot_wider

    rng = np.random.default_rng(7)
    # sparse: many (k, cat) cells empty -> exercises NULL/0 fill semantics
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 40, size=120).astype("int64"),
            "cat": rng.choice(["a", "b", "c"], size=120),
            "v": rng.normal(size=120),
        }
    )
    got = (
        pivot_wider(
            ray.data.from_pandas(df).repartition(5),
            "k",
            "cat",
            {"n": (None, "count"), "s": ("v", "sum"), "m": ("v", "mean")},
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    piv = df.pivot_table(
        index="k",
        columns="cat",
        values="v",
        aggfunc=["count", "sum", "mean"],
        dropna=False,
    )
    for cat in ["a", "b", "c"]:
        n = piv[("count", cat)].reindex(got["k"]).fillna(0).astype("int64")
        assert got[f"{cat}_n"].tolist() == n.tolist()
        s = piv[("sum", cat)].reindex(got["k"])
        np.testing.assert_allclose(
            got[f"{cat}_s"].to_numpy(), s.to_numpy(), rtol=1e-12, equal_nan=True
        )
        m = piv[("mean", cat)].reindex(got["k"])
        np.testing.assert_allclose(
            got[f"{cat}_m"].to_numpy(), m.to_numpy(), rtol=1e-12, equal_nan=True
        )
    # discovery pass found the full domain
    assert sorted(c for c in got.columns if c != "k") == sorted(
        f"{cat}_{a}" for cat in ["a", "b", "c"] for a in ["n", "s", "m"]
    )


def test_pivot_wider_explicit_values_and_unpivot_roundtrip():
    from ray_ordered_stream.agg import pivot_wider, unpivot

    df = pd.DataFrame(
        {"k": [1, 1, 2], "cat": ["x", "y", "x"], "v": [1.0, 2.0, 3.0]}
    )
    wide = (
        pivot_wider(
            ray.data.from_pandas(df),
            "k",
            "cat",
            {"s": ("v", "sum")},
            values=["x", "y", "z"],  # z never occurs -> all-NULL column
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert wide["z_s"].isna().all()
    assert wide.loc[wide["k"] == 2, "y_s"].isna().all()
    long = (
        unpivot(
            ray.data.from_pandas(wide), "k", ["x_s", "y_s", "z_s"],
            "cat", "s",
        )
        .to_pandas()
        .sort_values(["k", "cat"])
        .reset_index(drop=True)
    )
    assert len(long) == 6
    back = long.dropna(subset=["s"])
    assert back["s"].tolist() == [1.0, 2.0, 3.0]


def test_moment_aggs_match_pandas(ray_session):
    """var/stddev (pop+samp), covar, corr via power-sum partials."""
    from ray_ordered_stream.agg import exchange_groupby

    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 5, 800),
            "x": rng.integers(0, 50, 800).astype("float64"),
            "y": rng.integers(0, 9, 800).astype("float64"),
        }
    )
    ds = ray.data.from_pandas(df).repartition(7)
    got = (
        exchange_groupby(
            ds,
            "g",
            {
                "vp": ("x", "var_pop"),
                "vs": ("x", "var_samp"),
                "sp": ("x", "stddev_pop"),
                "ss": ("x", "stddev_samp"),
                "cvp": (("x", "y"), "covar_pop"),
                "cvs": (("x", "y"), "covar_samp"),
                "cr": (("x", "y"), "corr"),
            },
            num_partitions=3,
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    g = df.groupby("g")
    exp = pd.DataFrame(
        {
            "vp": g["x"].var(ddof=0),
            "vs": g["x"].var(ddof=1),
            "sp": g["x"].std(ddof=0),
            "ss": g["x"].std(ddof=1),
            "cvp": g.apply(
                lambda d: np.cov(d.x, d.y, ddof=0)[0, 1], include_groups=False
            ),
            "cvs": g.apply(
                lambda d: np.cov(d.x, d.y, ddof=1)[0, 1], include_groups=False
            ),
            "cr": g.apply(
                lambda d: np.corrcoef(d.x, d.y)[0, 1], include_groups=False
            ),
        }
    ).reset_index()
    m = got.merge(exp, on="g", suffixes=("", "_e"))
    assert len(m) == df["g"].nunique()
    for c in ["vp", "vs", "sp", "ss", "cvp", "cvs", "cr"]:
        assert np.allclose(m[c], m[f"{c}_e"], atol=1e-9), c


def test_moment_aggs_degenerate_groups(ray_session):
    """n == 1 groups: samp variants are NULL, pop variants 0; corr NULL
    when either side is constant."""
    from ray_ordered_stream.agg import exchange_groupby

    df = pd.DataFrame(
        {
            "g": ["a", "b", "b", "c", "c"],
            "x": [3.0, 1.0, 5.0, 2.0, 2.0],
            "y": [1.0, 1.0, 2.0, 3.0, 9.0],
        }
    )
    got = (
        exchange_groupby(
            ray.data.from_pandas(df),
            "g",
            {
                "vp": ("x", "var_pop"),
                "vs": ("x", "var_samp"),
                "cr": (("x", "y"), "corr"),
            },
            num_partitions=2,
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert got.loc[0, "vp"] == 0.0 and pd.isna(got.loc[0, "vs"])
    assert np.isclose(got.loc[1, "vp"], 4.0) and np.isclose(got.loc[1, "vs"], 8.0)
    assert np.isclose(got.loc[1, "cr"], 1.0)
    assert pd.isna(got.loc[2, "cr"])  # x constant in group c

    import pytest

    with pytest.raises(ValueError):
        exchange_groupby(
            ray.data.from_pandas(df), "g", {"cr": ("x", "corr")}
        )


def test_grouped_string_agg_matches_pandas(ray_session):
    from ray_ordered_stream.agg import grouped_string_agg

    rng = np.random.default_rng(17)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 12, 600),
            "o": rng.permutation(600),
            "v": rng.choice(["a", "b", "c", "dd"], 600),
        }
    )
    got = (
        grouped_string_agg(
            ray.data.from_pandas(df).repartition(5),
            key="k", val_col="v", order_by=["o"], sep="|",
            alias="s", count_alias="n", by_int=True, num_partitions=3,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = (
        df.sort_values(["k", "o"])
        .groupby("k")
        .agg(s=("v", lambda x: "|".join(x)), n=("v", "size"))
        .reset_index()
    )
    assert (got["k"].values == exp["k"].values).all()
    assert (got["s"].values == exp["s"].values).all()
    assert (got["n"].values == exp["n"].values).all()


def test_grouped_string_agg_empty_partitions_keep_key_dtype(ray_session):
    from ray_ordered_stream.agg import grouped_string_agg

    # one int key, many partitions: empty partitions must emit the SAME
    # schema (int64 key), not a string-typed placeholder
    df = pd.DataFrame({"k": [7, 7, 7], "o": [2, 0, 1], "v": ["b", "a", "c"]})
    out = grouped_string_agg(
        ray.data.from_pandas(df), key="k", val_col="v", order_by=["o"],
        sep="", alias="s", by_int=True, num_partitions=8,
    ).to_pandas()
    assert len(out) == 1
    assert out["s"].iloc[0] == "acb"  # (o=0,'a'), (o=1,'c'), (o=2,'b')
    assert out["k"].dtype == np.int64


def test_arg_max_min_match_pandas(ray_session):
    """max_by/min_by through the exchange: NULL order values lose, ties
    break to the minimum value, champions merge associatively across
    partitions."""
    from ray_ordered_stream.agg import exchange_groupby

    rng = np.random.default_rng(11)
    n = 4000
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 23, n),
            "v": rng.integers(0, 400, n),
            # coarse order column -> plenty of within-group ties
            "o": rng.integers(0, 12, n).astype("float64"),
        }
    )
    df.loc[rng.choice(n, 300, replace=False), "o"] = np.nan

    got = (
        exchange_groupby(
            ray.data.from_pandas(df).repartition(9),
            "g",
            {
                "amax": (("v", "o"), "arg_max"),
                "amin": (("v", "o"), "arg_min"),
                "n": (None, "count"),
            },
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )

    def champ(g: pd.DataFrame, asc: bool) -> int:
        s = g.sort_values(
            ["o", "v"], ascending=[asc, True], na_position="last"
        )
        return int(s["v"].iloc[0])

    want = (
        df.groupby("g")
        .apply(
            lambda g: pd.Series(
                {
                    "amax": champ(g, False),
                    "amin": champ(g, True),
                    "n": len(g),
                }
            ),
            include_groups=False,
        )
        .reset_index()
        .sort_values("g")
        .reset_index(drop=True)
    )
    for c in ("amax", "amin", "n"):
        assert (got[c].astype("int64") == want[c].astype("int64")).all(), c


def test_arg_max_string_value_and_all_null_order(ray_session):
    """String-valued arg aggregates survive the Arrow exchange; a group
    whose order column is ALL NULL still emits its min-value row (SQL
    row_number over ORDER BY o DESC NULLS LAST, v ASC)."""
    from ray_ordered_stream.agg import exchange_groupby

    df = pd.DataFrame(
        {
            "g": [1, 1, 1, 2, 2],
            "v": ["b", "a", "c", "zz", "aa"],
            "o": [5.0, 5.0, np.nan, np.nan, np.nan],
        }
    )
    got = (
        exchange_groupby(
            ray.data.from_pandas(df).repartition(3),
            "g",
            {"best": (("v", "o"), "arg_max")},
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert list(got["best"]) == ["a", "aa"]
