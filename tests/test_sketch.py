"""HLL distinct-count and distributed-quantile sketches (functions/sketch)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from ray_ordered_stream.functions.sketch import (
    HLL,
    approx_distinct,
    distributed_quantiles,
)


def test_hll_error_bound_and_merge():
    rng = np.random.default_rng(4)
    vals = rng.integers(0, 1 << 62, size=200_000)
    n_true = len(np.unique(vals))
    one = HLL(12).add_column(pa.array(vals, pa.int64()))
    est = one.estimate()
    assert abs(est - n_true) / n_true < 0.05  # 3 sigma ~ 4.9% at p=12

    # merge of halves == single-shot registers
    a = HLL(12).add_column(pa.array(vals[:100_000], pa.int64()))
    b = HLL(12).add_column(pa.array(vals[100_000:], pa.int64()))
    a.merge(b)
    assert (a.registers == one.registers).all()


def test_hll_small_range_is_near_exact():
    h = HLL(12).add_column(pa.array([f"k{i}" for i in range(150)], pa.string()))
    assert abs(h.estimate() - 150) <= 8  # linear-counting regime, ~3.3 sigma


def test_hll_string_and_int_columns_differ_but_are_deterministic():
    s = HLL(12).add_column(pa.array(["1", "2", "3"], pa.string()))
    s2 = HLL(12).add_column(pa.array(["1", "2", "3"], pa.string()))
    assert (s.registers == s2.registers).all()


def test_approx_distinct_distributed(ray_session):
    import ray.data

    rng = np.random.default_rng(9)
    vals = rng.integers(0, 50_000, size=120_000)
    n_true = len(np.unique(vals))
    ds = ray.data.from_arrow(
        pa.table({"v": pa.array(vals, pa.int64())})
    ).repartition(6)
    est = approx_distinct(ds, "v", p=12)
    assert abs(est - n_true) / n_true < 0.05


def test_distributed_quantiles_rank_certificate(ray_session):
    import ray.data

    rng = np.random.default_rng(2)
    vals = rng.normal(size=80_000)
    ds = ray.data.from_arrow(
        pa.table({"v": pa.array(vals, pa.float64())})
    ).repartition(5)
    res = distributed_quantiles(ds, "v", [0.5, 0.9, 0.99], candidates_per_block=128)
    for q, r in res.items():
        assert r["n"] == len(vals)
        # certificate: the returned EXACT rank covers the target within bound
        assert abs(r["rank"] - q * r["n"]) <= r["max_rank_err"] + 1
        # value-space closeness is only indirect (the guarantee is the rank
        # bound); still, candidates are dense enough to land nearby
        assert abs(r["value"] - np.quantile(vals, q)) < 0.15


def test_distributed_quantiles_empty(ray_session):
    import ray.data

    ds = ray.data.from_arrow(pa.table({"v": pa.array([], pa.float64())}))
    res = distributed_quantiles(ds, "v", [0.5])
    assert res[0.5]["value"] is None and res[0.5]["n"] == 0


def test_grouped_quantiles_rank_certificates(ray_session):
    import ray.data

    from ray_ordered_stream.functions.sketch import grouped_quantiles

    rng = np.random.default_rng(12)
    n = 60_000
    groups = np.array(["a", "b", "c"], dtype=object)[rng.integers(0, 3, n)]
    vals = rng.normal(loc=(groups == "b") * 3.0, size=n)
    ds = ray.data.from_arrow(
        pa.table(
            {"g": pa.array(groups, pa.string()), "v": pa.array(vals, pa.float64())}
        )
    ).repartition(5)
    res = grouped_quantiles(ds, "v", "g", [0.5, 0.9], candidates_per_block=64)
    assert set(res) == {"a", "b", "c"}
    for g, per_q in res.items():
        gv = vals[groups == g]
        for q, r in per_q.items():
            assert r["n"] == len(gv)
            assert abs(r["rank"] - q * r["n"]) <= r["max_rank_err"] + 1
            assert abs(r["value"] - np.quantile(gv, q)) < 0.3


def test_heavy_hitters_guarantees(ray_session):
    from collections import Counter

    import numpy as np
    import pandas as pd
    import ray.data

    from ray_ordered_stream.functions.sketch import heavy_hitters

    rng = np.random.default_rng(23)
    # zipf-ish stream: a few heavy items + a long tail
    vals = (
        ["hot"] * 4000 + ["warm"] * 1500 + ["mild"] * 700
        + [f"tail{i}" for i in rng.integers(0, 3000, size=6000)]
    )
    rng.shuffle(vals)
    ds = ray.data.from_pandas(
        pd.DataFrame({"item": vals})
    ).repartition(8)
    k = 16
    hh = heavy_hitters(ds, "item", k=k)
    exact = Counter(vals)
    n = len(vals)
    assert hh["n"] == n
    assert hh["err"] * (k + 1) <= n
    est = dict(zip(hh["items"], hh["estimates"]))
    # every item above the error bound must be present and within err
    for item, c in exact.items():
        if c > hh["err"]:
            assert item in est
        if item in est:
            assert est[item] <= c
            assert c - est[item] <= hh["err"]
    for heavy in ("hot", "warm", "mild"):
        assert heavy in est
    # k above the true cardinality -> exact counts, zero error
    small = ray.data.from_pandas(
        pd.DataFrame({"item": ["a", "b", "a", "c", "a", "b"]})
    ).repartition(3)
    hh2 = heavy_hitters(small, "item", k=8)
    assert hh2["err"] == 0
    assert dict(zip(hh2["items"], hh2["estimates"])) == {"a": 3, "b": 2, "c": 1}

    # tokenize mode matches the repo tokenizer
    docs = ray.data.from_pandas(
        pd.DataFrame({"text": ["The cat! the CAT sat", "dog the dog"]})
    )
    hh3 = heavy_hitters(docs, "text", k=8, tokenize=True)
    assert dict(zip(hh3["items"], hh3["estimates"])) == {
        "the": 3, "cat": 2, "dog": 2, "sat": 1
    }


def test_quantile_threshold_filter_matches_numpy():
    import ray.data

    from ray_ordered_stream.functions.sketch import (
        exact_value_histogram,
        quantile_disc_from_hist,
        quantile_threshold_filter,
    )

    rng = np.random.default_rng(11)
    v = rng.integers(0, 40, size=1000).astype("int64")
    ds = ray.data.from_pandas(
        pd.DataFrame({"id": np.arange(1000, dtype="int64"), "m": v})
    ).repartition(7)

    vals, counts = exact_value_histogram(ds, "m")
    exp_vals, exp_counts = np.unique(v, return_counts=True)
    np.testing.assert_array_equal(vals, exp_vals)
    np.testing.assert_array_equal(counts, exp_counts)

    s = np.sort(v)
    for q in (0.0, 0.1, 0.5, 0.9, 1.0):
        assert quantile_disc_from_hist(vals, counts, q) == int(
            s[int(np.floor(q * (len(s) - 1)))]
        )

    kept, thr = quantile_threshold_filter(ds, "m", 0.25)
    got = kept.to_pandas().sort_values("id").reset_index(drop=True)
    exp = (
        pd.DataFrame({"id": np.arange(1000, dtype="int64"), "m": v})
        .query("m >= @thr")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_exact_distinct_matches_oracle():
    import ray.data

    from ray_ordered_stream.functions.sketch import exact_distinct

    rng = np.random.default_rng(3)
    ints = rng.integers(0, 500, size=2000).astype("int64")
    strs = np.array([f"s{v}" for v in rng.integers(0, 300, size=2000)])
    ds = ray.data.from_pandas(
        pd.DataFrame({"i": ints, "s": strs})
    ).repartition(6)
    assert exact_distinct(ds, "i") == len(np.unique(ints))
    assert exact_distinct(ds, "s") == len(np.unique(strs))


def test_grouped_approx_distinct_matches_serial_hll(ray_session):
    import ray.data as rd

    from ray_ordered_stream.functions.sketch import (
        HLL,
        _hash_column,
        grouped_approx_distinct,
    )

    rng = np.random.default_rng(3)
    n = 20000
    grp = rng.integers(0, 5, n).astype(np.int64)
    # per-group distinct scales with the group id
    val = rng.integers(0, 1 + 400 * (1 + grp), n).astype(np.int64) + grp * 10**9
    t = pa.table({"g": grp, "v": val})

    out = (
        grouped_approx_distinct(
            rd.from_arrow(t).repartition(6), "g", "v", p=12
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )

    # serial reference: one dense HLL per group over the same hashes
    for gi in range(5):
        mask = grp == gi
        ref = HLL(12).add_hashes(_hash_column(pa.array(val[mask])))
        approx = out.loc[out["g"] == gi, "approx"].iloc[0]
        assert abs(approx - ref.estimate()) < 1e-6, gi
        exact = len(np.unique(val[mask]))
        assert abs(approx - exact) <= 5 * 1.04 / np.sqrt(4096) * exact + 3


def test_profile_dataset_tree_reduce(ray_session):
    import ray.data as rd

    from ray_ordered_stream.functions.profile import profile_dataset

    n = 5000
    t = pa.table(
        {
            "i": pa.array(np.arange(n, dtype=np.int64) % 700),
            "f": pa.array((np.arange(n) % 13).astype(np.float64) * 1.5),
            "s": pa.array([f"v{j % 50}" for j in range(n)]),
            "with_null": pa.array(
                [None if j % 10 == 0 else j for j in range(n)], pa.int64()
            ),
        }
    )
    prof = (
        profile_dataset(rd.from_arrow(t).repartition(23))
        .to_pandas()
        .set_index("column")
    )
    assert prof.loc["i", "n"] == n and prof.loc["i", "nulls"] == 0
    assert prof.loc["i", "min_f"] == 0.0 and prof.loc["i", "max_f"] == 699.0
    assert prof.loc["f", "sum_f"] == float(((np.arange(n) % 13) * 1.5).sum())
    assert prof.loc["with_null", "nulls"] == 500
    assert prof.loc["s", "min_f"] != prof.loc["s", "min_f"] or prof.loc[
        "s", "min_f"
    ] is None  # string col: no numeric stats
    # HLL within 10% of the true cardinalities
    for c, exact in (("i", 700), ("f", 13), ("s", 50), ("with_null", 4500)):
        approx = prof.loc[c, "approx_distinct"]
        assert abs(approx - exact) <= 0.1 * exact + 3, (c, approx)


def test_profile_dataset_skips_unhashable_columns(ray_session):
    """profile_dataset() default (all columns) must not crash on list/
    binary columns — counts still report; approx_distinct is null."""
    import ray.data as rd

    from ray_ordered_stream.functions.profile import profile_dataset

    t = pa.table(
        {
            "vec_id": pa.array([1, 2, 3], pa.int64()),
            "embedding": [[1.0, 2.0], [3.0, 4.0], None],
            "blob": pa.array([b"a", b"bb", b"ccc"], pa.binary()),
        }
    )
    prof = profile_dataset(rd.from_arrow(t)).to_pandas().set_index("column")
    assert abs(prof.loc["vec_id", "approx_distinct"] - 3.0) < 0.1
    assert prof.loc["embedding", "nulls"] == 1
    e = prof.loc["embedding", "approx_distinct"]
    assert e is None or e != e  # null
    b = prof.loc["blob", "approx_distinct"]
    assert b is None or b != b


def test_exact_percentiles_match_numpy(ray_session):
    import ray.data as rd

    from ray_ordered_stream.functions.sketch import exact_percentiles

    rng = np.random.default_rng(21)
    for n, cpb in [(10_000, 128), (777, 16), (5, 128), (1, 128)]:
        v = np.round(rng.normal(100, 25, n), 3)
        ds = rd.from_pandas(pd.DataFrame({"x": v})).repartition(5)
        qs = [0.0, 0.1, 0.25, 0.5, 0.9, 1.0]
        got = exact_percentiles(ds, "x", qs, candidates_per_block=cpb)
        exp = np.quantile(v, qs, method="linear")
        for q, e in zip(qs, exp):
            assert abs(got[q] - e) < 1e-9, (n, cpb, q, got[q], e)


def test_exact_percentiles_nulls_and_empty(ray_session):
    import ray.data as rd

    from ray_ordered_stream.functions.sketch import exact_percentiles

    df = pd.DataFrame({"x": [np.nan, 1.0, np.nan, 3.0, 2.0]})
    got = exact_percentiles(rd.from_pandas(df), "x", [0.5])
    assert got[0.5] == 2.0  # NaNs ignored like SQL NULLs
    empty = pd.DataFrame({"x": pd.Series([], dtype="float64")})
    got = exact_percentiles(rd.from_pandas(empty), "x", [0.5])
    assert got[0.5] is None


def test_equal_width_histogram_matches_numpy(ray_session):
    from ray_ordered_stream.functions.sketch import equal_width_histogram

    rng = np.random.default_rng(3)
    v = rng.uniform(-5.0, 17.0, 5000)
    v[rng.choice(5000, 100, replace=False)] = np.nan
    df = pd.DataFrame({"x": v})
    got = (
        equal_width_histogram(
            ray.data.from_pandas(df).repartition(6), "x", nbins=13
        )
        .to_pandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    w = v[~np.isnan(v)]
    lo, hi = w.min(), w.max()
    b = np.floor((w - lo) * np.float64(13) / (hi - lo))
    b = np.maximum(0.0, np.minimum(12.0, b)).astype(np.int64)
    vals, cnt = np.unique(b, return_counts=True)
    assert list(got["bin"]) == list(vals)
    assert list(got["n"]) == list(cnt)
    assert int(got["n"].sum()) == len(w)
    # edges replay the documented closed form
    assert np.allclose(
        got["lo_edge"], lo + got["bin"].to_numpy(np.float64) * (hi - lo) / 13
    )


def test_equal_width_histogram_degenerate_and_fixed_bounds(ray_session):
    from ray_ordered_stream.functions.sketch import equal_width_histogram

    # constant column: everything lands in bin 0
    one = ray.data.from_pandas(pd.DataFrame({"x": [4.0] * 10}))
    got = equal_width_histogram(one, "x", nbins=8).to_pandas()
    assert list(got["bin"]) == [0] and list(got["n"]) == [10]

    # explicit bounds clamp outliers into the end buckets
    df = pd.DataFrame({"x": [-100.0, 0.1, 0.9, 100.0]})
    got = (
        equal_width_histogram(
            ray.data.from_pandas(df), "x", nbins=2, lo=0.0, hi=1.0
        )
        .to_pandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    assert list(got["bin"]) == [0, 1]
    assert list(got["n"]) == [2, 2]


def test_grouped_percentile_cont_matches_pandas(ray_session):
    from ray_ordered_stream.functions.sketch import grouped_percentile_cont

    rng = np.random.default_rng(21)
    n = 3000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 9, n),
            "v": rng.normal(0, 10, n),
        }
    )
    df.loc[rng.choice(n, 150, replace=False), "v"] = np.nan
    df.loc[df["k"] == 7, "v"] = np.nan  # an all-NULL group
    got = (
        grouped_percentile_cont(
            ray.data.from_pandas(df).repartition(6),
            "k", "v", {"p90": 0.9, "p10": 0.1, "p50": 0.5},
            by_int=True,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(got.columns) == ["k", "p90", "p10", "p50"]
    want = df.groupby("k")["v"].quantile([0.1, 0.5, 0.9]).unstack()
    for a, q in (("p90", 0.9), ("p10", 0.1), ("p50", 0.5)):
        g = got[a].to_numpy()
        w = want[q].to_numpy()
        both_nan = np.isnan(g) & np.isnan(w)
        assert (both_nan | (g == w)).all(), a
    assert np.isnan(got.loc[got["k"] == 7, "p50"]).all()
