"""Set operations (functions/setops.py) vs pandas oracles — incl. SQL's
NULL-equality set semantics, dtype preservation, and empty sides."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from ray_ordered_stream.functions.setops import (
    distinct,
    except_distinct,
    intersect_distinct,
    union_distinct,
)


def _mk(df: pd.DataFrame, parts: int = 5):
    return ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(parts)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)  # None -> 'None', stable sort key
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _frame(rng, n=400, with_nulls=True):
    df = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c", "d"], size=n),
            "g": rng.integers(0, 6, size=n).astype("int64"),
            "x": rng.choice([0.5, 1.25, -3.0, 7.75], size=n),
        }
    )
    if with_nulls:
        df.loc[rng.choice(n, size=n // 8, replace=False), "k"] = None
        df["x"] = df["x"].mask(rng.random(n) < 0.1)
    return df


def test_distinct_matches_pandas_incl_nulls():
    rng = np.random.default_rng(11)
    df = _frame(rng)
    got = distinct(_mk(df)).to_pandas()
    exp = df.drop_duplicates(["k", "g", "x"])
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))


def test_distinct_subset_columns():
    rng = np.random.default_rng(12)
    df = _frame(rng)
    got = distinct(_mk(df), cols=["k", "g"]).to_pandas()
    assert sorted(got.columns) == ["g", "k"]
    exp = df[["k", "g"]].drop_duplicates()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))


def test_intersect_and_except_match_pandas_null_equality():
    rng = np.random.default_rng(13)
    a, b = _frame(rng), _frame(rng, n=300)
    da, db = _mk(a), _mk(b, parts=3)
    ka = a.drop_duplicates(["k", "g", "x"])
    kb = b.drop_duplicates(["k", "g", "x"])
    # pandas merge matches NaN/None keys with each other == SQL set-op
    # NULL equality
    m = ka.merge(kb, on=["k", "g", "x"], how="left", indicator=True)
    exp_i = m[m["_merge"] == "both"][["k", "g", "x"]]
    exp_e = m[m["_merge"] == "left_only"][["k", "g", "x"]]
    got_i = intersect_distinct(da, db).to_pandas()
    got_e = except_distinct(da, db).to_pandas()
    assert len(exp_i) > 0 and len(exp_e) > 0  # both branches exercised
    pd.testing.assert_frame_equal(_canon(got_i), _canon(exp_i))
    pd.testing.assert_frame_equal(_canon(got_e), _canon(exp_e))


def test_union_distinct_matches_pandas():
    rng = np.random.default_rng(15)
    a, b = _frame(rng), _frame(rng, n=250)
    got = union_distinct(_mk(a), _mk(b, parts=3)).to_pandas()
    exp = pd.concat([a, b]).drop_duplicates(["k", "g", "x"])
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))


def test_union_distinct_subset_and_mismatch():
    rng = np.random.default_rng(16)
    a, b = _frame(rng, n=100), _frame(rng, n=80)
    got = union_distinct(_mk(a), _mk(b), cols=["k", "g"]).to_pandas()
    exp = pd.concat([a, b])[["k", "g"]].drop_duplicates()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))
    with pytest.raises(ValueError, match="rename"):
        union_distinct(_mk(a), _mk(pd.DataFrame({"zz": [1]}), parts=1))


def test_except_empty_right_is_distinct():
    rng = np.random.default_rng(14)
    df = _frame(rng, with_nulls=False)
    empty = df.iloc[0:0]
    got = except_distinct(_mk(df), _mk(empty, parts=1)).to_pandas()
    exp = df.drop_duplicates()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))


def test_intersect_disjoint_is_empty_with_schema():
    a = pd.DataFrame({"k": ["a", "b"], "v": [1, 2]})
    b = pd.DataFrame({"k": ["c", "d"], "v": [3, 4]})
    out = intersect_distinct(_mk(a, parts=1), _mk(b, parts=1))
    t = pa.concat_tables(out.to_arrow_refs() and [ray.get(r) for r in out.to_arrow_refs()])
    assert t.num_rows == 0
    assert set(t.column_names) == {"k", "v"}


def test_dtype_preserved_timestamp_and_int32():
    ts = pd.to_datetime(["2026-01-01", "2026-01-02", "2026-01-01"])
    t = pa.table(
        {
            "ts": pa.array(ts, pa.timestamp("us")),
            "n": pa.array([1, 2, 1], pa.int32()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(2)
    out = pa.concat_tables(
        [ray.get(r) for r in distinct(ds).to_arrow_refs()],
        promote_options="default",
    )
    assert out.schema.field("ts").type == pa.timestamp("us")
    assert out.schema.field("n").type == pa.int32()
    assert out.num_rows == 2


def test_right_column_mismatch_raises():
    a = _mk(pd.DataFrame({"k": ["a"]}), parts=1)
    b = _mk(pd.DataFrame({"other": ["a"]}), parts=1)
    with pytest.raises(ValueError, match="rename"):
        except_distinct(a, b)
