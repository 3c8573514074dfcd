"""Grouped top-k operator (functions/topk) vs pandas oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_grouped_topk_matches_pandas(ray_session):
    import ray.data

    from ray_ordered_stream.functions.topk import grouped_topk

    rng = np.random.default_rng(6)
    n = 50_000
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 500, n),
            "v": rng.normal(size=n).round(3),  # rounded -> real ties exist
            "id": np.arange(n, dtype="int64"),
        }
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(8)
    got = (
        grouped_topk(ds, "g", "v", 5, tiebreak="id", by_int=True, num_partitions=3)
        .to_pandas()
        .sort_values(["g", "v", "id"], ascending=[True, False, False])
        .reset_index(drop=True)
    )
    exp = (
        df.sort_values(["g", "v", "id"], ascending=[True, False, False])
        .groupby("g")
        .head(5)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["g", "v", "id"]], exp[["g", "v", "id"]])


def test_grouped_topk_ascending(ray_session):
    import ray.data

    from ray_ordered_stream.functions.topk import grouped_topk

    df = pd.DataFrame({"g": [1, 1, 1, 2], "v": [3.0, 1.0, 2.0, 9.0],
                       "id": [0, 1, 2, 3]})
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = (
        grouped_topk(ds, "g", "v", 2, tiebreak="id", descending=False,
                     by_int=True, num_partitions=2)
        .to_pandas()
        .sort_values(["g", "v"])
        .reset_index(drop=True)
    )
    assert got["v"].tolist() == [1.0, 2.0, 9.0]


def test_grouped_topk_unsigned_value_column(ray_session):
    """Regression (review): descending sort keys must not wrap on unsigned
    dtypes (0 would rank as the maximum)."""
    import ray.data

    from ray_ordered_stream.functions.topk import grouped_topk

    t = pa.table(
        {
            "g": pa.array([1, 1, 1], pa.int64()),
            "v": pa.array([0, 5, 3], pa.uint32()),
            "id": pa.array([0, 1, 2], pa.int64()),
        }
    )
    got = (
        grouped_topk(ray.data.from_arrow(t), "g", "v", 2, tiebreak="id",
                     by_int=True, num_partitions=2)
        .to_pandas()
        .sort_values("v", ascending=False)
    )
    assert got["v"].tolist() == [5, 3]
