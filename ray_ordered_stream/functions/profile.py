"""One-pass dataset profiling: per-column row/null counts, numeric
min/max/sum, and an HLL approximate distinct — the "what is in this 100 TB
directory" report that precedes any curation run.

Single map_batches pass emits one TINY partial row per (block, column):
counts, extrema, and the column's HLL registers (m bytes, independent of
row count). The driver folds O(blocks x columns) partials — never data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .sketch import HLL, _hash_column


def profile_dataset(ds, columns: list[str] | None = None, p: int = 12):
    """Profile ``ds``: returns a pyarrow Table with one row per column —
    (column, n, nulls, approx_distinct float, min_f, max_f, sum_f) where
    the ``_f`` stats are float64 for numeric/temporal columns and null
    otherwise."""
    import ray

    if columns is None:
        columns = ds.schema().names

    def partial(t: pa.Table) -> pa.Table:
        names, ns, nulls, regs, mins, maxs, sums = [], [], [], [], [], [], []
        for c in columns:
            col = t[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            names.append(c)
            ns.append(t.num_rows)
            nulls.append(col.null_count)
            h = HLL(p)
            if t.num_rows:
                h.add_hashes(_hash_column(col.drop_null()))
            regs.append(h.registers)
            ty = col.type
            if (
                pa.types.is_integer(ty)
                or pa.types.is_floating(ty)
                or pa.types.is_temporal(ty)
            ) and t.num_rows - col.null_count > 0:
                v = col.drop_null()
                if pa.types.is_temporal(ty):
                    v = v.cast(pa.int64())
                arr = v.to_numpy(zero_copy_only=False).astype(np.float64)
                mins.append(float(arr.min()))
                maxs.append(float(arr.max()))
                sums.append(float(arr.sum()))
            else:
                mins.append(None)
                maxs.append(None)
                sums.append(None)
        return pa.table(
            {
                "column": pa.array(names, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "nulls": pa.array(nulls, pa.int64()),
                "registers": pa.array(
                    [r.tobytes() for r in regs], pa.binary()
                ),
                "min_f": pa.array(mins, pa.float64()),
                "max_f": pa.array(maxs, pa.float64()),
                "sum_f": pa.array(sums, pa.float64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = {
        "column": [], "n": [], "nulls": [], "approx_distinct": [],
        "min_f": [], "max_f": [], "sum_f": [],
    }
    for c in columns:
        rows = parts[parts["column"] == c]
        h = HLL(p)
        for blob in rows["registers"]:
            h.merge(HLL(p, registers=np.frombuffer(blob, dtype=np.uint8)))
        out["column"].append(c)
        out["n"].append(int(rows["n"].sum()))
        out["nulls"].append(int(rows["nulls"].sum()))
        out["approx_distinct"].append(float(h.estimate()))
        mn, mx, sm = rows["min_f"], rows["max_f"], rows["sum_f"]
        out["min_f"].append(float(mn.min()) if mn.notna().any() else None)
        out["max_f"].append(float(mx.max()) if mx.notna().any() else None)
        out["sum_f"].append(float(sm.sum()) if sm.notna().any() else None)
    return pa.table(
        {
            "column": pa.array(out["column"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "nulls": pa.array(out["nulls"], pa.int64()),
            "approx_distinct": pa.array(out["approx_distinct"], pa.float64()),
            "min_f": pa.array(out["min_f"], pa.float64()),
            "max_f": pa.array(out["max_f"], pa.float64()),
            "sum_f": pa.array(out["sum_f"], pa.float64()),
        }
    )
