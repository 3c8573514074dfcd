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

    def hashable(ty: pa.DataType) -> bool:
        return (
            pa.types.is_string(ty)
            or pa.types.is_large_string(ty)
            or pa.types.is_integer(ty)
            or pa.types.is_floating(ty)
            or pa.types.is_boolean(ty)
            or pa.types.is_temporal(ty)
        )

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
            if t.num_rows and hashable(col.type):
                # list/struct/binary columns get counts but no distinct
                # estimate (no 64-bit hash kernel for nested payloads);
                # the empty registers estimate ~0 and the fold marks them
                v = col.drop_null()
                if pa.types.is_boolean(v.type) or pa.types.is_temporal(
                    v.type
                ):
                    v = v.cast(pa.int64())
                h.add_hashes(_hash_column(v))
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

    @ray.remote
    def merge(*tbls: pa.Table) -> pa.Table:
        """Fold partial profile tables: one output row per column (max of
        registers, sums of counts, extrema of extrema) — the tree level
        keeps driver traffic at fanin x columns rows, never blocks x
        columns (at 10^6 blocks the flat fold would ship ~GBs of
        registers to the driver)."""
        import pandas as pd_

        df = pa.concat_tables(
            [t for t in tbls if t.num_rows], promote_options="none"
        ).to_pandas()
        rows = []
        for c, g in df.groupby("column", sort=False):
            h = HLL(p)
            for blob in g["registers"]:
                h.merge(HLL(p, registers=np.frombuffer(blob, dtype=np.uint8)))
            rows.append(
                {
                    "column": c,
                    "n": int(g["n"].sum()),
                    "nulls": int(g["nulls"].sum()),
                    "registers": h.registers.tobytes(),
                    "min_f": float(g["min_f"].min())
                    if g["min_f"].notna().any()
                    else None,
                    "max_f": float(g["max_f"].max())
                    if g["max_f"].notna().any()
                    else None,
                    "sum_f": float(g["sum_f"].sum())
                    if g["sum_f"].notna().any()
                    else None,
                }
            )
        out = pd_.DataFrame(rows)
        return pa.Table.from_pandas(out, preserve_index=False).cast(
            pa.schema(
                [
                    ("column", pa.string()),
                    ("n", pa.int64()),
                    ("nulls", pa.int64()),
                    ("registers", pa.binary()),
                    ("min_f", pa.float64()),
                    ("max_f", pa.float64()),
                    ("sum_f", pa.float64()),
                ]
            )
        )

    refs = list(
        ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    )
    fanin = 8
    while len(refs) > 1:
        refs = [
            merge.remote(*refs[i : i + fanin])
            for i in range(0, len(refs), fanin)
        ]
    folded = ray.get(refs[0]).to_pandas() if refs else None
    out = {
        "column": [], "n": [], "nulls": [], "approx_distinct": [],
        "min_f": [], "max_f": [], "sum_f": [],
    }
    for c in columns:
        rows = folded[folded["column"] == c] if folded is not None else None
        if rows is None or not len(rows):
            continue
        r = rows.iloc[0]
        h = HLL(p, registers=np.frombuffer(r["registers"], dtype=np.uint8))
        out["column"].append(c)
        out["n"].append(int(r["n"]))
        out["nulls"].append(int(r["nulls"]))
        ty = dict(zip(ds.schema().names, ds.schema().types)).get(c)
        est = (
            float(h.estimate())
            if not isinstance(ty, pa.DataType) or hashable(ty)
            else None
        )
        out["approx_distinct"].append(est)
        # pandas surfaces nulls as NaN (x != x)
        for k in ("min_f", "max_f", "sum_f"):
            v = r[k]
            out[k].append(None if v is None or v != v else float(v))
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
