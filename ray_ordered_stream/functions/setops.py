"""SQL set operations over the shared exchange: DISTINCT, INTERSECT,
EXCEPT (both with SQL's DISTINCT set semantics, where NULLs compare
equal).

Scale plan: each batch reduces to its DISTINCT rows first (an Arrow
group_by combiner — at most one copy of a row leaves any input block),
a 64-bit row hash routes both sides through ONE co-partitioning
exchange, and each partition finishes with an exact vectorized
set-membership pass. Row count shuffled is bounded by (distinct rows x
input blocks), never the raw row count.

(The reference pipeline has no generic set ops — engine-owned surface
alongside hash_join / asof_join, cf. SURVEY.md §2.5.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..exchange import default_partitions, shard_refs

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _row_hash(t: pa.Table, cols: list[str]) -> np.ndarray:
    """Deterministic u64 hash of the row tuple over ``cols`` (FNV-1a of
    each column's string form, mixed across columns). NULL stringifies
    to a sentinel so it routes consistently whatever the column dtype —
    the hash only ROUTES rows; equality is re-checked per partition."""
    from ..partitioning import hash_string_array

    h = np.full(t.num_rows, _FNV_OFFSET)
    with np.errstate(over="ignore"):
        for c in cols:
            s = pc.cast(t[c], pa.string())
            s = pc.coalesce(s, pa.scalar("\x00null"))
            if isinstance(s, pa.ChunkedArray):
                s = s.combine_chunks()
            h = (h ^ hash_string_array(s)) * _FNV_PRIME
    return h


def _prep(cols: list[str]):
    """Per-batch combiner: project to ``cols``, drop duplicate rows
    (Arrow hash group_by — NULL forms its own group, matching SQL set
    semantics), append the routing hash."""

    def fn(t: pa.Table) -> pa.Table:
        t = t.select(cols).group_by(cols).aggregate([])
        return t.append_column(
            "__rh", pa.array(_row_hash(t, cols).view(np.int64), pa.int64())
        )

    return fn


def _concat(shards) -> pa.Table | None:
    withcols = [t for t in shards if t.num_rows or t.column_names]
    if not withcols:
        return None
    real = [t for t in withcols if t.num_rows]
    return (
        pa.concat_tables(real, promote_options="default")
        if real
        else withcols[0].slice(0, 0)
    )


def _finish(df: pd.DataFrame, cols: list[str], target: pa.Schema) -> pa.Table:
    t = pa.Table.from_pandas(
        df[cols].reset_index(drop=True), preserve_index=False
    )
    # normalize the pandas roundtrip (empty object -> null type, ns
    # timestamps) back to the input schema so blocks unify exactly
    return t.cast(target)


def _setop_part(op: str, cols: list[str]):
    @ray.remote
    def part(fallback: pa.Table, n_left: int, *shards: pa.Table) -> pa.Table:
        lt = _concat(shards[:n_left])
        if lt is None:
            # no left shard carried columns (all-empty split group):
            # still emit the projected schema so the result unifies
            return fallback
        ldf = lt.to_pandas().drop(columns=["__rh"]).drop_duplicates(cols)
        if op == "distinct":
            return _finish(ldf, cols, fallback.schema)
        rt = _concat(shards[n_left:])
        rdf = (
            rt.to_pandas().drop(columns=["__rh"]).drop_duplicates(cols)
            if rt is not None
            else ldf.iloc[0:0]
        )
        # pandas merge matches NaN/None keys with each other — SQL set-op
        # NULL-equality semantics for free
        m = ldf.merge(rdf, on=cols, how="left", indicator=True)
        keep = m["_merge"] == ("both" if op == "intersect" else "left_only")
        return _finish(m[keep], cols, fallback.schema)

    return part


def _pa_type(t) -> pa.DataType:
    if isinstance(t, pa.DataType):
        return t
    try:  # numpy dtype from a PandasBlockSchema
        return pa.from_numpy_dtype(t)
    except (pa.ArrowNotImplementedError, TypeError):
        return pa.string()  # object dtype: strings in this engine


def _run(op: str, a, b, cols, num_partitions):
    import ray.data

    sch = a.schema()
    cols = list(cols) if cols is not None else list(sch.names)
    raw = dict(zip(sch.names, sch.types))
    fallback = pa.schema(
        [(c, _pa_type(raw[c])) for c in cols]
    ).empty_table()
    pa_ = a.map_batches(_prep(cols), batch_format="pyarrow")
    refs_a = list(pa_.to_arrow_refs())
    P = max(2, num_partitions or default_partitions())
    groups_a = shard_refs(refs_a, "__rh", P, by_int=True)
    if b is not None:
        bsch = b.schema()  # None when b carries no blocks at all
        missing = [c for c in cols if bsch is not None and c not in bsch.names]
        if missing:
            raise ValueError(
                f"right side lacks set-op columns {missing}; rename first"
            )
        pb = b.map_batches(_prep(cols), batch_format="pyarrow")
        groups_b = shard_refs(list(pb.to_arrow_refs()), "__rh", P, by_int=True)
    else:
        groups_b = []
    part = _setop_part(op, cols)
    out = [
        part.remote(
            fallback,
            len(groups_a),
            *[g[p] for g in groups_a],
            *[g[p] for g in groups_b],
        )
        for p in range(P)
    ]
    return ray.data.from_arrow_refs(out)


def distinct(ds, cols: list[str] | None = None, num_partitions: int | None = None):
    """SELECT DISTINCT over ``cols`` (default: all columns)."""
    return _run("distinct", ds, None, cols, num_partitions)


def union_distinct(a, b, cols: list[str] | None = None,
                   num_partitions: int | None = None):
    """SQL UNION: distinct rows of ``a`` and ``b`` together. Ray Data's
    ``union`` chains the block lists lazily (no data movement), so this
    is exactly one exchange — the same cost as ``distinct`` over the
    concatenated input."""
    sch = a.schema()
    cols = list(cols) if cols is not None else list(sch.names)
    bsch = b.schema()
    missing = [c for c in cols if bsch is not None and c not in bsch.names]
    if missing:
        raise ValueError(
            f"right side lacks set-op columns {missing}; rename first"
        )
    return _run(
        "distinct",
        a.select_columns(cols).union(b.select_columns(cols)),
        None,
        cols,
        num_partitions,
    )


def intersect_distinct(a, b, cols: list[str] | None = None,
                       num_partitions: int | None = None):
    """SQL INTERSECT: distinct rows of ``a`` also present in ``b``.
    Column names must match (rename the right side first)."""
    return _run("intersect", a, b, cols, num_partitions)


def except_distinct(a, b, cols: list[str] | None = None,
                    num_partitions: int | None = None):
    """SQL EXCEPT: distinct rows of ``a`` absent from ``b``."""
    return _run("except", a, b, cols, num_partitions)
