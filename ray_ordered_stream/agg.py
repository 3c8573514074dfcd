"""Exchange-based grouped aggregation: the reusable form of the partial
pre-agg + one-exchange pattern this repo applies wherever Ray Data's
generic ``groupby().aggregate()`` is too heavy (its sort-based all-to-all
measured ~1.5-8 s of fixed overhead per call at 32 CPUs on this box).

Plan: each batch reduces to one row per group (pandas groupby — the
per-batch group count bounds what shuffles, never the row count), a
64-bit group-key hash routes the partials through ONE exchange, and each
partition merges its groups with a second vectorized groupby. ``mean``
carries (sum, count) through the merge and finalizes at the end, so
re-aggregation is exact.

Use Ray Data's groupby when you need its spilling sort for huge group
cardinalities per partition; use this when groups-per-batch is modest
(aggregation states fit in a partition's heap) — the usual analytics
shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .exchange import default_partitions, int_partition_codes, split_compact

_OPS = ("sum", "count", "min", "max", "mean")
# Moment-based statistics: carried through the exchange as raw power sums
# (n, Σx, Σx², and Σy, Σy², Σxy for the two-column ops) and finalized with
# the textbook formulas AFTER the merge — power sums re-aggregate exactly,
# so the result is partition-invariant whenever the sums are (integer-valued
# inputs make them bit-exact; see the oracle notes in pipelines/queries.py).
# Two-column ops take col = (x_col, y_col).
_MOMENT_OPS = (
    "var_pop", "var_samp", "stddev_pop", "stddev_samp",
    "covar_pop", "covar_samp", "corr",
)
_TWO_COL = ("covar_pop", "covar_samp", "corr")
# Positional aggregates (SQL max_by/min_by): col = (value_col, order_col);
# returns value_col at the extreme of order_col. Deterministic tie-break:
# among rows sharing the extreme order value, the MINIMUM value wins (and
# NULL order values lose to any non-NULL) — so the result is
# partition-invariant and an oracle can replay it with
# row_number() OVER (ORDER BY o DESC NULLS LAST, v ASC). The per-block
# champion rule (lexicographic extreme over (order, value)) is associative,
# so block champions merge to the global champion through the exchange.
_ARG_OPS = ("arg_max", "arg_min")


def _group_hash(df: pd.DataFrame, keys: list[str]) -> np.ndarray:
    """Deterministic u64 hash of the key tuple, vectorized (FNV-1a over
    the string form of each key column, mixed across columns)."""
    from .partitioning import hash_string_array

    h = np.full(len(df), np.uint64(0xCBF29CE484222325))
    with np.errstate(over="ignore"):
        for k in keys:
            # NULLs must hash identically whatever dtype the block carried
            # them in (object None -> "None", float NaN -> "nan"): route
            # every null through one sentinel so the null group never
            # splits across partitions.
            s = df[k].astype(str).where(~df[k].isna(), "\x00null")
            col = pa.array(s, pa.string())
            h = (h ^ hash_string_array(col)) * np.uint64(0x100000001B3)
    return h


def _arg_pick(
    df: pd.DataFrame, keys, alias: str, op: str, vcol: str, ocol: str
) -> pd.DataFrame:
    """One row per group: the (order, value) champion under the arg-op
    rule. Works identically on raw rows (partial) and on merged champion
    rows (merge) because the rule is associative."""
    cols = list(dict.fromkeys(keys + [vcol, ocol]))
    sub = df[cols].sort_values(
        [ocol] + ([vcol] if vcol != ocol else []),
        ascending=[op == "arg_min"] + ([True] if vcol != ocol else []),
        kind="stable",
        na_position="last",
    )
    sub = sub.groupby(keys, sort=False, dropna=False).head(1)
    out = sub[keys].copy()
    out[f"_a_{alias}"] = sub[vcol].values
    out[f"_o_{alias}"] = sub[ocol].values
    return out


def _partial(df: pd.DataFrame, keys, specs) -> pd.DataFrame:
    df = df
    tmp_cols: dict[str, pd.Series] = {}
    for alias, (col, op) in specs.items():
        if op in _MOMENT_OPS:
            x = col[0] if op in _TWO_COL else col
            tmp_cols[f"_xx_{alias}"] = df[x] * df[x]
            if op in _TWO_COL:
                y = col[1]
                tmp_cols[f"_yy_{alias}"] = df[y] * df[y]
                tmp_cols[f"_xy_{alias}"] = df[x] * df[y]
    if tmp_cols:
        df = df.assign(**tmp_cols)
    arg_frames = [
        _arg_pick(df, keys, alias, op, col[0], col[1])
        for alias, (col, op) in specs.items()
        if op in _ARG_OPS
    ]
    g = df.groupby(keys, sort=False, dropna=False)
    out = {}
    for alias, (col, op) in specs.items():
        if op in _ARG_OPS:
            continue
        if op == "count":
            out[f"_c_{alias}"] = g.size()
        elif op == "mean":
            out[f"_s_{alias}"] = g[col].sum()
            out[f"_c_{alias}"] = g[col].count()
        elif op == "sum":
            out[f"_s_{alias}"] = g[col].sum()
        elif op == "min":
            out[f"_m_{alias}"] = g[col].min()
        elif op == "max":
            out[f"_x_{alias}"] = g[col].max()
        elif op in _MOMENT_OPS:
            x = col[0] if op in _TWO_COL else col
            out[f"_c_{alias}"] = g[x].count()
            out[f"_s_{alias}"] = g[x].sum()
            out[f"_q_{alias}"] = g[f"_xx_{alias}"].sum()
            if op in _TWO_COL:
                y = col[1]
                out[f"_t_{alias}"] = g[y].sum()
                out[f"_u_{alias}"] = g[f"_yy_{alias}"].sum()
                out[f"_v_{alias}"] = g[f"_xy_{alias}"].sum()
    base = pd.DataFrame(out).reset_index() if out else None
    for af in arg_frames:
        base = af if base is None else base.merge(af, on=keys, how="inner")
    return base


def _merge(df: pd.DataFrame, keys, specs) -> pd.DataFrame:
    arg_frames = []
    for alias, (_col, op) in specs.items():
        if op in _ARG_OPS:
            af = _arg_pick(df, keys, alias, op, f"_a_{alias}", f"_o_{alias}")
            af = af.drop(columns=[f"_o_{alias}"]).rename(
                columns={f"_a_{alias}": alias}
            )
            arg_frames.append(af)
    g = df.groupby(keys, sort=False, dropna=False)
    out = {}
    for alias, (_col, op) in specs.items():
        if op in _ARG_OPS:
            continue
        if op == "count":
            out[alias] = g[f"_c_{alias}"].sum()
        elif op == "sum":
            out[alias] = g[f"_s_{alias}"].sum()
        elif op == "mean":
            out[alias] = g[f"_s_{alias}"].sum() / g[f"_c_{alias}"].sum()
        elif op == "min":
            out[alias] = g[f"_m_{alias}"].min()
        elif op == "max":
            out[alias] = g[f"_x_{alias}"].max()
        elif op in _MOMENT_OPS:
            n = g[f"_c_{alias}"].sum().astype("float64")
            sx = g[f"_s_{alias}"].sum().astype("float64")
            sxx = g[f"_q_{alias}"].sum().astype("float64")
            # the explicit computational formulas, evaluated in one fixed
            # operation order so an oracle spelling the same arithmetic
            # reproduces the result bit-for-bit when the sums are exact
            if op in ("var_pop", "stddev_pop"):
                v = (sxx - sx * sx / n) / n
                out[alias] = np.sqrt(v) if op == "stddev_pop" else v
            elif op in ("var_samp", "stddev_samp"):
                v = ((sxx - sx * sx / n) / (n - 1)).where(n > 1)
                out[alias] = np.sqrt(v) if op == "stddev_samp" else v
            else:
                sy = g[f"_t_{alias}"].sum().astype("float64")
                syy = g[f"_u_{alias}"].sum().astype("float64")
                sxy = g[f"_v_{alias}"].sum().astype("float64")
                cov = (sxy - sx * sy / n) / n
                if op == "covar_pop":
                    out[alias] = cov
                elif op == "covar_samp":
                    out[alias] = ((sxy - sx * sy / n) / (n - 1)).where(n > 1)
                else:  # corr
                    denom = np.sqrt((sxx - sx * sx / n) / n) * np.sqrt(
                        (syy - sy * sy / n) / n
                    )
                    out[alias] = (cov / denom).where(denom > 0)
    base = pd.DataFrame(out).reset_index() if out else None
    for af in arg_frames:
        base = af if base is None else base.merge(af, on=keys, how="inner")
    # keys first, then aliases in spec order, however the merges interleaved
    return base[keys + list(specs)]


def exchange_groupby(
    ds,
    keys: list[str] | str,
    aggs: dict[str, tuple[str | None, str]],
    num_partitions: int | None = None,
):
    """Grouped aggregation over the shared exchange.

    ``aggs``: alias -> (column, op) with op in {sum, count, min, max,
    mean}; column is ignored for ``count``. Returns a Dataset with the
    key columns plus one column per alias, types following pandas
    (sums/counts int64 for int inputs, mean float64).
    """
    import ray.data

    keys = [keys] if isinstance(keys, str) else list(keys)
    for alias, (c, op) in aggs.items():
        if op not in _OPS and op not in _MOMENT_OPS and op not in _ARG_OPS:
            raise ValueError(f"unsupported op {op!r} for {alias!r}")
        if op in _TWO_COL and (not isinstance(c, (tuple, list)) or len(c) != 2):
            raise ValueError(f"{op} needs col=(x_col, y_col) for {alias!r}")
        if op in _ARG_OPS and (not isinstance(c, (tuple, list)) or len(c) != 2):
            raise ValueError(
                f"{op} needs col=(value_col, order_col) for {alias!r}"
            )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            p = _partial(df, keys, aggs).iloc[0:0]
            # Keep the _gk column in the empty schema too: downstream
            # split/reduce placeholders slice empty partials and must see
            # the same columns as populated ones.
            p["_gk"] = pd.Series([], dtype=np.int64)
            return p
        p = _partial(df, keys, aggs)
        p["_gk"] = _group_hash(p, keys).view(np.int64)
        return p

    partials = ds.map_batches(partial, batch_format="pandas")

    # Fallback merged schema for the degenerate all-empty input (Ray
    # strips the schema from empty pandas blocks, so no shard may carry
    # columns at all). Key dtypes are unknowable then; null-typed keys +
    # op-appropriate agg dtypes keep the column set stable.
    fallback = pa.Table.from_pandas(
        pd.DataFrame(
            {
                **{k: pd.Series([], dtype=object) for k in keys},
                **{
                    a: pd.Series(
                        [],
                        dtype="int64"
                        if op == "count"
                        # arg value dtype is unknowable on empty input:
                        # null-typed, unifies losslessly if a sibling
                        # shard carries the real type
                        else (object if op in _ARG_OPS else "float64"),
                    )
                    for a, (_c, op) in aggs.items()
                },
            }
        ),
        preserve_index=False,
    )

    @ray.remote
    def reduce(fallback: pa.Table, *shards: pa.Table) -> pa.Table:
        real = [t for t in shards if t.num_rows]
        if not real:
            # Borrow the column layout (and true dtypes) from any
            # columned shard a sibling split produced.
            template = next((t for t in shards if t.num_columns), None)
            if template is None:
                return fallback
            tbl = template.slice(0, 0)
        else:
            # "default" promotion: identical to "none" except a null-typed
            # column (an all-NaN object frame somewhere upstream) unifies
            # losslessly with its real type instead of failing the concat.
            tbl = (
                pa.concat_tables(real, promote_options="default")
                if len(real) > 1
                else real[0]
            )
        df = tbl.to_pandas()
        if "_gk" in df.columns:
            df = df.drop(columns=["_gk"])
        # Merge even when empty so every partition emits the SAME merged
        # schema (keys + alias columns), not the partial (_s_/_c_) one.
        out = _merge(df, keys, aggs)
        return pa.Table.from_pandas(out, preserve_index=False)

    @ray.remote
    def split(P: int, *tbls: pa.Table) -> list[pa.Table]:
        real = [t for t in tbls if t.num_rows]
        if not real:
            base = next((t for t in tbls if t.num_columns), None)
            e = base.slice(0, 0) if base is not None else pa.table({})
            return [e] * P
        tbl = (
            pa.concat_tables(real, promote_options="default")
            if len(real) > 1
            else real[0]
        )
        gk = tbl["_gk"].to_numpy(zero_copy_only=False).astype(np.int64)
        return split_compact(tbl, int_partition_codes(gk, P), P)

    refs = list(partials.to_arrow_refs())
    P = num_partitions or default_partitions()
    if not refs:
        # Zero input blocks: still return the aggregated schema (keys +
        # alias columns), derived by running the partial+merge pipeline
        # over an empty frame of the input schema.
        sch = ds.schema()
        base = getattr(sch, "base_schema", None) if sch is not None else None
        if base is not None:
            empty_in = base.empty_table().to_pandas()
        else:
            cols = list(keys)
            for c, _op in aggs.values():
                if isinstance(c, (tuple, list)):
                    cols.extend(c)
                elif c:
                    cols.append(c)
            empty_in = pd.DataFrame({c: pd.Series([], dtype=object) for c in cols})
        out = _merge(
            partial(empty_in).drop(columns=["_gk"]), keys, aggs
        )
        return ray.data.from_pandas(out)
    if P == 1:
        # num_returns=1 would make Ray hand back a bare ref (not a list),
        # and a single partition needs no routing anyway: merge directly.
        return ray.data.from_arrow_refs([reduce.remote(fallback, *refs)])
    groups = [
        list(g)
        for g in np.array_split(
            np.array(refs, dtype=object), max(1, min(len(refs), 2 * P))
        )
        if len(g)
    ]
    split_groups = [split.options(num_returns=P).remote(P, *g) for g in groups]
    return ray.data.from_arrow_refs(
        [reduce.remote(fallback, *[sg[p] for sg in split_groups]) for p in range(P)]
    )


def grouped_string_agg(
    ds,
    key: str,
    val_col: str,
    order_by: list[str] | str,
    sep: str = ",",
    alias: str = "agg",
    count_alias: str | None = None,
    by_int: bool = False,
    num_partitions: int | None = None,
):
    """SQL ``string_agg(val, sep ORDER BY ...)`` per group: one hash
    exchange on ``key``, then each partition lexsorts its rows once and
    builds every group's joined string with an offset-built Arrow ListArray
    + ``binary_join`` — no per-group Python (the same shape as
    render.render_conversations, generalized). Output: one row per group
    with ``key``, ``alias`` (the joined string) and optionally
    ``count_alias`` (group size). NULL values stringify as SQL would skip
    them — pass a pre-filtered input if NULLs are possible. Per-partition
    output strings use 32-bit offsets (one Arrow chunk): size partitions so
    a partition's total joined bytes stay under 2 GiB — the usual Arrow
    chunk bound, met by raising ``num_partitions``."""
    import ray.data
    import pyarrow.compute as pc

    from .exchange import default_partitions, shard_refs

    order_by = [order_by] if isinstance(order_by, str) else list(order_by)
    P = max(2, num_partitions or default_partitions())

    @ray.remote
    def part(*shards: pa.Table) -> pa.Table:
        real = [t for t in shards if t.num_rows]
        if not real:
            # borrow the key dtype from any columned sibling shard so every
            # partition emits the SAME schema (an int64 key must not come
            # back string-typed from an empty partition)
            template = next((t for t in shards if t.column_names), None)
            key_type = (
                template.schema.field(key).type
                if template is not None
                else pa.string()
            )
            cols = {
                key: pa.array([], key_type),
                alias: pa.array([], pa.string()),
            }
            if count_alias:
                cols[count_alias] = pa.array([], pa.int64())
            return pa.table(cols)
        tbl = (
            pa.concat_tables(real, promote_options="none")
            if len(real) > 1
            else real[0]
        )
        df = tbl.to_pandas()
        keys_np = [df[c].to_numpy() for c in reversed(order_by)]
        codes = pd.factorize(df[key], use_na_sentinel=False)[0]
        order = np.lexsort([*keys_np, codes])
        df = df.iloc[order].reset_index(drop=True)
        codes = codes[order]
        n = len(df)
        boundary = np.empty(n, dtype=bool)
        boundary[0] = True
        boundary[1:] = codes[1:] != codes[:-1]
        firsts = np.flatnonzero(boundary)
        offsets = np.append(firsts, n).astype(np.int32)
        vals = pa.array(df[val_col].astype(str), pa.string())
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), vals)
        joined = pc.binary_join(lists, sep)
        cols = {
            key: pa.Array.from_pandas(df[key].iloc[firsts]),
            alias: joined,
        }
        if count_alias:
            cols[count_alias] = pa.array(np.diff(offsets).astype(np.int64))
        return pa.table(cols)

    groups = shard_refs(list(ds.to_arrow_refs()), key, P, by_int=by_int)
    out = [part.remote(*[g[p] for g in groups]) for p in range(P)]
    return ray.data.from_arrow_refs(out)


# ---------------------------------------------------------------------------
# Multi-dimensional aggregation: GROUPING SETS / ROLLUP / CUBE
# ---------------------------------------------------------------------------


def rollup_sets(keys: list[str]) -> list[list[str]]:
    """SQL ``ROLLUP(k1..kn)``: the n+1 prefixes, finest first."""
    return [list(keys[:i]) for i in range(len(keys), -1, -1)]


def cube_sets(keys: list[str]) -> list[list[str]]:
    """SQL ``CUBE(k1..kn)``: all 2^n subsets, finest first (subset order
    follows the grouping-id bit pattern ascending)."""
    n = len(keys)
    out = []
    for gid in range(1 << n):
        out.append([k for i, k in enumerate(keys) if not (gid >> (n - 1 - i)) & 1])
    return out


def grouping_sets(
    ds,
    keys: list[str],
    sets: list[list[str]],
    aggs: dict[str, tuple[str | None, str]],
    num_partitions: int | None = None,
    grouping_id_col: str = "grouping_id",
):
    """GROUPING SETS over the shared exchange (SQL ROLLUP/CUBE semantics,
    cf. Gray et al., "Data Cube", ICDE'96).

    ``keys`` fixes the grouping-id bit order (leftmost key = most
    significant bit, matching DuckDB's ``GROUPING_ID``); each entry of
    ``sets`` is a subset of ``keys``. Output: every key column (NULL where
    rolled up), ``grouping_id`` int64, one column per agg alias.

    Scale plan: the INPUT is aggregated exactly once — one partial pass +
    one exchange at the finest granularity (the union key), with ``mean``
    carried as (sum, count) so it stays re-aggregable. Every coarser set
    then re-aggregates the BASE result (group-cardinality rows, not input
    rows), so n grouping sets cost one full-data exchange plus n tiny
    ones — the classic cube optimization — and the per-set pieces stream
    through ``Dataset.union`` without materializing."""
    import functools

    import ray.data

    keys = list(keys)
    for s in sets:
        if not set(s) <= set(keys):
            raise ValueError(f"grouping set {s!r} not a subset of {keys!r}")
    for alias, (_c, op) in aggs.items():
        if op not in _OPS:
            raise ValueError(f"unsupported op {op!r} for {alias!r}")

    # Stage 1: one exchange at the union key, re-aggregable aliases.
    base_aggs: dict[str, tuple[str | None, str]] = {}
    for alias, (col, op) in aggs.items():
        if op == "mean":
            base_aggs[f"__s_{alias}"] = (col, "sum")
            base_aggs[f"__c_{alias}"] = (col, "count")
        else:
            base_aggs[alias] = (col, op)
    # Key types come from the INPUT schema: a base-result block whose key
    # column is all-NULL round-trips through pandas as float64, so the
    # base dataset's own unified schema may not even resolve. finalize
    # casts every block back to the input key type (all-NULL casts are
    # lossless), which also makes the cross-set union schema-stable.
    in_sch = ds.schema()
    raw = dict(zip(in_sch.names, in_sch.types))

    def _pa_type(t) -> pa.DataType:
        if isinstance(t, pa.DataType):
            return t
        try:  # numpy dtype from a PandasBlockSchema
            return pa.from_numpy_dtype(t)
        except (pa.ArrowNotImplementedError, TypeError):
            return pa.string()  # object dtype: strings in this engine

    key_types = {k: _pa_type(raw[k]) for k in keys}

    base = exchange_groupby(ds, keys, base_aggs, num_partitions)

    # Normalize key dtypes on every base block BEFORE the stage-2
    # exchanges: an all-NULL key block comes back float64 and would make
    # the stage-2 partial concat reject mixed string/double schemas.
    def _norm_keys(t: pa.Table) -> pa.Table:
        for k in keys:
            if t.schema.field(k).type != key_types[k]:
                t = t.set_column(
                    t.column_names.index(k), k, t[k].cast(key_types[k])
                )
        return t

    base = base.map_batches(_norm_keys, batch_format="pyarrow")

    def stage2_aggs() -> dict[str, tuple[str | None, str]]:
        out: dict[str, tuple[str | None, str]] = {}
        for alias, (_col, op) in aggs.items():
            if op == "mean":
                out[f"__s_{alias}"] = (f"__s_{alias}", "sum")
                out[f"__c_{alias}"] = (f"__c_{alias}", "sum")
            elif op in ("sum", "count"):
                out[alias] = (alias, "sum")
            else:  # min / max re-aggregate with themselves
                out[alias] = (alias, op)
        return out

    def finalize(s: list[str], gid: int):
        def fn(t: pa.Table) -> pa.Table:
            cols: dict[str, pa.Array] = {}
            n = t.num_rows
            for k in keys:
                if k in s:
                    cols[k] = t[k].cast(key_types[k])
                else:
                    cols[k] = pa.nulls(n, key_types[k])
            cols[grouping_id_col] = pa.array([gid] * n, pa.int64())
            import pyarrow.compute as pc

            for alias, (_col, op) in aggs.items():
                if op == "mean":
                    cols[alias] = pc.divide(
                        pc.cast(t[f"__s_{alias}"], pa.float64()),
                        pc.cast(t[f"__c_{alias}"], pa.float64()),
                    )
                else:
                    cols[alias] = t[alias]
            return pa.table(cols)

        return fn

    pieces = []
    for s in sets:
        gid = sum(
            1 << (len(keys) - 1 - i) for i, k in enumerate(keys) if k not in s
        )
        if s == keys:
            piece = base
        elif s:
            piece = exchange_groupby(base, list(s), stage2_aggs(), num_partitions)
        else:
            # Grand total: constant key, single partition, key dropped.
            tmp = base.map_batches(
                lambda df: df.assign(__all=np.int64(0)), batch_format="pandas"
            )
            piece = exchange_groupby(tmp, ["__all"], stage2_aggs(), 1)
            piece = piece.drop_columns(["__all"])
        pieces.append(piece.map_batches(finalize(list(s), gid), batch_format="pyarrow"))
    return functools.reduce(lambda a, b: a.union(b), pieces)


# ---------------------------------------------------------------------------
# Pivot (long -> wide) and unpivot (wide -> long)
# ---------------------------------------------------------------------------


def pivot_wider(
    ds,
    index: list[str] | str,
    pivot_col: str,
    aggs: dict[str, tuple[str | None, str]],
    values: list | None = None,
    num_partitions: int | None = None,
):
    """Pivot: one output row per ``index`` group, one column per
    (pivot value x agg alias), named ``{value}_{alias}`` — SQL conditional
    aggregation (``agg(col) FILTER (WHERE pivot = value)``).

    Scale plan: the input is aggregated ONCE at (index, pivot) grain via
    the shared exchange; each fully-merged cell then appears exactly once,
    so the wide reshape is a per-batch column scatter and the second
    exchange (at index grain, group-cardinality rows) merges singleton
    cells with ``min`` — which is identity on one value and NULL on none,
    matching FILTER-aggregate semantics without special-casing. ``count``
    cells merge with ``sum`` and backfill 0 (SQL count is never NULL);
    ``mean`` carries (sum, count) and divides at the end.

    ``values``: pass the pivot domain explicitly to skip the discovery
    pass (the right call at warehouse scale when the domain is known);
    ``None`` discovers it from the aggregated base (pivot-column-only
    scan of group-cardinality rows, never the raw input)."""
    import pyarrow.compute as pc

    index = [index] if isinstance(index, str) else list(index)

    base_aggs: dict[str, tuple[str | None, str]] = {}
    for alias, (col, op) in aggs.items():
        if op not in _OPS:
            raise ValueError(f"unsupported op {op!r} for {alias!r}")
        if op == "mean":
            base_aggs[f"__s_{alias}"] = (col, "sum")
            base_aggs[f"__c_{alias}"] = (col, "count")
        else:
            base_aggs[alias] = (col, op)
    base = exchange_groupby(ds, index + [pivot_col], base_aggs, num_partitions)

    if values is None:
        vals = sorted(
            base.map_batches(
                lambda df: df[[pivot_col]].drop_duplicates(),
                batch_format="pandas",
            )
            .to_pandas()[pivot_col]
            .dropna()
            .unique()
            .tolist()
        )
    else:
        vals = list(values)

    def widen(df: pd.DataFrame) -> pd.DataFrame:
        out = df[index].copy()
        for v in vals:
            m = df[pivot_col] == v
            # .astype(float64) everywhere: Series.where keeps int64 when the
            # mask is all-True, so without it a single-value block would emit
            # int cells while its siblings emit float — schema-unstable blocks.
            for alias, (_c, op) in aggs.items():
                if op == "mean":
                    out[f"__s_{v}_{alias}"] = (
                        df[f"__s_{alias}"].where(m).astype("float64")
                    )
                    out[f"__c_{v}_{alias}"] = (
                        df[f"__c_{alias}"].where(m).astype("float64")
                    )
                else:
                    out[f"{v}_{alias}"] = df[alias].where(m).astype("float64")
        return out

    wide = base.map_batches(widen, batch_format="pandas")

    out_aggs: dict[str, tuple[str | None, str]] = {}
    for v in vals:
        for alias, (_c, op) in aggs.items():
            if op == "mean":
                out_aggs[f"__s_{v}_{alias}"] = (f"__s_{v}_{alias}", "sum")
                out_aggs[f"__c_{v}_{alias}"] = (f"__c_{v}_{alias}", "sum")
            elif op == "count":
                out_aggs[f"{v}_{alias}"] = (f"{v}_{alias}", "sum")
            else:  # sum/min/max: the cell is a singleton -> min == identity,
                # and min over an empty cell is NULL (FILTER semantics)
                out_aggs[f"{v}_{alias}"] = (f"{v}_{alias}", "min")
    out = exchange_groupby(wide, index, out_aggs, num_partitions)

    def finish(t: pa.Table) -> pa.Table:
        cols: dict[str, pa.ChunkedArray | pa.Array] = {k: t[k] for k in index}
        for v in vals:
            for alias, (_c, op) in aggs.items():
                name = f"{v}_{alias}"
                if op == "mean":
                    cols[name] = pc.divide(
                        pc.cast(t[f"__s_{v}_{alias}"], pa.float64()),
                        pc.cast(t[f"__c_{v}_{alias}"], pa.float64()),
                    )
                elif op == "count":
                    cols[name] = pc.cast(
                        pc.coalesce(t[name], pa.scalar(0.0)), pa.int64()
                    )
                else:
                    cols[name] = t[name]
        return pa.table(cols)

    return out.map_batches(finish, batch_format="pyarrow")


def unpivot(
    ds,
    index: list[str] | str,
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
):
    """Unpivot (wide -> long, SQL UNPIVOT / pandas melt): pure per-batch
    reshape, no shuffle — every value column becomes ``len(batch)`` rows
    of (index..., variable, value). Values are cast to a common float64
    (SQL UNPIVOT requires a shared supertype too)."""
    index = [index] if isinstance(index, str) else list(index)

    def melt(df: pd.DataFrame) -> pd.DataFrame:
        out = df.melt(
            id_vars=index,
            value_vars=value_cols,
            var_name=var_name,
            value_name=value_name,
        )
        out[value_name] = out[value_name].astype("float64")
        return out

    return ds.map_batches(melt, batch_format="pandas")
