"""Stateful stream-stream join of role-partitioned turn streams.

Mandated by BASELINE.json north_rule (the reference pipeline contains no
generic join — SURVEY.md §2.5; this operator is owned by our engine design):
the `user` and `assistant` turn streams of each conversation are
co-partitioned on ``conv_id`` and each user turn is matched to the *next*
assistant turn (first assistant turn with a larger ``turn_idx``), optionally
bounded by an event-time window on ``ts``.

Batch implementation (closed input): bucket both sides by hash(conv_id) % B
(ONE shuffle, same key as every other stage — SURVEY.md §7.3), then a
vectorized ``pandas.merge_asof(by=conv_id, direction="forward")`` per bucket.
The streaming variant buffers both sides in the ordered-state actors and
emits on watermark (see ``stream.py``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .partitioning import key_partition_codes
from .schema import KEY, SEQ

JOIN_COLUMNS = [
    KEY,
    "user_turn_idx",
    "assistant_turn_idx",
    "user_text",
    "assistant_text",
    "lag_us",
]


def join_user_assistant(
    ds,
    key: str = KEY,
    seq: str = SEQ,
    left_role: str = "user",
    right_role: str = "assistant",
    within_us: int | None = None,
    num_buckets: int = 16,
):
    """Per-key forward as-of join of the two role streams.

    Returns a Dataset with ``JOIN_COLUMNS`` (inner join: user turns with no
    later assistant turn are dropped; with ``within_us`` also bounded by
    event time).
    """

    def add_bucket(t: pa.Table) -> pa.Table:
        b = key_partition_codes(t[key], num_buckets)
        return t.append_column("__bucket", pa.array(b, pa.int64()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["role"] == left_role]
        right = g[g["role"] == right_role]
        if left.empty or right.empty:
            return pd.DataFrame({c: pd.Series(dtype=_dtype(c)) for c in JOIN_COLUMNS})
        # merge_asof needs the `on` key sorted and strictly forward matching:
        # match on turn_idx with a +1 offset so "next" means strictly greater.
        lf = left[[key, seq, "text", "ts"]].rename(
            columns={seq: "user_turn_idx", "text": "user_text", "ts": "user_ts"}
        )
        rf = right[[key, seq, "text", "ts"]].rename(
            columns={seq: "assistant_turn_idx", "text": "assistant_text", "ts": "assistant_ts"}
        )
        lf["__on"] = lf["user_turn_idx"].astype("int64") + 1
        rf["__on"] = rf["assistant_turn_idx"].astype("int64")
        lf = lf.sort_values("__on", kind="stable")
        rf = rf.sort_values("__on", kind="stable")
        m = pd.merge_asof(lf, rf, on="__on", by=key, direction="forward")
        m = m.dropna(subset=["assistant_turn_idx"])
        m["assistant_turn_idx"] = m["assistant_turn_idx"].astype("int32")
        m["user_turn_idx"] = m["user_turn_idx"].astype("int32")
        m["lag_us"] = (
            m["assistant_ts"].astype("datetime64[us]").astype("int64")
            - m["user_ts"].astype("datetime64[us]").astype("int64")
        ).astype("int64")
        if within_us is not None:
            m = m[m["lag_us"] <= within_us]
        return m[JOIN_COLUMNS].reset_index(drop=True)

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")
    return bucketed.groupby("__bucket").map_groups(per_bucket, batch_format="pandas")


def _dtype(col: str):
    if col in (KEY, "user_text", "assistant_text"):
        return "object"
    if col in ("user_turn_idx", "assistant_turn_idx"):
        return "int32"
    return "int64"


# ---------------------------------------------------------------------------
# generic as-of / interval (range) joins
# ---------------------------------------------------------------------------


def _concat_df(shards) -> pd.DataFrame | None:
    """Concat shard tables to pandas; None only if NO shard carries a schema
    (the exchange preserves schemas on empty shards, so in practice this
    means an empty input dataset)."""
    withcols = [t for t in shards if t.num_rows or t.column_names]
    if not withcols:
        return None
    real = [t for t in withcols if t.num_rows]
    tbl = (
        pa.concat_tables(real, promote_options="none")
        if real
        else withcols[0].slice(0, 0)
    )
    return tbl.to_pandas()


def _ts_i64(s: pd.Series) -> np.ndarray:
    if np.issubdtype(s.dtype, np.datetime64):
        return s.astype("datetime64[us]").astype("int64").to_numpy()
    return s.astype("int64").to_numpy()


def asof_join(
    left,
    right,
    key: str,
    on: str,
    right_key: str | None = None,
    right_on: str | None = None,
    right_cols: list[str] | None = None,
    right_tiebreak: str | None = None,
    direction: str = "backward",
    by_int: bool = False,
    num_partitions: int | None = None,
):
    """Distributed as-of join: for every left row, the right row of the same
    key whose ``right_on`` is closest <= (backward) / >= (forward) the left
    row's ``on``. Inner join — left rows with no match are dropped.

    Scale shape: ONE hash exchange of both sides on the key
    (exchange.shard_refs — co-partitioned, each partition joins
    independently), then a vectorized ``pandas.merge_asof`` per partition;
    nothing materializes on the driver. ``right_tiebreak`` makes ties on
    (key, right_on) deterministic: the right side is deduped keep-last per
    (key, right_on) after a stable sort by (key, right_on, tiebreak).

    ``key`` / ``right_key`` may be equal-length lists (composite ``by``):
    the exchange then routes on one derived u64 tuple hash per side and
    ``merge_asof`` matches the real tuple (same contract as hash_join;
    ``by_int`` applies to single-column keys only).
    """
    import ray
    import ray.data

    from .exchange import shard_refs

    keys = [key] if isinstance(key, str) else list(key)
    if right_key is None:
        rks = list(keys)
    elif isinstance(right_key, str):
        rks = [right_key]
    else:
        rks = list(right_key)
    if len(rks) != len(keys):
        raise ValueError(
            f"right_key arity {len(rks)} != key arity {len(keys)}"
        )
    multi = len(keys) > 1
    key, rk = keys[0], rks[0]
    ro = right_on or on

    @ray.remote
    def join_part(n_left: int, *shards: pa.Table) -> pa.Table:
        ldf = _concat_df(shards[:n_left])
        rdf = _concat_df(shards[n_left:])
        if ldf is None or rdf is None:
            return pa.table({})
        if "_jk" in ldf.columns:
            ldf = ldf.drop(columns=["_jk"])
        if "_jk" in rdf.columns:
            rdf = rdf.drop(columns=["_jk"])
        if right_tiebreak is not None:
            rdf = rdf.sort_values(
                [*rks, ro, right_tiebreak], kind="stable"
            )
            rdf = rdf.drop_duplicates([*rks, ro], keep="last")
        keep = list(dict.fromkeys([ro, *(right_cols or rdf.columns)]))
        rdf = rdf[[*rks, *[c for c in keep if c not in rks]]]
        r_dtypes = {c: rdf[c].dtype for c in rdf.columns if c not in rks}
        if rks != keys:
            rdf = rdf.rename(columns=dict(zip(rks, keys)))
        # explicit match indicator: inferring "matched" from some right value
        # column being non-null silently drops matches whose value IS null
        # (and breaks when the right side carries no extra column at all)
        flag = "__asof_matched__"
        while flag in ldf.columns or flag in rdf.columns:
            flag += "_"
        rdf[flag] = True
        ldf = ldf.sort_values(on, kind="stable")
        rdf = rdf.sort_values(ro, kind="stable")
        m = pd.merge_asof(
            ldf, rdf, left_on=on, right_on=ro,
            by=keys if multi else key,
            direction=direction,
            allow_exact_matches=True,
            suffixes=("", "_r"),
        )
        m = m[m[flag].notna()].drop(columns=[flag])
        # merge_asof floats right int columns (NaN for misses); restore
        for c, dt in r_dtypes.items():
            cc = f"{c}_r" if f"{c}_r" in m.columns else c
            if cc in m.columns and m[cc].dtype != dt:
                m[cc] = m[cc].astype(dt)
        return pa.Table.from_pandas(m.reset_index(drop=True), preserve_index=False)

    P = num_partitions or _default_P()
    if multi:
        from .agg import _group_hash

        def _with_jk(cols):
            def f(df: pd.DataFrame) -> pd.DataFrame:
                df = df.copy()
                df["_jk"] = (
                    _group_hash(df, cols).view(np.int64)
                    if len(df)
                    else pd.Series([], dtype=np.int64)
                )
                return df

            return f

        left = left.map_batches(_with_jk(keys), batch_format="pandas")
        right = right.map_batches(_with_jk(rks), batch_format="pandas")
        l_groups = shard_refs(
            list(left.to_arrow_refs()), "_jk", P, by_int=True
        )
        r_groups = shard_refs(
            list(right.to_arrow_refs()), "_jk", P, by_int=True
        )
    else:
        l_groups = shard_refs(
            list(left.to_arrow_refs()), key, P, by_int=by_int
        )
        r_groups = shard_refs(
            list(right.to_arrow_refs()), rk, P, by_int=by_int
        )
    out = [
        join_part.remote(
            len(l_groups), *[g[p] for g in l_groups], *[g[p] for g in r_groups]
        )
        for p in range(P)
    ]
    return ray.data.from_arrow_refs(out)


def interval_join(
    left,
    right,
    key: str,
    left_on: str,
    right_on: str,
    lower_us: int,
    upper_us: int,
    value_col: str | None = None,
    mode: str = "pairs",
    by_int: bool = False,
    num_partitions: int | None = None,
):
    """Distributed interval (range) join: pair every left row with the right
    rows of the same key whose ``right_on`` lies in
    ``(left_on + lower_us, left_on + upper_us]`` (open below, closed above).

    ``mode="pairs"`` emits one row per (left, right) pair (right columns
    suffixed ``_r`` on collision); ``mode="agg"`` emits one row per LEFT row
    with ``n_matches`` and, when ``value_col`` is given, ``sum_<value_col>``
    — aggregated inside the partition, so a hot key's million matches never
    materialize as pairs.

    Scale shape: one hash exchange of both sides on the key; per partition
    the right side is sorted by (key, right_on) once, each left row's match
    range is found by two vectorized ``merge_asof`` rank lookups, and pair
    expansion is a numpy repeat/arange construction (no per-row Python).
    """
    import ray
    import ray.data

    from .exchange import shard_refs

    if mode not in ("pairs", "agg"):
        raise ValueError("mode must be 'pairs' or 'agg'")

    @ray.remote
    def part(n_left: int, *shards: pa.Table) -> pa.Table:
        ldf = _concat_df(shards[:n_left])
        rdf = _concat_df(shards[n_left:])
        if ldf is None:
            return pa.table({})
        lon = _ts_i64(ldf[left_on])
        if rdf is not None and len(rdf):
            rdf = rdf.sort_values([key, right_on], kind="stable").reset_index(drop=True)
            ron = _ts_i64(rdf[right_on])
            rank = pd.DataFrame(
                {key: rdf[key], "__on": ron, "__pos": np.arange(len(rdf), dtype=np.int64)}
            )
            # merge_asof needs the right `on` GLOBALLY sorted even with by=;
            # a stable sort keeps within-key position order intact
            rank = rank.sort_values("__on", kind="stable")

            def lookup(bounds: np.ndarray) -> np.ndarray:
                q = pd.DataFrame({key: ldf[key], "__b": bounds})
                srt = np.argsort(bounds, kind="stable")
                inv = np.empty(len(srt), dtype=np.int64)
                inv[srt] = np.arange(len(srt))
                m = pd.merge_asof(
                    q.iloc[srt], rank, left_on="__b", right_on="__on",
                    by=key, direction="backward", allow_exact_matches=True,
                )
                return m["__pos"].to_numpy()[inv]

            lo_m = lookup(lon + lower_us)
            hi_m = lookup(lon + upper_us)
            kf = rank.groupby(key, sort=False)["__pos"].min()
            key_first = ldf[key].map(kf).to_numpy(dtype=np.float64, na_value=np.nan)
            has_key = ~np.isnan(key_first)
            lo_x = np.where(
                np.isnan(lo_m), np.where(has_key, key_first, 1.0) - 1.0, lo_m
            )
            hi_x = np.where(np.isnan(hi_m) | ~has_key, lo_x, hi_m)
            lens = (hi_x - lo_x).astype(np.int64)
            np.maximum(lens, 0, out=lens)
        else:
            rdf, lens, lo_x = None, np.zeros(len(ldf), dtype=np.int64), None

        def pair_indices():
            li = np.repeat(np.arange(len(ldf)), lens)
            starts = np.zeros(len(ldf), dtype=np.int64)
            starts[1:] = np.cumsum(lens)[:-1]
            ri = (
                np.arange(int(lens.sum()), dtype=np.int64)
                - np.repeat(starts, lens)
                + np.repeat((lo_x + 1).astype(np.int64), lens)
            )
            return li, ri

        if mode == "agg":
            out = ldf.copy()
            out["n_matches"] = lens
            if value_col is not None:
                s = np.zeros(len(ldf))
                if rdf is not None and lens.sum():
                    li, ri = pair_indices()
                    s = np.bincount(
                        li, weights=rdf[value_col].to_numpy()[ri], minlength=len(ldf)
                    )
                out[f"sum_{value_col}"] = s
            return pa.Table.from_pandas(out, preserve_index=False)

        if rdf is None or not lens.sum():
            # schema-stable empty pairs table
            lp = ldf.iloc[:0]
            rp = (rdf.drop(columns=["__pos"], errors="ignore").iloc[:0]
                  if rdf is not None else pd.DataFrame())
            rp = rp.rename(
                columns={c: (f"{c}_r" if c in lp.columns else c) for c in rp.columns}
            )
            return pa.Table.from_pandas(
                pd.concat([lp, rp], axis=1), preserve_index=False
            )
        li, ri = pair_indices()
        lp = ldf.iloc[li].reset_index(drop=True)
        rp = rdf.iloc[ri].reset_index(drop=True)
        rp = rp.rename(
            columns={c: (f"{c}_r" if c in lp.columns else c) for c in rp.columns}
        )
        return pa.Table.from_pandas(pd.concat([lp, rp], axis=1), preserve_index=False)

    P = num_partitions or _default_P()
    l_groups = shard_refs(list(left.to_arrow_refs()), key, P, by_int=by_int)
    r_groups = shard_refs(list(right.to_arrow_refs()), key, P, by_int=by_int)
    out = [
        part.remote(
            len(l_groups), *[g[p] for g in l_groups], *[g[p] for g in r_groups]
        )
        for p in range(P)
    ]
    return ray.data.from_arrow_refs(out)


def hash_join(
    left,
    right,
    key: str,
    how: str = "inner",
    right_key: str | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    by_int: bool = False,
    num_partitions: int | None = None,
    bloom_prefilter: bool = False,
    bloom_bits: int = 1 << 23,
):
    """Distributed hash equi-join: ``inner``, ``left``, ``right``,
    ``outer`` (full outer), ``semi`` (left rows with a match, right columns
    not emitted) or ``anti`` (left rows with NO match).

    ``key`` / ``right_key`` may be lists of equal length (composite join
    keys): the exchange then routes on one derived u64 tuple hash per side
    and the per-partition join matches the REAL tuple — a hash collision
    only co-locates rows, never joins them. The tuple hash goes through
    each value's string form, so both sides' key columns must carry the
    same dtypes (an int64-vs-float64 "5" would route to different
    partitions). ``by_int`` / ``bloom_prefilter`` apply to single-column
    keys only.

    Output blocks ARE the hash partitions: every row of a join key lands in
    exactly one output block, so a following per-key aggregate can run as a
    plain per-block ``map_batches`` with NO second exchange (see
    queries.q_cust_orders_full_outer). Two pandas-semantics caveats, both
    matching the existing inner/left behavior: NULL join keys match each
    other (SQL joins drop them — filter NULL keys first for SQL parity),
    and integer columns that gain missing values through an outer merge
    come back float64.

    Scale shape: ONE co-partitioning hash exchange per side
    (exchange.shard_refs), then a vectorized per-partition join — pandas
    hash merge for inner/left, an ``isin`` membership mask for semi/anti.
    For semi/anti the right side is pre-projected to per-block DISTINCT
    keys BEFORE the exchange (a combiner: at most one row per (key, block)
    ships, so a 10^9-row right side with 10^6 keys shuffles ~10^6 rows per
    input block, not 10^9). Broadcast-join the right side yourself (ray.put
    + map_batches lookup, see queries.q_segment_order_stats) when it is
    small enough to fit every worker — this operator is for two BIG sides.

    (The reference pipeline has no generic join — SURVEY.md §2.5; this is
    engine-owned surface alongside asof_join / interval_join.)"""
    import ray
    import ray.data

    from .exchange import shard_refs

    if how not in ("inner", "left", "right", "outer", "semi", "anti"):
        raise ValueError(
            f"how must be inner|left|right|outer|semi|anti, got {how!r}"
        )
    # composite keys: key / right_key may be lists of equal length; the
    # exchange then routes on ONE derived u64 tuple hash per side (the
    # shared split takes a single column) and the per-partition join runs
    # on the real tuple — collisions only co-locate, never match.
    keys = [key] if isinstance(key, str) else list(key)
    if right_key is None:
        rks = list(keys)
    elif isinstance(right_key, str):
        rks = [right_key]
    else:
        rks = list(right_key)
    if len(rks) != len(keys):
        raise ValueError(
            f"right_key arity {len(rks)} != key arity {len(keys)}"
        )
    multi = len(keys) > 1
    key, rk = keys[0], rks[0]

    if how in ("semi", "anti"):

        def distinct_keys(t: pa.Table) -> pa.Table:
            return t.select(rks).group_by(rks).aggregate([])

        right = right.map_batches(distinct_keys, batch_format="pyarrow")
    elif right_cols is not None:
        right = right.select_columns(list(dict.fromkeys([*rks, *right_cols])))

    def _concat_tbl(shards):
        withcols = [t for t in shards if t.num_rows or t.column_names]
        if not withcols:
            return None
        real = [t for t in withcols if t.num_rows]
        return (
            pa.concat_tables(real, promote_options="none")
            if real
            else withcols[0].slice(0, 0)
        )

    @ray.remote
    def join_part(n_left: int, *shards: pa.Table) -> pa.Table:
        lt = _concat_tbl(shards[:n_left])
        rt = _concat_tbl(shards[n_left:])
        if lt is not None and "_jk" in lt.column_names:
            lt = lt.drop_columns(["_jk"])
        if rt is not None and "_jk" in rt.column_names:
            rt = rt.drop_columns(["_jk"])
        if lt is None and not (how in ("right", "outer") and rt is not None):
            return pa.table({})
        if how in ("semi", "anti"):
            # pure Arrow: schema survives even when every row filters out
            if rt is None or rt.num_rows == 0:
                return lt if how == "anti" else lt.slice(0, 0)
            import pyarrow.compute as pc

            if not multi:
                vals = rt[rk]
                if isinstance(vals, pa.ChunkedArray):
                    vals = vals.combine_chunks()
                mask = pc.is_in(lt[key], value_set=vals)
            else:
                # tuple membership: indicator merge against the distinct
                # right tuples (exact — the routing hash never decides)
                ldf = lt.select(keys).to_pandas()
                # per-block distinct still leaves cross-block duplicate
                # tuples in the concat: dedupe or the left merge fans out
                rdf = (
                    rt.to_pandas()
                    .rename(columns=dict(zip(rks, keys)))
                    .drop_duplicates()
                )
                rdf["_hit"] = True
                mm = ldf.merge(rdf, on=keys, how="left")
                mask = pa.array(mm["_hit"].notna().to_numpy())
            if how == "anti":
                mask = pc.invert(mask)
            return lt.filter(mask)
        rdf = rt.to_pandas() if rt is not None else None
        if rdf is not None and rks != keys:
            rdf = rdf.rename(columns=dict(zip(rks, keys)))
        ldf = (
            lt.to_pandas()
            if lt is not None
            else pd.DataFrame(
                {k: pd.Series([], dtype=rdf[k].dtype) for k in keys}
            )
        )
        if rdf is None:
            rdf = pd.DataFrame(
                {k: pd.Series([], dtype=ldf[k].dtype) for k in keys}
            )
        m = ldf.merge(rdf, on=keys, how=how, suffixes=("", suffix))
        out = pa.Table.from_pandas(m.reset_index(drop=True), preserve_index=False)
        # empty object columns come back as null type; restore from the
        # shard schemas so downstream schema unification stays exact
        want = {}
        for sch in (
            ([lt.schema] if lt is not None else [])
            + ([rt.schema] if rt is not None else [])
        ):
            for f in sch:
                want.setdefault(f.name, f.type)
        for i, f in enumerate(out.schema):
            if pa.types.is_null(f.type):
                base = f.name[: -len(suffix)] if f.name.endswith(suffix) else f.name
                tgt = want.get(f.name) or want.get(base)
                if tgt is not None:
                    out = out.set_column(i, f.name, out[f.name].cast(tgt))
        return out

    P = num_partitions or _default_P()

    if multi:
        if bloom_prefilter:
            raise ValueError(
                "bloom_prefilter supports single-column keys only"
            )
        from .agg import _group_hash

        def _with_jk(cols):
            def f(df: pd.DataFrame) -> pd.DataFrame:
                df = df.copy()
                df["_jk"] = (
                    _group_hash(df, cols).view(np.int64)
                    if len(df)
                    else pd.Series([], dtype=np.int64)
                )
                return df

            return f

        left = left.map_batches(_with_jk(keys), batch_format="pandas")
        right = right.map_batches(_with_jk(rks), batch_format="pandas")
        l_groups = shard_refs(
            list(left.to_arrow_refs()), "_jk", P, by_int=True
        )
        r_groups = shard_refs(
            list(right.to_arrow_refs()), "_jk", P, by_int=True
        )
        out = [
            join_part.remote(
                len(l_groups),
                *[g[p] for g in l_groups],
                *[g[p] for g in r_groups],
            )
            for p in range(P)
        ]
        return ray.data.from_arrow_refs(out)

    r_refs = list(right.to_arrow_refs())

    if bloom_prefilter and how == "semi":
        # drop definite-non-matches from the big side BEFORE the exchange:
        # a fixed-size OR-merged Bloom of the (already distinct-projected)
        # right keys broadcasts once; false positives still shuffle and
        # the exact is_in inside join_part removes them, so the result is
        # identical to the plain semi join.
        from .functions.bloom import build_bloom_from_refs

        bloom_ref = ray.put(build_bloom_from_refs(r_refs, rk, bloom_bits))

        def prefilter(t: pa.Table) -> pa.Table:
            if not t.num_rows:
                return t
            b = ray.get(bloom_ref)
            return t.filter(pa.array(b.maybe_contains(t[key])))

        left = left.map_batches(prefilter, batch_format="pyarrow")
    elif bloom_prefilter:
        raise ValueError("bloom_prefilter is only valid for how='semi'")

    l_groups = shard_refs(list(left.to_arrow_refs()), key, P, by_int=by_int)
    r_groups = shard_refs(r_refs, rk, P, by_int=by_int)
    out = [
        join_part.remote(
            len(l_groups), *[g[p] for g in l_groups], *[g[p] for g in r_groups]
        )
        for p in range(P)
    ]
    return ray.data.from_arrow_refs(out)


def _default_P() -> int:
    from .exchange import default_partitions

    return default_partitions()


def broadcast_join(
    left,
    right,
    key: str,
    right_key: str | None = None,
    right_cols: list[str] | None = None,
    how: str = "inner",
    suffix: str = "_r",
):
    """Broadcast hash join for a SMALL right side: the right table is
    collected once, ``ray.put`` once, and every left batch probes it with
    a vectorized pandas merge — NO exchange, no repartition, the left
    side streams through untouched. This is the first-class form of the
    ad-hoc ``ray.put`` + ``map_batches`` lookup several queries hand-roll
    (and the shape the 100-TB guidance mandates for dim-table joins:
    ``hash_join`` is for two BIG sides).

    ``how``: "inner" or "left" (left keeps unmatched rows with nulls).
    The right side must fit comfortably in every worker's heap — callers
    own that judgement; a guard raises above ~50M right rows."""
    import pandas as pd_
    import ray

    rk = right_key or key
    if right_cols is not None:
        cols = list(dict.fromkeys([rk] + right_cols))
        right = right.select_columns(cols)
    rt = right.to_pandas()
    if len(rt) > 50_000_000:
        raise ValueError(
            f"broadcast side has {len(rt)} rows; use hash_join for big-big"
        )
    rref = ray.put(rt)

    class Probe:
        """Task-pool kernel: the broadcast table ref is resolved once per
        task process via ray.get's local-object fast path (zero-copy from
        the plasma store, shared across tasks on a node)."""

        def __init__(self, r):
            self.r = r
            self.rt = None

        def __call__(self, b: pd_.DataFrame) -> pd_.DataFrame:
            if self.rt is None:
                self.rt = ray.get(self.r)
            return b.merge(
                self.rt,
                how=how,
                left_on=key,
                right_on=rk,
                suffixes=("", suffix),
            )

    return left.map_batches(Probe(rref), batch_format="pandas")


def packed_key(ds, cols: list[str], alias: str = "_key", sep: str = "\x1f"):
    """Append a single string column packing a composite key tuple —
    the documented bridge for the remaining single-key operators
    (interval_join, grouped_topk, grouped_string_agg): NULL components
    fold to one sentinel so a NULL tuple never splits across partitions,
    components join on an unlikely separator (US control char by
    default). hash_join / asof_join / window_functions / exchange_groupby
    take key lists natively and don't need this."""

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        parts = [
            df[c].astype(str).where(~df[c].isna(), "\x00null") for c in cols
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out + sep + p
        df[alias] = out
        return df

    return ds.map_batches(pack, batch_format="pandas")
