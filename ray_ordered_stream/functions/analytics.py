"""Distributed SQL window functions: ROW_NUMBER / RANK / LAG / LEAD and
cumulative SUM / MAX / MIN / COUNT over ``PARTITION BY key ORDER BY cols``.

Scale shape: ONE hash exchange on the partition key (the same shared
split every keyed operator here uses), then each output partition sorts
its rows once (np.lexsort over (order cols, key)) and evaluates every
requested function vectorized against the group boundaries — pandas'
C-level grouped cumsum/cummax/shift, numpy arange ranks. No per-group
Python, no global sort: a window function only ever needs its own
partition's rows, so the exchange is the entire data movement.

Frames are the cumulative default (UNBOUNDED PRECEDING .. CURRENT ROW);
lag/lead are within-group with NULL fill at the edges, matching the SQL
defaults the oracle mirrors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_FNS = (
    "row_number", "rank", "lag", "lead", "cumsum", "cummax", "cummin",
    "cumcount", "ntile", "percent_rank", "session_id", "first_value",
    "last_value", "roll_sum", "roll_min", "roll_max", "roll_count",
    "roll_mean", "dense_rank", "cume_dist", "range_sum", "range_min",
    "range_max", "range_count", "range_mean",
)
_RANGE_FNS = ("range_sum", "range_min", "range_max", "range_count",
              "range_mean")


def window_functions(
    ds,
    part_key: str,
    order_by: list[str] | str,
    specs: dict[str, tuple],
    by_int: bool = False,
    num_partitions: int | None = None,
):
    """Append window-function columns to ``ds``.

    ``part_key`` may be one column or a list (composite ``PARTITION BY``):
    a composite key routes the exchange on one derived u64 tuple hash and
    factorizes the real tuple per partition — same single-exchange shape.

    ``specs``: alias -> (fn,) / (fn, col) / (fn, col, offset):
      ("row_number",)        1-based position in the group's order
      ("rank",)              competition rank over the order_by tuple
      ("lag", col[, n])      value of col n rows earlier in the group
      ("lead", col[, n])     value of col n rows later in the group
      ("cumsum", col)        running sum, UNBOUNDED PRECEDING..CURRENT ROW
      ("cummax", col) / ("cummin", col)
      ("cumcount",)          running count (== row_number, int64)
      ("ntile", k)           k near-equal buckets in order (SQL NTILE)
      ("percent_rank",)      (rank - 1) / (group_size - 1), 0.0 singleton
      ("first_value", col) / ("last_value", col)  group's first/last col
                             in order (full-group frame for last_value)
      ("session_id", col, gap) 1-based session number per group: a new
                             session starts when col - previous col > gap
                             (gap in col's own units) — gap-based
                             sessionization as a window function
      ("roll_sum", col, k) / ("roll_min", col, k) / ("roll_max", col, k)
                             / ("roll_mean", col, k): sliding ROWS frame
                             aggregate over the k-row window ending at the
                             current row (SQL ROWS BETWEEN k-1 PRECEDING
                             AND CURRENT ROW), clipped at the group start.
                             roll_sum over int64 uses exact cumsum
                             differences; roll_mean = roll_sum / frame size
                             in float64.
      ("roll_count", k)      rows in that same frame (int64)
      ("dense_rank",)        distinct order_by tuples seen so far (1-based)
      ("cume_dist",)         SQL CUME_DIST: rows <= current peer group's
                             last row, / group size (float64)
      ("range_sum", col, d) / ("range_min", col, d) / ("range_max", col, d)
                             / ("range_mean", col, d): SQL RANGE frame —
                             aggregate of col over the group's rows whose
                             ORDER-BY value lies in [cur - d, cur]
                             (``RANGE BETWEEN d PRECEDING AND CURRENT
                             ROW``, peers INCLUDED like SQL). The frame
                             column is ``order_by[0]`` and must be a
                             non-null datetime; ``d`` is anything
                             ``pd.Timedelta`` accepts ("1h", Timedelta).
                             Evaluated with pandas' C-level time rolling at
                             each peer-run's LAST row, broadcast to peers.
                             range_sum over int64 is exact below 2^53.
      ("range_count", d)     rows in that same RANGE frame (int64)

    Output row order is unspecified (hash-partitioned), as everywhere
    else in the engine — consumers sort or aggregate.
    """
    import ray
    import ray.data

    from ..exchange import default_partitions, shard_refs

    order_by = [order_by] if isinstance(order_by, str) else list(order_by)
    pkeys = [part_key] if isinstance(part_key, str) else list(part_key)
    for alias, spec in specs.items():
        if spec[0] not in _FNS:
            raise ValueError(f"unsupported window fn {spec[0]!r} for {alias!r}")
        if (
            spec[0] in _RANGE_FNS
            and spec[0] != "range_count"
            and spec[1] == order_by[0]
        ):
            raise ValueError(
                f"{spec[0]} cannot aggregate the frame column "
                f"{order_by[0]!r} (pandas excludes the rolling `on` column)"
            )

    # the shared exchange needs >= 2 output partitions (num_returns=1
    # would return the shard list itself); P=1 still computes correctly
    # through 2 partitions, one of which may simply be empty
    P = max(2, num_partitions or default_partitions())

    @ray.remote
    def part(*shards: pa.Table) -> pa.Table:
        real = [t for t in shards if t.num_rows]
        if not real:
            for t in shards:
                if t.column_names:
                    base = t.slice(0, 0).to_pandas()
                    if "_wkey" in base.columns:
                        base = base.drop(columns=["_wkey"])
                    for alias, spec in specs.items():
                        fn = spec[0]
                        if fn in ("row_number", "rank", "cumcount", "ntile",
                                  "session_id", "roll_count", "dense_rank",
                                  "range_count"):
                            dt = "int64"
                        elif fn in ("percent_rank", "roll_mean", "cume_dist",
                                    "range_mean"):
                            dt = "float64"
                        elif fn in ("range_sum", "range_min", "range_max"):
                            dt = (
                                "int64"
                                if np.issubdtype(
                                    base[spec[1]].dtype, np.integer
                                )
                                else "float64"
                            )
                        elif fn in ("cumsum", "cummax", "cummin",
                                    "first_value", "last_value", "roll_sum",
                                    "roll_min", "roll_max"):
                            dt = base[spec[1]].dtype  # pandas keeps it
                        else:  # lag/lead: shift makes numeric -> float64
                            src = base[spec[1]].dtype
                            dt = (
                                "float64"
                                if np.issubdtype(src, np.number)
                                else src
                            )
                        base[alias] = pd.Series([], dtype=dt)
                    return pa.Table.from_pandas(base, preserve_index=False)
            return pa.table({})
        tbl = (
            pa.concat_tables(real, promote_options="none")
            if len(real) > 1
            else real[0]
        )
        df = tbl.to_pandas()
        if "_wkey" in df.columns:
            df = df.drop(columns=["_wkey"])
        # one sort: order cols minor-to-major, partition key(s) major
        keys = [df[c].to_numpy() for c in reversed(order_by)]
        if len(pkeys) == 1:
            codes = pd.factorize(df[pkeys[0]], use_na_sentinel=False)[0]
        else:
            # composite partition key: one joint factorize over the tuple
            codes = (
                pd.MultiIndex.from_frame(df[pkeys])
                .factorize(use_na_sentinel=False)[0]
            )
        order = np.lexsort([*keys, codes])
        df = df.iloc[order].reset_index(drop=True)
        codes = codes[order]
        n = len(df)
        boundary = np.empty(n, dtype=bool)
        boundary[0] = True
        boundary[1:] = codes[1:] != codes[:-1]
        firsts = np.flatnonzero(boundary)
        first_of = np.repeat(firsts, np.diff(np.append(firsts, n)))
        pos = np.arange(n) - first_of  # 0-based within group
        gid = np.cumsum(boundary) - 1
        sizes = np.diff(np.append(firsts, n))
        size_of = np.repeat(sizes, sizes)  # group size at every row
        g = df.groupby(gid, sort=False)
        for alias, spec in specs.items():
            fn = spec[0]
            if fn in ("row_number", "cumcount"):
                df[alias] = (pos + 1).astype(np.int64)
            elif fn == "rank":
                # competition rank: first index of this order_by tuple run
                tie = np.zeros(n, dtype=bool)
                tie[0] = True
                tie[1:] = boundary[1:]
                for c in order_by:
                    v = df[c].to_numpy()
                    tie[1:] |= v[1:] != v[:-1]
                run_first = np.repeat(
                    np.flatnonzero(tie),
                    np.diff(np.append(np.flatnonzero(tie), n)),
                )
                df[alias] = (run_first - first_of + 1).astype(np.int64)
            elif fn in ("lag", "lead"):
                col = spec[1]
                k = int(spec[2]) if len(spec) > 2 else 1
                df[alias] = g[col].shift(k if fn == "lag" else -k)
            elif fn == "cumsum":
                df[alias] = g[spec[1]].cumsum()
            elif fn == "cummax":
                df[alias] = g[spec[1]].cummax()
            elif fn == "cummin":
                df[alias] = g[spec[1]].cummin()
            elif fn == "ntile":
                k = int(spec[1])
                # SQL NTILE: first (size % k) buckets get ceil(size/k) rows
                q, r = size_of // k, size_of % k
                big = r * (q + 1)
                df[alias] = np.where(
                    pos < big, pos // np.maximum(q + 1, 1),
                    np.where(q > 0, r + (pos - big) // np.maximum(q, 1), pos),
                ).astype(np.int64) + 1
            elif fn in ("first_value", "last_value"):
                df[alias] = g[spec[1]].transform(
                    "first" if fn == "first_value" else "last"
                )
            elif fn == "session_id":
                col, gap = spec[1], spec[2]
                v = df[col].to_numpy()
                if np.issubdtype(v.dtype, np.datetime64):
                    v = v.astype("datetime64[us]").astype(np.int64)
                brk = np.zeros(n, dtype=np.int64)
                brk[0] = 1
                brk[1:] = ((v[1:] - v[:-1]) > gap).astype(np.int64)
                brk[boundary] = 1  # every group restarts at session 1
                cs = np.cumsum(brk)
                # subtract the running total just before each group start
                base = np.repeat(cs[firsts] - 1, sizes)
                df[alias] = cs - base
            elif fn == "roll_count":
                k = int(spec[1])
                start = np.maximum(first_of, np.arange(n) - k + 1)
                df[alias] = (np.arange(n) - start + 1).astype(np.int64)
            elif fn in ("roll_sum", "roll_mean"):
                col, k = spec[1], int(spec[2])
                idx = np.arange(n)
                start = np.maximum(first_of, idx - k + 1)
                v = df[col].to_numpy()
                cs = np.cumsum(v)
                prev = np.zeros_like(cs)
                m = start > 0
                prev[m] = cs[start[m] - 1]
                s = cs - prev
                if fn == "roll_mean":
                    df[alias] = s.astype(np.float64) / (idx - start + 1)
                else:
                    df[alias] = s
            elif fn in ("roll_min", "roll_max"):
                col, k = spec[1], int(spec[2])
                v = df[col].to_numpy()
                out_v = v.copy()
                idx = np.arange(n)
                pick = np.minimum if fn == "roll_min" else np.maximum
                for j in range(1, k):
                    w = idx - j >= first_of  # j-back row is in-group
                    w[:j] = False
                    if not w.any():
                        break
                    cand = np.empty_like(v)
                    cand[j:] = v[:-j]
                    out_v[w] = pick(out_v[w], cand[w])
                df[alias] = out_v
            elif fn == "dense_rank":
                tie = np.zeros(n, dtype=bool)
                tie[0] = True
                tie[1:] = boundary[1:]
                for c in order_by:
                    v = df[c].to_numpy()
                    tie[1:] |= v[1:] != v[:-1]
                cum = np.cumsum(tie)
                base = np.repeat(cum[firsts] - 1, sizes)
                df[alias] = (cum - base).astype(np.int64)
            elif fn == "cume_dist":
                tie = np.zeros(n, dtype=bool)
                tie[0] = True
                tie[1:] = boundary[1:]
                for c in order_by:
                    v = df[c].to_numpy()
                    tie[1:] |= v[1:] != v[:-1]
                run_starts = np.flatnonzero(tie)
                run_lens = np.diff(np.append(run_starts, n))
                run_last = np.repeat(run_starts + run_lens - 1, run_lens)
                df[alias] = (run_last - first_of + 1).astype(
                    np.float64
                ) / size_of.astype(np.float64)
            elif fn in _RANGE_FNS:
                tcol = order_by[0]
                if fn == "range_count":
                    col, d = None, spec[1]
                else:
                    col, d = spec[1], spec[2]
                delta = pd.Timedelta(d)
                # SQL peers: rows sharing the FRAME column value see the
                # frame of the peer run's LAST row
                tv = df[tcol].to_numpy()
                tie = np.zeros(n, dtype=bool)
                tie[0] = True
                tie[1:] = boundary[1:] | (tv[1:] != tv[:-1])
                run_starts = np.flatnonzero(tie)
                run_lens = np.diff(np.append(run_starts, n))
                run_last = np.repeat(run_starts + run_lens - 1, run_lens)
                cols = [tcol] if col is None or col == tcol else [tcol, col]
                sub = df[cols].copy()
                if fn == "range_count":
                    # the `on` column is excluded from rolling aggregation:
                    # count over a ones column instead
                    sub["_ones"] = np.int64(1)
                roll = sub.groupby(gid, sort=False).rolling(
                    window=delta, on=tcol, closed="both"
                )
                if fn == "range_count":
                    out = roll["_ones"].count().to_numpy()[run_last]
                    df[alias] = out.astype(np.int64)
                elif fn == "range_mean":
                    # sum/count division (NOT pandas' online rolling mean)
                    # so the double matches an oracle's avg = sum/count
                    s = roll[col].sum().to_numpy()[run_last]
                    c = roll[col].count().to_numpy()[run_last]
                    df[alias] = s / c
                else:
                    out = getattr(roll[col], fn[len("range_"):])()
                    out = out.to_numpy()[run_last]
                    df[alias] = (
                        out.astype(np.int64)
                        if np.issubdtype(df[col].dtype, np.integer)
                        else out
                    )
            elif fn == "percent_rank":
                tie = np.zeros(n, dtype=bool)
                tie[0] = True
                tie[1:] = boundary[1:]
                for c in order_by:
                    v = df[c].to_numpy()
                    tie[1:] |= v[1:] != v[:-1]
                run_first = np.repeat(
                    np.flatnonzero(tie),
                    np.diff(np.append(np.flatnonzero(tie), n)),
                )
                rk = (run_first - first_of).astype(np.float64)
                denom = np.maximum(size_of - 1, 1).astype(np.float64)
                df[alias] = np.where(size_of > 1, rk / denom, 0.0)
        return pa.Table.from_pandas(df, preserve_index=False)

    if len(pkeys) == 1:
        groups = shard_refs(
            list(ds.to_arrow_refs()), pkeys[0], P, by_int=by_int
        )
    else:
        # composite PARTITION BY: route on one derived u64 tuple hash (the
        # shared exchange splits on a single column), recomputed nowhere
        # else — part() drops it and factorizes the real key tuple
        from ..agg import _group_hash

        def add_wkey(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["_wkey"] = (
                _group_hash(df, pkeys).view(np.int64)
                if len(df)
                else pd.Series([], dtype=np.int64)
            )
            return df

        keyed = ds.map_batches(add_wkey, batch_format="pandas")
        groups = shard_refs(
            list(keyed.to_arrow_refs()), "_wkey", P, by_int=True
        )
    out = [part.remote(*[grp[p] for grp in groups]) for p in range(P)]
    return ray.data.from_arrow_refs(out)


def grouped_entropy(
    ds,
    key: str,
    cat: str,
    round_to: int = 6,
    by_int: bool = False,
    num_partitions: int | None = None,
):
    """Shannon entropy of the ``cat`` distribution per ``key`` (label /
    source diversity — a standard curation audit). Two-exchange shape:
    an exact (key, cat)-grain count (the combiner: only distinct
    combinations shuffle), then a key-hash exchange co-locates each
    key's category rows for one vectorized per-partition finish
    ``H = -sum(p * ln(p))``, terms summed in (key, cat) order.

    Entropy is rounded to ``round_to`` dp (libm ln + a tiny
    order-dependent tail, same convention as the zipf/percentile rows);
    the integer columns are exact. Returns (key, n_events, n_cats,
    entropy)."""
    import ray
    import ray.data

    from ..agg import exchange_groupby
    from ..exchange import default_partitions, shard_refs

    counts = exchange_groupby(
        ds, [key, cat], {"_cnt": (None, "count")},
        num_partitions=num_partitions,
    )
    P = max(2, num_partitions or default_partitions())

    @ray.remote
    def part(*shards: pa.Table) -> pa.Table:
        real = [t for t in shards if t.num_rows]
        if not real:
            for t in shards:
                if t.column_names:
                    base = t.slice(0, 0).to_pandas()[[key]]
                    base["n_events"] = pd.Series([], dtype="int64")
                    base["n_cats"] = pd.Series([], dtype="int64")
                    base["entropy"] = pd.Series([], dtype="float64")
                    return pa.Table.from_pandas(base, preserve_index=False)
            return pa.table({})
        tbl = (
            pa.concat_tables(real, promote_options="none")
            if len(real) > 1
            else real[0]
        )
        df = tbl.to_pandas().sort_values([key, cat], kind="stable")
        g = df.groupby(key, sort=False, dropna=False)
        n = g["_cnt"].transform("sum").to_numpy(np.float64)
        p = df["_cnt"].to_numpy(np.float64) / n
        df = df.assign(_t=p * np.log(p))
        out = pd.DataFrame(
            {
                "n_events": g["_cnt"].sum().astype("int64"),
                "n_cats": g.size().astype("int64"),
                "entropy": np.round(
                    -df.groupby(key, sort=False, dropna=False)["_t"].sum(),
                    round_to,
                ),
            }
        ).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    groups = shard_refs(list(counts.to_arrow_refs()), key, P, by_int=by_int)
    refs = [part.remote(*[g[p] for g in groups]) for p in range(P)]
    return ray.data.from_arrow_refs(refs)


def resample_fill_counts(
    ds,
    key: str,
    ts_col: str,
    unit_us: int = 3_600_000_000,
    by_int: bool = False,
    num_partitions: int | None = None,
):
    """Time-series gap filling: per key, one row for EVERY bucket between
    that key's first and last event (``bucket = ts_us // unit_us``,
    default hourly), with n = 0 where the stream was silent — the
    row-GENERATING resample a dashboard/feature pipeline needs.

    Scale shape: per-block (key, bucket) count partials collapse through
    one exchange (the combiner bounds the shuffle at distinct
    (key, bucket) pairs, never events); a key-hash exchange then
    co-locates each key's buckets and the fill is one vectorized
    repeat/arange construction + a C-level merge per partition. Output
    rows are bounded by Σ per-key spans — the caller owns that bound
    (a key active for years at second granularity generates years of
    seconds). Returns (key, bucket, n) with bucket int64.
    """
    import ray
    import ray.data

    from ..agg import exchange_groupby
    from ..exchange import default_partitions, shard_refs

    def bucketize(t: pa.Table) -> pa.Table:
        ts = (
            t[ts_col].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        out = pd.DataFrame(
            {key: t[key].to_numpy(zero_copy_only=False),
             "bucket": ts // unit_us}
        )
        g = out.groupby([key, "bucket"], sort=False).size().rename("n")
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    grain = exchange_groupby(
        ds.map_batches(bucketize, batch_format="pyarrow"),
        [key, "bucket"],
        {"n": ("n", "sum")},
        num_partitions=num_partitions,
    )

    P = max(2, num_partitions or default_partitions())

    @ray.remote
    def fill(*shards: pa.Table) -> pa.Table:
        real = [t for t in shards if t.num_rows]
        if not real:
            for t in shards:
                if t.column_names:
                    base = t.slice(0, 0).to_pandas()
                    return pa.Table.from_pandas(
                        base, preserve_index=False
                    )
            return pa.table({})
        tbl = (
            pa.concat_tables(real, promote_options="none")
            if len(real) > 1
            else real[0]
        )
        df = tbl.to_pandas().sort_values([key, "bucket"], kind="stable")
        k = df[key].to_numpy()
        b = df["bucket"].to_numpy(np.int64)
        n = len(df)
        first = np.zeros(n, dtype=bool)
        first[0] = True
        first[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], n) - 1
        h0, h1 = b[starts], b[ends]
        sizes = h1 - h0 + 1
        total = int(sizes.sum())
        offs = np.zeros(len(sizes), dtype=np.int64)
        offs[1:] = np.cumsum(sizes)[:-1]
        buckets = (
            np.arange(total, dtype=np.int64)
            - np.repeat(offs, sizes)
            + np.repeat(h0, sizes)
        )
        keys_rep = np.repeat(k[starts], sizes)
        filled = pd.DataFrame({key: keys_rep, "bucket": buckets})
        out = filled.merge(df, on=[key, "bucket"], how="left")
        out["n"] = out["n"].fillna(0).astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    groups = shard_refs(list(grain.to_arrow_refs()), key, P, by_int=by_int)
    refs = [fill.remote(*[g[p] for g in groups]) for p in range(P)]
    return ray.data.from_arrow_refs(refs)
