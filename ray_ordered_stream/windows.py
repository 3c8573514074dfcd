"""Event-time windows over the transcript stream (tumbling / sliding /
session).

Mandated by BASELINE.json north_rule (the reference itself delegates
windowing to Beam's watermark machinery — visible only in its tests,
OrderBookProcessingPipelineTest.java:204-217 — and to downstream SQL,
README.md:105-140; the semantics here are standard event-time windowing).

Design (SURVEY.md §2.5, §7.1.5):
- window-id assignment is a vectorized ``map_batches`` over zero-copy Arrow;
- count-style aggregates use partial pre-aggregation per batch followed by a
  small ``groupby().aggregate`` — the shuffle moves one row per
  (key, window, batch), not one per turn;
- order-dependent products (text_digest) and session windows (per-key gap
  merge) use one hash exchange on the key + a per-partition vectorized
  lexsort/boundary pass — the batch analogue of the in-actor state path
  (never a Python callback per key or per group).

All functions take/return ``ray.data.Dataset`` and never materialize input.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .schema import KEY

_US = 1_000_000


def _size_us(seconds: float) -> int:
    return int(seconds * _US)


def assign_tumbling(ds, size_s: float, ts: str = "ts"):
    """Add window_start/window_end columns (vectorized)."""
    size = _size_us(size_s)

    def f(t: pa.Table) -> pa.Table:
        tsi = pc.cast(t[ts], pa.int64())
        ws_i = pc.multiply(pc.divide(tsi, size), size)  # integer division (ts >= epoch)
        ws = pc.cast(ws_i, pa.timestamp("us"))
        we = pc.cast(pc.add(ws_i, size), pa.timestamp("us"))
        return t.append_column("window_start", ws).append_column("window_end", we)

    return ds.map_batches(f, batch_format="pyarrow")


def tumbling_counts(ds, size_s: float, key: str = KEY, ts: str = "ts"):
    """Tumbling-window per-key aggregate: turn_count plus per-role counts.

    Scale path: per-batch partial aggregation -> groupby over partials.
    """
    size = _size_us(size_s)

    def partial(t: pa.Table) -> pa.Table:
        tsi = pc.cast(t[ts], pa.int64()).to_numpy(zero_copy_only=False)
        ws = (tsi // size) * size
        df = pd.DataFrame(
            {
                key: t[key].to_pandas(),
                "window_start": ws,
                "role": t["role"].to_pandas(),
            }
        )
        df["n_user"] = (df["role"] == "user").astype("int64")
        df["n_assistant"] = (df["role"] == "assistant").astype("int64")
        g = df.groupby([key, "window_start"], sort=False)
        out = g.agg(
            turn_count=("role", "size"),
            n_user=("n_user", "sum"),
            n_assistant=("n_assistant", "sum"),
        ).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    from .agg import exchange_groupby

    partials = ds.map_batches(partial, batch_format="pyarrow")
    agg = exchange_groupby(
        partials,
        [key, "window_start"],
        {
            "turn_count": ("turn_count", "sum"),
            "n_user": ("n_user", "sum"),
            "n_assistant": ("n_assistant", "sum"),
        },
    )

    def finish(t: pa.Table) -> pa.Table:
        ws = pc.cast(t["window_start"], pa.timestamp("us"))
        we = pc.cast(pc.add(t["window_start"], size), pa.timestamp("us"))
        t = t.drop_columns(["window_start"])
        return t.append_column("window_start", ws).append_column("window_end", we)

    return agg.map_batches(finish, batch_format="pyarrow")


def tumbling_digest(ds, size_s: float, key: str = KEY, ts: str = "ts", seq: str = "turn_idx"):
    """Tumbling windows with an order-dependent text digest (md5 of texts
    concatenated in turn order) — the conformance variant (FIXTURES.md §4).

    One hash exchange on the key, then per-partition vectorized grouping
    (lexsort + boundary flags, the session_windows shape) with the digest
    through the shared vectorized md5 kernel. The previous
    groupby(...).map_groups paid Ray Data's sort-based shuffle plus one
    Python callback per (key, window) group (VERDICT r3 'what's wrong' #3)."""
    import ray
    import ray.data

    from .exchange import shard_refs
    from .stream_dedup import md5_hex

    size = _size_us(size_s)

    @ray.remote
    def digest(*shards: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key: pa.array([], pa.string()),
                "window_start": pa.array([], pa.timestamp("us")),
                "window_end": pa.array([], pa.timestamp("us")),
                "turn_count": pa.array([], pa.int64()),
                "text_digest": pa.array([], pa.string()),
            }
        )
        real = [t for t in shards if t.num_rows]
        if not real:
            return empty
        tbl = pa.concat_tables(real, promote_options="none") if len(real) > 1 else real[0]
        col = tbl[key].combine_chunks() if isinstance(tbl[key], pa.ChunkedArray) else tbl[key]
        enc = pc.dictionary_encode(col)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = np.asarray(enc.indices).astype(np.int64)
        tsi = tbl[ts].cast(pa.int64()).to_numpy(zero_copy_only=False)
        sq = tbl[seq].to_numpy(zero_copy_only=False)
        ws = (tsi // size) * size
        order = np.lexsort((sq, ws, codes))
        c, w = codes[order], ws[order]
        n = len(c)
        new_g = np.empty(n, dtype=bool)
        new_g[0] = True
        new_g[1:] = (c[1:] != c[:-1]) | (w[1:] != w[:-1])
        starts = np.flatnonzero(new_g)
        ends = np.append(starts[1:], n)
        texts = tbl["text"].to_pandas().to_numpy(dtype=object)[order]
        joined = pa.array(
            ["|".join(texts[s:e]) for s, e in zip(starts, ends)], pa.string()
        )
        return pa.table(
            {
                key: pc.take(enc.dictionary, pa.array(c[starts])),
                "window_start": pa.array(w[starts], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "window_end": pa.array(w[starts] + size, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "turn_count": pa.array(ends - starts, pa.int64()),
                "text_digest": md5_hex(joined),
            }
        )

    P = max(2, int(ray.cluster_resources().get("CPU", 4)) // 2)
    block_refs = list(
        ds.select_columns([key, ts, seq, "text"]).to_arrow_refs()
    )
    if not block_refs:
        return ds
    per_group = shard_refs(block_refs, key, P)
    out = [digest.remote(*[pg[p] for pg in per_group]) for p in range(P)]
    return ray.data.from_arrow_refs(out)


def sliding_counts(ds, size_s: float, step_s: float, key: str = KEY, ts: str = "ts"):
    """Sliding windows: each row explodes into the ceil(size/step) windows
    containing it (vectorized repeat), then partial + global aggregation."""
    size, step = _size_us(size_s), _size_us(step_s)
    n_w = -(-size // step)  # windows per row

    def explode_partial(t: pa.Table) -> pa.Table:
        tsi = pc.cast(t[ts], pa.int64()).to_numpy(zero_copy_only=False)
        # last window start containing the row, then walk back n_w starts
        last_ws = (tsi // step) * step
        offs = (np.arange(n_w) * step)[None, :]
        ws = last_ws[:, None] - offs                     # (rows, n_w)
        valid = (ws + size) > tsi[:, None]
        valid &= ws >= 0
        keys = np.repeat(np.asarray(t[key].to_pandas(), dtype=object), n_w)
        df = pd.DataFrame(
            {key: keys[valid.ravel()], "window_start": ws.ravel()[valid.ravel()]}
        )
        out = df.groupby([key, "window_start"], sort=False).size().rename("turn_count").reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    from .agg import exchange_groupby

    partials = ds.map_batches(explode_partial, batch_format="pyarrow")
    agg = exchange_groupby(
        partials, [key, "window_start"], {"turn_count": ("turn_count", "sum")}
    )

    def finish(t: pa.Table) -> pa.Table:
        ws = pc.cast(t["window_start"], pa.timestamp("us"))
        we = pc.cast(pc.add(t["window_start"], size), pa.timestamp("us"))
        t = t.drop_columns(["window_start"])
        return t.append_column("window_start", ws).append_column("window_end", we)

    return agg.map_batches(finish, batch_format="pyarrow")


def session_windows(ds, gap_s: float, key: str = KEY, ts: str = "ts",
                    num_partitions: int | None = None):
    """Session windows: per-key gap merge (a new session starts when the gap
    to the previous turn exceeds ``gap_s``).

    One hash exchange on the key, then a fully VECTORIZED multi-key merge
    per partition (lexsort by (key, ts) + boundary flags + cumsum session
    ids + reduceat bounds) — the same shape as the ordered drain. A
    groupby(key).map_groups would pay a Python callback per key, which at
    10^9 keys dominates everything else (SURVEY.md §7.3)."""
    import ray
    import ray.data

    from .exchange import shard_refs

    gap = _size_us(gap_s)

    @ray.remote
    def sessions(*shards: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key: pa.array([], pa.string()),
                "session_id": pa.array([], pa.int64()),
                "session_start": pa.array([], pa.timestamp("us")),
                "session_end": pa.array([], pa.timestamp("us")),
                "turn_count": pa.array([], pa.int64()),
            }
        )
        real = [t for t in shards if t.num_rows]
        if not real:
            return empty
        tbl = pa.concat_tables(real, promote_options="none") if len(real) > 1 else real[0]
        col = tbl[key].combine_chunks() if isinstance(tbl[key], pa.ChunkedArray) else tbl[key]
        enc = pc.dictionary_encode(col)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = np.asarray(enc.indices).astype(np.int64)
        tsi = tbl[ts].cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = len(codes)
        order = np.lexsort((tsi, codes))
        c, tv = codes[order], tsi[order]
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = c[1:] != c[:-1]
        new_session = new_key.copy()
        new_session[1:] |= (tv[1:] - tv[:-1]) > gap
        g_sid = np.cumsum(new_session) - 1                  # global session no.
        # per-key session_id = global - global at the key's first session
        key_first_sid = np.maximum.accumulate(np.where(new_key, g_sid, 0))
        sid = g_sid - key_first_sid
        starts = np.flatnonzero(new_session)
        ends = np.append(starts[1:], n) - 1
        return pa.table(
            {
                key: pc.take(enc.dictionary, pa.array(c[starts])),
                "session_id": pa.array(sid[starts], pa.int64()),
                "session_start": pa.array(tv[starts], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "session_end": pa.array(tv[ends], pa.int64()).cast(pa.timestamp("us")),
                "turn_count": pa.array(ends - starts + 1, pa.int64()),
            }
        )

    P = num_partitions or max(2, int(ray.cluster_resources().get("CPU", 4)) // 2)
    # project BEFORE the exchange: only (key, ts) ever shuffles
    block_refs = list(ds.select_columns([key, ts]).to_arrow_refs())
    if not block_refs:
        return ds
    per_group = shard_refs(block_refs, key, P)
    out = [sessions.remote(*[pg[p] for pg in per_group]) for p in range(P)]
    return ray.data.from_arrow_refs(out)
