"""Derive a transcript-shaped ordered stream from the ``events`` test table.

The correctness harness (``__ray_entry__``) needs ordered-processing queries
whose oracle is ANSI SQL over the pre-registered testdata views, so we map
``events`` to the transcript shape deterministically:

    conv_id  = cast(user_id as string)
    turn_idx = per-user rank of (ts, event_id) - 1        (int32)
    role     = event_type, text = props, ts = ts

Sequence assignment is a per-key operation (≙ the simulator's per-contract
seqId counter, business-model/.../Matcher.java:219-225). It is ONE
hash-exchange on conv_id followed by a fully vectorized in-partition rank
(integer lexsort + group-boundary cumcount — the same shape as the ordered
drain), NOT a per-group pandas callback: at 10^9 users a
groupby().map_groups would pay a Python call per user. The arrival order fed
to the engine is a deterministic hash permutation of event_id — the
engine's output is arrival-invariant (that is the whole point), which the
oracle states as a plain ORDER BY.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..schema import ARRIVAL, KEY, SEQ


@ray.remote
def _project(t: pa.Table) -> pa.Table:
    uid = pc.cast(pc.cast(t["user_id"], pa.int64()), pa.string())
    return pa.table(
        {
            KEY: uid,
            "role": t["event_type"],
            "text": t["props"],
            "tool": pa.nulls(t.num_rows, pa.string()).fill_null(""),
            "ts": t["ts"].cast(pa.timestamp("us")),
            "event_id": pc.cast(t["event_id"], pa.int64()),
        }
    )


@ray.remote
def _rank_partition(*shards: pa.Table) -> pa.Table:
    """Vectorized per-key rank within one hash partition: every key's rows
    are entirely in this partition, so rank = position within the
    (key, ts, event_id)-lexsorted group."""
    real = [t for t in shards if t.num_rows]
    empty = shards[0].slice(0, 0).append_column(SEQ, pa.array([], pa.int32()))
    if not real:
        return empty
    tbl = pa.concat_tables(real, promote_options="none") if len(real) > 1 else real[0]
    enc = pc.dictionary_encode(
        tbl[KEY].combine_chunks()
        if isinstance(tbl[KEY], pa.ChunkedArray)
        else tbl[KEY]
    )
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = np.asarray(enc.indices).astype(np.int64)
    tsv = tbl["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    ev = tbl["event_id"].to_numpy(zero_copy_only=False)
    n = len(codes)
    order = np.lexsort((ev, tsv, codes))
    c_s = codes[order]
    boundary = np.empty(n, dtype=bool)
    boundary[0] = True
    boundary[1:] = c_s[1:] != c_s[:-1]
    group_start = np.maximum.accumulate(np.where(boundary, np.arange(n), 0))
    rank = np.arange(n) - group_start
    seq = np.empty(n, dtype=np.int32)
    seq[order] = rank.astype(np.int32)
    cols = tbl.column_names
    out = tbl.add_column(1, SEQ, pa.array(seq, pa.int32())) if SEQ not in cols else tbl
    return out


def derive_transcripts(events_ds, num_partitions: int | None = None):
    """events Dataset -> transcript-shaped Dataset (in no particular order).

    One explicit hash exchange (split tasks -> rank tasks), zero driver
    materialization; the result is a lazy Dataset over the ranked
    partitions' object refs."""
    if num_partitions is None:
        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 4)) // 2)
    P = num_partitions
    block_refs = list(events_ds.to_arrow_refs())
    if not block_refs:
        return events_ds
    from ..exchange import shard_refs

    projected = [_project.remote(b) for b in block_refs]
    if P == 1:
        return ray.data.from_arrow_refs([_rank_partition.remote(*projected)])
    per_group = shard_refs(projected, KEY, P)
    ranked = [
        _rank_partition.remote(*[pg[p] for pg in per_group]) for p in range(P)
    ]
    return ray.data.from_arrow_refs(ranked)


def with_shuffled_arrival(ds):
    """Deterministic pseudo-random arrival order: Knuth-hash of event_id."""

    def f(t: pa.Table) -> pa.Table:
        ev = t["event_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        arr = (ev * np.uint64(2654435761)) % np.uint64(1 << 32)
        return t.append_column(ARRIVAL, pa.array(arr.astype(np.int64), pa.int64()))

    return ds.map_batches(f, batch_format="pyarrow")
