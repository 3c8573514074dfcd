"""Distributed global ORDER-BY rank (row_number at scale) + curriculum
sharding.

``global_rank`` assigns every row its exact 0-based rank under
``ORDER BY metric, id`` without a global sort: sampled range bounds on the
integer metric give ordered partitions (routing by metric ALONE, so tie
groups never straddle a boundary), each partition sorts locally and adds
the exclusive prefix sum of earlier partitions' counts — the driver scans
P integers, the payload never moves (only (id, metric) pairs shuffle).
The ordered sibling of sample.shuffle_rank (which ranks by a uniform hash
and therefore needs no sampling pass).

``curriculum_shards`` turns the rank into equal shards (floor buckets:
``shard = rank * k // n``): ordering a corpus by a difficulty metric and
feeding shards in order is the standard curriculum / length-bucketing
step of a training pipeline (length bucketing also cuts padding waste).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..exchange import default_partitions, split_compact


@ray.remote
def _sample_metric(col: str, cap: int, tbl: pa.Table) -> np.ndarray:
    if col not in tbl.column_names:  # empty block with empty schema
        return np.empty(0, dtype=np.int64)
    v = tbl[col].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(v) > cap:
        stride = len(v) // cap
        v = v[::stride][:cap]
    return v


@ray.remote
def _range_split(
    metric: str, id_col: str, bounds: np.ndarray, *tbls: pa.Table
) -> list[pa.Table]:
    P = len(bounds) + 1
    outs = []
    for t in tbls:
        if not t.num_rows:
            continue
        proj = pa.table(
            {
                id_col: t[id_col].cast(pa.int64()),
                metric: t[metric].cast(pa.int64()),
            }
        )
        m = proj[metric].to_numpy(zero_copy_only=False)
        parts = np.searchsorted(bounds, m, side="right").astype(np.int64)
        outs.append(split_compact(proj, parts, P))
    if not outs:
        e = pa.table(
            {id_col: pa.array([], pa.int64()), metric: pa.array([], pa.int64())}
        )
        return [e] * P
    return [
        pa.concat_tables([o[p] for o in outs], promote_options="none")
        for p in range(P)
    ]


@ray.remote(num_returns=2)
def _local_rank(metric: str, id_col: str, *shards: pa.Table):
    real = [t for t in shards if t.num_rows]
    if not real:
        e = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                metric: pa.array([], pa.int64()),
                "_local_rank": pa.array([], pa.int64()),
            }
        )
        return e, 0
    tbl = pa.concat_tables(real, promote_options="none") if len(real) > 1 else real[0]
    m = tbl[metric].to_numpy(zero_copy_only=False)
    ids = tbl[id_col].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, m))
    tbl = tbl.take(pa.array(order))
    tbl = tbl.append_column(
        "_local_rank", pa.array(np.arange(tbl.num_rows, dtype=np.int64))
    )
    return tbl, tbl.num_rows


def global_rank(
    ds,
    metric: str,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
    sample_per_block: int = 1024,
):
    """(id, metric, rank) with rank = exact 0-based ``row_number() OVER
    (ORDER BY metric, id) - 1``. Integer metric; ties broken by id."""
    import ray.data

    P = num_partitions or default_partitions()
    block_refs = list(ds.to_arrow_refs())
    if not block_refs:
        return ds

    samples = ray.get(
        [_sample_metric.remote(metric, sample_per_block, b) for b in block_refs]
    )
    allv = np.sort(np.concatenate(samples)) if samples else np.array([], np.int64)
    if len(allv) == 0 or P == 1:
        bounds = np.array([], dtype=np.int64)
    else:
        qs = np.linspace(0, len(allv) - 1, P + 1)[1:-1].astype(np.int64)
        bounds = np.unique(allv[qs])
    P = len(bounds) + 1

    groups = [
        list(g)
        for g in np.array_split(
            np.array(block_refs, dtype=object),
            max(1, min(len(block_refs), 2 * P)),
        )
        if len(g)
    ]
    if P == 1:
        scans = [_local_rank.remote(metric, id_col, *block_refs)]
    else:
        split_groups = [
            _range_split.options(num_returns=P).remote(
                metric, id_col, bounds, *g
            )
            for g in groups
        ]
        scans = [
            _local_rank.remote(metric, id_col, *[g[p] for g in split_groups])
            for p in range(P)
        ]
    tbl_refs = [s[0] for s in scans]
    counts = ray.get([s[1] for s in scans])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)

    @ray.remote
    def finalize(off: int, t: pa.Table) -> pa.Table:
        r = t["_local_rank"].to_numpy(zero_copy_only=False) + off
        return pa.table(
            {
                id_col: t[id_col],
                metric: t[metric],
                "rank": pa.array(r, pa.int64()),
            }
        )

    return (
        ray.data.from_arrow_refs(
            [finalize.remote(int(offsets[p]), tbl_refs[p]) for p in range(P)]
        ),
        int(sum(counts)),
    )


def curriculum_shards(
    ds,
    metric: str,
    k: int = 8,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
):
    """(id, metric, rank, shard) with shard = rank * k // n — k
    equal-size curriculum shards in ``ORDER BY metric, id`` order."""
    ranked, n = global_rank(ds, metric, id_col, num_partitions)
    if n == 0:
        return ranked

    def add_shard(t: pa.Table) -> pa.Table:
        r = t["rank"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "shard", pa.array((r * k) // n, pa.int64())
        )

    return ranked.map_batches(add_shard, batch_format="pyarrow")
