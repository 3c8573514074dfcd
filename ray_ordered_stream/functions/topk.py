"""Distributed grouped top-k without a global sort.

Task-mandated scale operator (global ``sort().limit()`` covers the
reference's demo top-k — query ``top_orders`` — but per-GROUP top-k at
10^9 groups must not sort the world): per-batch partial top-k prunes to at
most k rows per (group, batch) BEFORE the exchange, then one hash shuffle
of the survivors and a vectorized per-partition rank (lexsort + boundary +
rank-within-group, the ordered-drain shape — no per-group Python).

Ties are broken by ``tiebreak`` (ascending, larger-wins-last) so results
are deterministic; mirror it in SQL as
``QUALIFY row_number() OVER (PARTITION BY g ORDER BY v DESC, tb DESC) <= k``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _desc_key(a: np.ndarray) -> np.ndarray:
    """Sort key for descending order. Plain negation WRAPS on unsigned
    dtypes (0 would rank as the largest value); flip against the dtype max
    instead."""
    if a.dtype.kind == "u":
        return np.iinfo(a.dtype).max - a
    return -a


def _rank_topk(
    tbl: pa.Table, group: str, value: str, tiebreak: str, k: int,
    descending: bool,
) -> pa.Table:
    """Keep the top-k rows per group of one in-memory table (vectorized)."""
    if tbl.num_rows == 0:
        return tbl
    enc = pc.dictionary_encode(
        tbl[group].combine_chunks()
        if isinstance(tbl[group], pa.ChunkedArray)
        else tbl[group]
    )
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = np.asarray(enc.indices).astype(np.int64)
    v = tbl[value].to_numpy(zero_copy_only=False)
    tb = tbl[tiebreak].to_numpy(zero_copy_only=False)
    sv = _desc_key(v) if descending else v
    stb = _desc_key(tb) if descending else tb
    order = np.lexsort((stb, sv, codes))
    c_s = codes[order]
    b = np.empty(len(c_s), dtype=bool)
    b[0] = True
    b[1:] = c_s[1:] != c_s[:-1]
    firsts = np.flatnonzero(b)
    first_of = np.repeat(firsts, np.diff(np.append(firsts, len(c_s))))
    rank = np.arange(len(c_s)) - first_of
    keep = order[rank < k]
    keep.sort()  # preserve input row order
    return tbl.take(pa.array(keep))


def grouped_topk(
    ds,
    group: str,
    value: str,
    k: int,
    tiebreak: str,
    descending: bool = True,
    by_int: bool = False,
    num_partitions: int | None = None,
):
    """Top-k rows per group, in one partial-prune pass + one shuffle of at
    most k rows per (group, input block)."""
    import ray
    import ray.data

    from ..exchange import shard_refs

    def partial(t: pa.Table) -> pa.Table:
        return _rank_topk(t, group, value, tiebreak, k, descending)

    @ray.remote
    def final(*shards: pa.Table) -> pa.Table:
        real = [t for t in shards if t.num_rows]
        if not real:
            return shards[0].slice(0, 0) if shards else pa.table({})
        tbl = (
            pa.concat_tables(real, promote_options="none")
            if len(real) > 1
            else real[0]
        )
        return _rank_topk(tbl, group, value, tiebreak, k, descending)

    pruned = ds.map_batches(partial, batch_format="pyarrow")
    from ..exchange import default_partitions

    P = num_partitions or default_partitions()
    groups = shard_refs(list(pruned.to_arrow_refs()), group, P, by_int=by_int)
    out = [final.remote(*[g[p] for g in groups]) for p in range(P)]
    return ray.data.from_arrow_refs(out)
