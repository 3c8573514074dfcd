"""Distributed connected components + cluster-level dedup.

The missing last step of real corpus near-dedup: LSH + verify emits PAIRS
(functions/dedup.near_dup_pairs), but duplicates arrive in CLUSTERS (a
popular page crawled 40 times yields 780 pairs, one cluster). Grouping
pairs into components and keeping one representative per component is what
actually shrinks the corpus.

Algorithm: iterative min-label propagation ("hash-min"): every node starts
labeled with its own id; each round a node whose label changed broadcasts
it to its neighbours, which keep the minimum they have seen. Converges in
O(graph diameter) rounds — near-dup clusters are dense and shallow
(diameter 1-3), so 2-4 rounds in practice; for adversarially deep graphs a
large-star/small-star pointer-doubling variant would cut that to
O(log d), which this corpus shape does not need.

Scale design (100 TB):
- Edges are hash-partitioned by ``src`` ONCE into per-partition plasma
  objects and never move again; each round is a BSP superstep of plain
  tasks (receive the previous round's messages, then send from the new
  frontier). Only (node, label) messages cross the wire, and only for
  FRONTIER nodes (label changed last round) — traffic decays
  geometrically as components settle.
- Per-partition mutable state (labels, frontier) is threaded between
  rounds as small plasma objects (8 B + 1 B per node); the immutable edge
  CSR stays put, and Ray's locality-aware scheduling runs each round's
  task on the node that already holds its partition. Tasks (not actors)
  keep the per-call cost at warm-worker dispatch — no actor process
  spawn, which otherwise dominates small runs.
- Both directions of every pair are materialized before the split, so a
  node's full neighbourhood (and its own label row) live in the one
  partition chosen by its id hash; message routing reuses the same hash.
- All per-round work is numpy over sorted arrays (searchsorted /
  reduceat); no Python per node or per edge.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..exchange import default_partitions, int_partition_codes, shard_refs, split_compact


def _empty_cc() -> pa.Table:
    return pa.table(
        {"node": pa.array([], pa.int64()), "component": pa.array([], pa.int64())}
    )


@ray.remote(num_returns=2)
def _cc_load(*shards: pa.Table):
    """Coalesce one partition's edge shards into an immutable CSR in
    plasma. Returns ``(csr, n_nodes)``; ``csr`` = (nodes sorted unique,
    edge-range starts, dst sorted by src)."""
    real = [t for t in shards if t.num_rows]
    if not real:
        return (
            np.empty(0, np.int64),
            np.empty(1, np.int64),
            np.empty(0, np.int64),
        ), 0
    tbl = (
        pa.concat_tables(real, promote_options="none")
        if len(real) > 1
        else real[0]
    )
    src = tbl["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    dst = tbl["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    nodes, first = np.unique(src, return_index=True)
    starts = np.append(first, len(src)).astype(np.int64)
    return (nodes, starts, dst), len(nodes)


@ray.remote
def _cc_step(P: int, csr, labels, frontier, *msgs: pa.Table):
    """One BSP superstep of min-label propagation for one partition:
    fold the previous round's incoming messages into the labels, then
    emit (dst, label) messages from the NEW frontier, split by the dst
    partition hash. Returns ``(labels', frontier', changed,
    msg_to_0, ..., msg_to_P-1)`` — call with ``num_returns=P + 3``."""
    nodes, starts, dst = csr
    if labels is None:  # round 0: every node starts labeled with itself
        labels, frontier = nodes, np.arange(len(nodes), dtype=np.int64)
    changed = 0
    real = [t for t in msgs if t.num_rows]
    if real and len(nodes):
        tbl = (
            pa.concat_tables(real, promote_options="none")
            if len(real) > 1
            else real[0]
        )
        node = tbl["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = tbl["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        # per-node min of the incoming labels: sort by (node, label), take
        # the first of each node run
        order = np.lexsort((lab, node))
        node, lab = node[order], lab[order]
        first = np.empty(len(node), dtype=bool)
        first[0] = True
        first[1:] = node[1:] != node[:-1]
        node, lab = node[first], lab[first]
        idx = np.searchsorted(nodes, node)
        # symmetric edges guarantee every message target is a local node
        better = lab < labels[idx]
        if better.any():
            labels = labels.copy()  # plasma inputs are read-only
            labels[idx[better]] = lab[better]
            frontier = idx[better]
            changed = int(better.sum())
        else:
            frontier = np.empty(0, np.int64)
    if not len(frontier):
        return (labels, frontier, changed) + tuple([_msg_empty()] * P)
    counts = np.diff(starts)
    fmask = np.zeros(len(nodes), dtype=bool)
    fmask[frontier] = True
    mask = np.repeat(fmask, counts)
    mdst = dst[mask]
    mlab = np.repeat(labels, counts)[mask]
    tbl = pa.table(
        {"node": pa.array(mdst, pa.int64()), "label": pa.array(mlab, pa.int64())}
    )
    out = split_compact(tbl, int_partition_codes(mdst, P), P)
    return (labels, frontier, changed) + tuple(out)


@ray.remote
def _cc_result(csr, labels) -> pa.Table:
    nodes = csr[0]
    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "component": pa.array(labels, pa.int64()),
        }
    )


def _msg_empty() -> pa.Table:
    return pa.table(
        {"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
    )


def connected_components(
    pairs,
    id_a: str = "id_a",
    id_b: str = "id_b",
    num_partitions: int | None = None,
    max_iters: int = 64,
):
    """Connected components of an undirected pair Dataset.

    Returns a Dataset of ``(node, component)`` — one row per node that
    appears in any pair, ``component`` = the smallest node id reachable
    from it. Nodes that appear in no pair are singletons by definition and
    are not emitted (callers treat absence as component == self).
    """
    import ray.data

    def sym(t: pa.Table) -> pa.Table:
        a = t[id_a].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[id_b].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b]), pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    edges = pairs.map_batches(sym, batch_format="pyarrow")
    refs = list(edges.to_arrow_refs())
    P = num_partitions or default_partitions()
    groups = shard_refs(refs, "src", P, by_int=True)
    built = [_cc_load.remote(*[g[p] for g in groups]) for p in range(P)]
    csr = [b[0] for b in built]
    n_nodes = sum(ray.get([b[1] for b in built]))
    if n_nodes == 0:
        return ray.data.from_arrow([_empty_cc()])

    # round 0 initializes labels/frontier inside the step tasks
    labels: list = [None] * P
    frontier: list = [None] * P
    msgs: list = [[_msg_empty()] * P] * P  # msgs[src][dst_partition]
    for it in range(max_iters):
        outs = [
            _cc_step.options(num_returns=P + 3).remote(
                P, csr[p], labels[p], frontier[p], *[m[p] for m in msgs]
            )
            for p in range(P)
        ]
        labels = [o[0] for o in outs]
        frontier = [o[1] for o in outs]
        msgs = [o[3:] for o in outs]
        changed = sum(ray.get([o[2] for o in outs]))
        if it > 0 and changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(graph diameter exceeds the cap; raise max_iters)"
        )

    out = [_cc_result.remote(csr[p], labels[p]) for p in range(P)]
    return ray.data.from_arrow_refs(out)


@ray.remote(num_returns=2)
def _pr_load(*shards: pa.Table):
    """Like ``_cc_load`` but DISTINCT on (src, dst): PageRank weights edges
    by degree, so multi-edges (the same pair emitted twice upstream) must
    collapse — mirroring the oracle's ``SELECT DISTINCT`` edge table. All
    edges with one src hash to one partition, so per-partition dedup is
    global dedup."""
    real = [t for t in shards if t.num_rows]
    if not real:
        return (
            np.empty(0, np.int64),
            np.empty(1, np.int64),
            np.empty(0, np.int64),
        ), 0
    tbl = (
        pa.concat_tables(real, promote_options="none")
        if len(real) > 1
        else real[0]
    )
    src = tbl["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    dst = tbl["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    keep = np.empty(len(src), dtype=bool)
    if len(src):
        keep[0] = True
        keep[1:] = (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])
        src, dst = src[keep], dst[keep]
    nodes, first = np.unique(src, return_index=True)
    starts = np.append(first, len(src)).astype(np.int64)
    return (nodes, starts, dst), len(nodes)


def _pr_msg_empty() -> pa.Table:
    return pa.table(
        {"node": pa.array([], pa.int64()), "contrib": pa.array([], pa.float64())}
    )


@ray.remote
def _pr_step(P: int, csr, ranks, damping: float, emit: bool, *msgs: pa.Table):
    """One PageRank superstep for one partition: fold the previous round's
    incoming contributions into ``rank = (1 - d) + d * Σ contrib`` (skipped
    on round 0, where ranks initialize to 1.0), then — unless this is the
    final fold — emit this round's outgoing ``rank / deg`` contributions,
    pre-combined per destination node BEFORE the split (the combiner: what
    crosses the wire is one (node, contrib) row per unique neighbour, not
    one per edge). Returns ``(ranks', msg_to_0, ..., msg_to_P-1)`` — call
    with ``num_returns = P + 1`` when emitting."""
    nodes, starts, dst = csr
    if ranks is None:
        ranks = np.ones(len(nodes), dtype=np.float64)
    else:
        real = [t for t in msgs if t.num_rows]
        sums = np.zeros(len(nodes), dtype=np.float64)
        if real and len(nodes):
            tbl = (
                pa.concat_tables(real, promote_options="none")
                if len(real) > 1
                else real[0]
            )
            node = tbl["node"].to_numpy(zero_copy_only=False).astype(np.int64)
            con = tbl["contrib"].to_numpy(zero_copy_only=False)
            order = np.argsort(node, kind="stable")
            node, con = node[order], con[order]
            first = np.empty(len(node), dtype=bool)
            first[0] = True
            first[1:] = node[1:] != node[:-1]
            idx = np.searchsorted(nodes, node[first])
            sums[idx] = np.add.reduceat(con, np.flatnonzero(first))
        ranks = (1.0 - damping) + damping * sums
    if not emit:
        return ranks
    counts = np.diff(starts)
    per_edge = np.repeat(ranks / np.maximum(counts, 1), counts)
    # local combine per destination before routing
    order = np.argsort(dst, kind="stable")
    sdst, scon = dst[order], per_edge[order]
    first = np.empty(len(sdst), dtype=bool)
    if len(sdst):
        first[0] = True
        first[1:] = sdst[1:] != sdst[:-1]
        udst = sdst[first]
        usum = np.add.reduceat(scon, np.flatnonzero(first))
    else:
        udst = np.empty(0, np.int64)
        usum = np.empty(0, np.float64)
    tbl = pa.table(
        {
            "node": pa.array(udst, pa.int64()),
            "contrib": pa.array(usum, pa.float64()),
        }
    )
    out = split_compact(tbl, int_partition_codes(udst, P), P)
    return (ranks,) + tuple(out)


@ray.remote
def _pr_result(csr, ranks) -> pa.Table:
    return pa.table(
        {
            "node": pa.array(csr[0], pa.int64()),
            "rank": pa.array(ranks, pa.float64()),
        }
    )


def pagerank(
    pairs,
    id_a: str = "id_a",
    id_b: str = "id_b",
    iters: int = 3,
    damping: float = 0.85,
    num_partitions: int | None = None,
):
    """PageRank over an undirected pair Dataset (both directions
    materialized, so every node's in- and out-neighbourhoods coincide) in
    the classic unnormalized form ``r' = (1-d) + d·Σ r/deg`` (Page et al.
    1999), run for a FIXED ``iters`` supersteps from ``r0 = 1`` — a
    deterministic spec an oracle can replay by unrolling the iterations.

    Scale design mirrors ``connected_components``: edges hash-partition by
    src ONCE into immutable plasma CSRs; each superstep is a wave of plain
    tasks; only per-round (node, contrib) messages move, and a per-partition
    combiner collapses them to one row per unique destination before the
    exchange. Returns a Dataset of (node, rank) for every node in any pair.
    """
    import ray.data

    def sym(t: pa.Table) -> pa.Table:
        a = t[id_a].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[id_b].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b]), pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    edges = pairs.map_batches(sym, batch_format="pyarrow")
    refs = list(edges.to_arrow_refs())
    P = num_partitions or default_partitions()
    groups = shard_refs(refs, "src", P, by_int=True)
    built = [_pr_load.remote(*[g[p] for g in groups]) for p in range(P)]
    csr = [b[0] for b in built]
    n_nodes = sum(ray.get([b[1] for b in built]))
    if n_nodes == 0:
        return ray.data.from_arrow(
            [pa.table({"node": pa.array([], pa.int64()),
                       "rank": pa.array([], pa.float64())})]
        )

    ranks: list = [None] * P
    msgs: list = [[_pr_msg_empty()] * P] * P
    for rnd in range(iters + 1):
        emit = rnd < iters
        outs = [
            _pr_step.options(num_returns=(P + 1) if emit else 1).remote(
                P, csr[p], ranks[p], damping, emit, *[m[p] for m in msgs]
            )
            for p in range(P)
        ]
        if emit:
            ranks = [o[0] for o in outs]
            msgs = [o[1:] for o in outs]
        else:  # final fold: num_returns=1, the ref IS the rank array
            ranks = list(outs)

    return ray.data.from_arrow_refs(
        [_pr_result.remote(csr[p], ranks[p]) for p in range(P)]
    )


def cluster_dedup(
    ds,
    pairs,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
):
    """Keep ONE representative (the min id) of every duplicate cluster.

    ``pairs`` is a near-dup pair Dataset (e.g. ``near_dup_pairs`` output);
    its connected components define the clusters. Every non-representative
    member (``component != node``) is dropped from ``ds`` by a
    hash-partitioned ANTI-join on id — the drop-set and the payload are
    co-partitioned by the same id hash, membership is a sorted
    searchsorted per partition, and the drop-set (one id per dropped doc)
    never concentrates on the driver.
    """
    import ray.data

    cc = connected_components(pairs, num_partitions=num_partitions)

    def drops(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        comp = t["component"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"drop_id": pa.array(node[comp != node], pa.int64())})

    drop = cc.map_batches(drops, batch_format="pyarrow")
    return anti_join_drop_ids(ds, drop, id_col, num_partitions=num_partitions)


def anti_join_drop_ids(
    ds,
    drop,
    id_col: str,
    drop_col: str = "drop_id",
    num_partitions: int | None = None,
):
    """Hash-partitioned ANTI-join: rows of ``ds`` whose ``id_col`` appears
    in ``drop[drop_col]`` are removed. Drop-set and payload co-partition by
    the same id hash; membership is a sorted searchsorted per partition;
    the drop-set never concentrates on the driver. Shared by cluster-level
    dedup and semantic dedup (any operator whose output is "the corpus
    minus a distributed drop list")."""
    import ray.data

    @ray.remote
    def filt(n_drop: int, *shards: pa.Table) -> pa.Table:
        drop_ids = [
            t[drop_col].to_numpy(zero_copy_only=False)
            for t in shards[:n_drop]
            if t.num_rows
        ]
        data = [t for t in shards[n_drop:] if t.num_rows]
        if not data:
            for t in shards[n_drop:]:
                if t.column_names:
                    return t.slice(0, 0)
            return pa.table({})
        tbl = (
            pa.concat_tables(data, promote_options="none")
            if len(data) > 1
            else data[0]
        )
        if not drop_ids:
            return tbl
        dset = np.sort(np.concatenate(drop_ids).astype(np.int64))
        ids = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(dset, ids)
        pos[pos >= len(dset)] = len(dset) - 1
        return tbl.filter(pa.array(dset[pos] != ids))

    P = num_partitions or default_partitions()
    d_groups = shard_refs(list(drop.to_arrow_refs()), drop_col, P, by_int=True)
    p_groups = shard_refs(list(ds.to_arrow_refs()), id_col, P, by_int=True)
    out = [
        filt.remote(
            len(d_groups), *[g[p] for g in d_groups], *[g[p] for g in p_groups]
        )
        for p in range(P)
    ]
    return ray.data.from_arrow_refs(out)
