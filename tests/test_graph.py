"""Distributed connected components (min-label propagation) vs a serial
union-find oracle, plus cluster-level dedup."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ray_ordered_stream.functions.graph import cluster_dedup, connected_components


def _union_find(n_ids, pairs):
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # fully resolve, then component = min member id
    roots = {i: find(i) for i in n_ids}
    comp_min = {}
    for i, r in roots.items():
        comp_min[r] = min(comp_min.get(r, i), i)
    return {i: comp_min[r] for i, r in roots.items()}


def _cc_df(pairs, **kw):
    ds = ray.data.from_pandas(
        pd.DataFrame(
            {"id_a": [a for a, _ in pairs], "id_b": [b for _, b in pairs]}
        ).astype("int64")
    )
    return (
        connected_components(ds, **kw)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )


def test_cc_chain_needs_many_rounds(ray_session):
    # a path 0-1-2-...-19: min label must propagate the full diameter
    pairs = [(i, i + 1) for i in range(19)]
    got = _cc_df(pairs, num_partitions=3)
    assert got["node"].tolist() == list(range(20))
    assert (got["component"] == 0).all()


def test_cc_random_graphs_match_union_find(ray_session):
    rng = np.random.default_rng(17)
    for trial in range(3):
        ids = rng.choice(10_000, size=200, replace=False).astype(np.int64)
        pairs = [
            (int(rng.choice(ids)), int(rng.choice(ids))) for _ in range(150)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        got = _cc_df(pairs, num_partitions=4)
        nodes = sorted({x for p in pairs for x in p})
        exp = _union_find(nodes, pairs)
        assert got["node"].tolist() == nodes
        assert {
            int(r.node): int(r.component) for r in got.itertuples()
        } == exp


def test_cc_empty_pairs(ray_session):
    ds = ray.data.from_pandas(
        pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
    )
    cc = connected_components(ds, num_partitions=2)
    assert cc.schema().names == ["node", "component"]
    assert cc.count() == 0


def test_cluster_dedup_keeps_min_per_cluster(ray_session):
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(10, dtype="int64"),
            "text": [f"doc {i}" for i in range(10)],
        }
    )
    # clusters {0,3,7}, {2,5}; singletons elsewhere
    pairs = pd.DataFrame(
        {"id_a": [3, 7, 2], "id_b": [0, 3, 5]}
    ).astype("int64")
    kept = (
        cluster_dedup(
            ray.data.from_pandas(docs),
            ray.data.from_pandas(pairs),
            num_partitions=3,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert kept["doc_id"].tolist() == [0, 1, 2, 4, 6, 8, 9]
    pd.testing.assert_frame_equal(
        kept, docs[docs.doc_id.isin(kept.doc_id)].reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------


def _serial_pagerank(pairs, iters=3, damping=0.85):
    """Serial replay of the fixed-iteration spec over DISTINCT symmetric
    edges."""
    import collections

    e = set()
    for a, b in pairs:
        e.add((int(a), int(b)))
        e.add((int(b), int(a)))
    adj = collections.defaultdict(list)
    for s, d in e:
        adj[s].append(d)
    nodes = sorted(adj)
    r = {n: 1.0 for n in nodes}
    for _ in range(iters):
        inc = collections.defaultdict(float)
        for s in nodes:
            c = r[s] / len(adj[s])
            for d in adj[s]:
                inc[d] += c
        r = {n: (1.0 - damping) + damping * inc[n] for n in nodes}
    return r


def test_pagerank_matches_serial(ray_session):
    from ray_ordered_stream.functions.graph import pagerank

    rng = np.random.default_rng(7)
    a = rng.integers(0, 40, 300)
    b = rng.integers(40, 70, 300)
    ds = ray.data.from_pandas(pd.DataFrame({"id_a": a, "id_b": b})).repartition(5)
    for P in (2, 4):
        out = (
            pagerank(ds, iters=3, num_partitions=P)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        exp = _serial_pagerank(zip(a.tolist(), b.tolist()), iters=3)
        assert list(out["node"]) == sorted(exp)
        got = out["rank"].to_numpy()
        want = np.array([exp[n] for n in sorted(exp)])
        assert np.allclose(got, want, atol=1e-9)


def test_pagerank_dedupes_multi_edges(ray_session):
    from ray_ordered_stream.functions.graph import pagerank

    # the same pair three times must weigh like once (DISTINCT edges)
    df = pd.DataFrame({"id_a": [1, 1, 1, 2], "id_b": [2, 2, 2, 3]})
    out = (
        pagerank(ray.data.from_pandas(df), iters=3, num_partitions=2)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    exp = _serial_pagerank([(1, 2), (2, 3)], iters=3)
    assert np.allclose(out["rank"].to_numpy(), [exp[1], exp[2], exp[3]])


def test_pagerank_empty(ray_session):
    from ray_ordered_stream.functions.graph import pagerank

    empty = ray.data.from_pandas(
        pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                      "id_b": pd.Series([], dtype="int64")})
    )
    out = pagerank(empty, num_partitions=2)
    assert out.schema().names == ["node", "rank"]
    assert out.count() == 0
