"""Similarity search over an embedding column (``list<float>``).

- ``knn_bruteforce``: baseline — the (small) query matrix is broadcast once
  via ``ray.put`` and every batch does one numpy matmul against it; results
  are per-batch top-k partials reduced by a tiny final top-k (classic
  scatter-gather ANN). Nothing but (query_id, neighbor_id, score) rows ever
  shuffle.
- ``knn_ivf``: scale path — k-means coarse quantizer (driver-sample
  ``train_centroids`` or full-pass ``train_centroids_distributed``,
  broadcast), batches route vectors to their nearest centroid (inverted
  lists); queries probe only ``n_probe`` lists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .embed import _matrix as _vec_matrix  # zero-copy (n, dim) reshape

# per-batch top-k partial schema, shared by every kernel below
_EMPTY_PARTIAL = pa.table(
    {"query_id": pa.array([], pa.int64()),
     "neighbor_id": pa.array([], pa.int64()),
     "cosine": pa.array([], pa.float64())}
)


def knn_bruteforce(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
):
    """Exact top-k cosine neighbors of each query vector.

    Returns a pandas DataFrame (small: len(queries) * k rows) with columns
    (query_id, neighbor_id, rank) — rank 1-based by (cosine desc, id asc),
    a fully deterministic ordering.
    """
    import ray

    qn = queries.astype(np.float64)
    qn = qn / np.linalg.norm(qn, axis=1, keepdims=True)
    q_ref = ray.put((qn, np.asarray(query_ids)))

    def partial_topk(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _EMPTY_PARTIAL
        q, qids = ray.get(q_ref)
        v = _vec_matrix(t[vec_col])
        v = v / np.linalg.norm(v, axis=1, keepdims=True)
        sim = q @ v.T  # (nq, nb)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        kk = min(k + (1 if exclude_self else 0), sim.shape[1])
        # one vectorized argpartition across all queries — no Python rows
        part = np.argpartition(-sim, kk - 1, axis=1)[:, :kk]  # (nq, kk)
        return pa.table(
            {
                "query_id": pa.array(
                    np.repeat(np.asarray(qids, dtype=np.int64), kk), pa.int64()
                ),
                "neighbor_id": pa.array(ids[part.ravel()], pa.int64()),
                "cosine": pa.array(
                    np.take_along_axis(sim, part, axis=1).ravel(), pa.float64()
                ),
            }
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    if exclude_self:
        partials = partials[partials["query_id"] != partials["neighbor_id"]]
    # deterministic final top-k: (cosine desc, neighbor_id asc)
    partials = partials.sort_values(
        ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True],
        kind="stable",
    )
    top = partials.groupby("query_id").head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "neighbor_id", "rank"]]


def train_centroids(ds, n_centroids: int = 16, vec_col: str = "embedding",
                    max_sample: int = 100_000, iters: int = 10, seed: int = 3):
    """Lloyd's k-means on a driver-side sample (coarse quantizer).

    The sample is capped ABSOLUTELY (``max_sample`` rows), never as a
    fraction of the dataset — a fractional sample of a 100 TB table is a
    driver OOM. 100k vectors are ample to place a handful of coarse
    centroids."""
    n = ds.count()
    frac = min(1.0, (2.0 * max_sample) / max(1, n))  # oversample, then cap
    sample = (
        ds.select_columns([vec_col])
        .random_sample(frac, seed=seed)
        .limit(max_sample)
        .to_pandas()
    )
    x = np.stack(sample[vec_col].to_numpy()).astype(np.float64)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = x[m].mean(axis=0)
    return cent


def train_centroids_distributed(
    ds,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    iters: int = 5,
    seed: int = 3,
    init_sample: int = 4096,
):
    """Distributed full-pass Lloyd's k-means: the dataset never leaves the
    workers. Each iteration broadcasts the current centroids (``ray.put``)
    and reduces per-batch (sum, count) partials — n_centroids × dim floats
    per batch, independent of batch row count — on the driver. This is the
    100-TB path ``train_centroids``'s capped driver sample approximates:
    same coarse quantizer, but every row votes.

    Init is a deterministic tiny head sample (absolute cap). The reduce
    order follows batch completion, so centroid floats can differ in the
    last ulps between runs — consumers gate on recall, not on float
    equality (see queries.q_knn_ivf)."""
    import ray

    from .embed import _matrix

    head = ds.select_columns([vec_col]).limit(init_sample).to_pandas()
    x0 = np.stack(head[vec_col].to_numpy()).astype(np.float64)
    rng = np.random.default_rng(seed)
    cent = x0[rng.choice(len(x0), size=min(n_centroids, len(x0)), replace=False)]

    @ray.remote
    def partial(c: np.ndarray, *tbls):
        """(K x dim sums, K counts) of this ref group under centroids c."""
        sums = np.zeros_like(c)
        cnts = np.zeros(len(c), dtype=np.int64)
        for t in tbls:
            if not t.num_rows:
                continue
            v = _matrix(t[vec_col])
            # |v|^2 - 2 v.c + |c|^2 via one matmul (no nb×K×dim temporary)
            d = (
                (v * v).sum(axis=1)[:, None]
                - 2.0 * (v @ c.T)
                + (c * c).sum(axis=1)[None, :]
            )
            a = d.argmin(axis=1)
            np.add.at(sums, a, v)
            cnts += np.bincount(a, minlength=len(c)).astype(np.int64)
        return sums, cnts

    # materialize the vector blocks ONCE; every Lloyd's iteration is then
    # plain tasks over the same refs (the previous per-iteration Ray Data
    # pipeline re-read the input and paid the executor's fixed cost x iters)
    refs = list(ds.select_columns([vec_col]).to_arrow_refs())
    cpus = max(2, int(ray.cluster_resources().get("CPU", 4)))
    groups = [
        list(g)
        for g in np.array_split(
            np.array(refs, dtype=object), max(1, min(len(refs), 2 * cpus))
        )
        if len(g)
    ]
    for _ in range(iters):
        cref = ray.put(cent)
        parts = ray.get([partial.remote(cref, *g) for g in groups])
        sums = np.zeros_like(cent)
        cnts = np.zeros(len(cent), dtype=np.int64)
        for s, c in parts:
            sums += s
            cnts += c
        nz = cnts > 0
        cent[nz] = sums[nz] / cnts[nz, None]
    return cent


def build_ivf_index(
    ds,
    index_dir: str,
    centroids: np.ndarray | None = None,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """One-time IVF index build: trains (or takes) the coarse quantizer and
    writes every vector LIST-PARTITIONED (one hive directory per inverted
    list, ``list_id=<c>/``). This is the 100-TB path: queries afterwards
    READ only their ``n_probe`` probed partitions — I/O pruning, not just
    the compute pruning the scan-based ``knn_ivf`` does.

    The list id is duplicated into an in-file ``lid`` column (the hive key
    itself lives only in the path) so probe-side per-query filtering stays
    a vectorized column test. Returns the centroids; persists them plus
    meta.json under ``index_dir`` so probes can run in a later session."""
    import json
    from pathlib import Path

    import ray

    if centroids is None:
        centroids = train_centroids_distributed(
            ds, n_centroids=n_centroids, vec_col=vec_col
        )
    root = Path(index_dir)
    if root.exists():
        import shutil

        shutil.rmtree(root)
    root.mkdir(parents=True)

    cref = ray.put(centroids)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        col = t[vec_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # normalize to a PLAIN list<float> column with no pandas/extension
        # metadata: Ray may hold the vectors as its Arrow tensor extension
        # type, whose pandas metadata poisons to_pandas on the probe read
        if isinstance(col.type, pa.ExtensionType):
            col = col.storage
        if pa.types.is_fixed_size_list(col.type):
            col = col.cast(pa.list_(col.type.value_type))
        v = _vec_matrix(col)
        d = (
            (v * v).sum(axis=1)[:, None]
            - 2.0 * (v @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        lid = pa.array(d.argmin(axis=1).astype(np.int32), pa.int32())
        return pa.table(
            {id_col: t[id_col], vec_col: col, "lid": lid, "list_id": lid}
        )

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        str(root), partition_cols=["list_id"]
    )
    np.save(root / "centroids.npy", centroids)
    (root / "meta.json").write_text(
        json.dumps(
            {
                "n_centroids": int(len(centroids)),
                "dim": int(centroids.shape[1]),
                "id_col": id_col,
                "vec_col": vec_col,
            }
        )
    )
    return centroids


def ivf_probe_plan(
    index_dir: str, queries: np.ndarray, n_probe: int = 4
) -> tuple[np.ndarray, np.ndarray, list[str]]:
    """Resolve which inverted lists each query probes and which partition
    directories that touches. Returns (centroids, probe (nq, n_probe),
    probed directory paths — the ONLY files a probe reads)."""
    from pathlib import Path

    root = Path(index_dir)
    centroids = np.load(root / "centroids.npy")
    qn = queries.astype(np.float64)
    qn = qn / np.linalg.norm(qn, axis=1, keepdims=True)
    qd = ((qn[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    probe = np.argsort(qd, axis=1)[:, :n_probe]
    needed = sorted({int(c) for c in probe.ravel()})
    dirs = [
        str(root / f"list_id={c}")
        for c in needed
        if (root / f"list_id={c}").exists()  # empty lists write no dir
    ]
    return centroids, probe, dirs


def _dir_files(dirs: list[str]) -> list[str]:
    """Parquet files under the probed partition dirs (Ray's read_parquet
    wants file paths when given a list)."""
    from pathlib import Path

    return [str(f) for d in dirs for f in sorted(Path(d).glob("*.parquet"))]


def knn_ivf_index(
    index_dir: str,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
):
    """IVF top-k over a MATERIALIZED index (see ``build_ivf_index``): only
    the ``n_probe`` probed list partitions are read from storage — at scale
    this is the difference between scanning 100 TB per query batch and
    reading ``n_probe/n_centroids`` of it. Per-batch work is one matmul
    over the rows whose (pre-assigned, in-file) list a query probes."""
    import ray
    import ray.data

    _, probe, dirs = ivf_probe_plan(index_dir, queries, n_probe)
    qn = queries.astype(np.float64)
    qn = qn / np.linalg.norm(qn, axis=1, keepdims=True)
    ref = ray.put((qn, np.asarray(query_ids), probe))

    empty = pd.DataFrame(
        {"query_id": pd.Series([], dtype="int64"),
         "neighbor_id": pd.Series([], dtype="int64"),
         "cosine": pd.Series([], dtype="float64")}
    )
    if not dirs:
        return empty.assign(rank=pd.Series([], dtype="int64"))[
            ["query_id", "neighbor_id", "rank"]
        ]

    def partial(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _EMPTY_PARTIAL
        q, qids, pr = ray.get(ref)
        v = _vec_matrix(t[vec_col])
        vn = v / np.linalg.norm(v, axis=1, keepdims=True)
        lids = t["lid"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out_q, out_n, out_c = [], [], []
        for qi in range(len(q)):
            m = np.isin(lids, pr[qi])
            if not m.any():
                continue
            sim = q[qi] @ vn[m].T
            sub_ids = ids[m]
            kk = min(k + (1 if exclude_self else 0), len(sub_ids))
            part = np.argpartition(-sim, kk - 1)[:kk]
            out_q.append(np.full(kk, qids[qi], dtype=np.int64))
            out_n.append(sub_ids[part])
            out_c.append(sim[part])
        if not out_q:
            return _EMPTY_PARTIAL
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                "cosine": pa.array(np.concatenate(out_c), pa.float64()),
            }
        )

    ds = ray.data.read_parquet(
        _dir_files(dirs), columns=[id_col, vec_col, "lid"]
    )
    partials = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if exclude_self:
        partials = partials[partials["query_id"] != partials["neighbor_id"]]
    partials = partials.sort_values(
        ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True],
        kind="stable",
    )
    top = partials.groupby("query_id").head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "neighbor_id", "rank"]]


def knn_ivf(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    centroids: np.ndarray,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
):
    """IVF approximate top-k, SCAN-based: each batch routes its vectors to
    their nearest centroid and only compares against queries probing that
    list (compute pruning only — every byte is still read). Prefer
    ``build_ivf_index`` + ``knn_ivf_index`` when the same table serves many
    query batches; keep this form for one-shot queries where an index
    build would cost more than the scan. Centroids and queries broadcast
    once (ray.put); per-batch work is one matmul over the subset of rows
    whose list is probed."""
    import ray

    qn = queries.astype(np.float64)
    qn = qn / np.linalg.norm(qn, axis=1, keepdims=True)
    # which lists each query probes
    qd = ((qn[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    probe = np.argsort(qd, axis=1)[:, :n_probe]  # (nq, n_probe)
    ref = ray.put((qn, np.asarray(query_ids), centroids, probe))

    def partial(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _EMPTY_PARTIAL
        q, qids, cent, pr = ray.get(ref)
        v = _vec_matrix(t[vec_col])
        # |v|^2 - 2 v.c + |c|^2 via one matmul (no nb×K×dim temporary)
        d = (
            (v * v).sum(axis=1)[:, None]
            - 2.0 * (v @ cent.T)
            + (cent * cent).sum(axis=1)[None, :]
        )
        lists = d.argmin(axis=1)
        vn = v / np.linalg.norm(v, axis=1, keepdims=True)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out_q, out_n, out_c = [], [], []
        for qi in range(len(q)):
            m = np.isin(lists, pr[qi])
            if not m.any():
                continue
            sim = q[qi] @ vn[m].T
            sub_ids = ids[m]
            kk = min(k + (1 if exclude_self else 0), len(sub_ids))
            part = np.argpartition(-sim, kk - 1)[:kk]
            out_q.append(np.full(kk, qids[qi], dtype=np.int64))
            out_n.append(sub_ids[part])
            out_c.append(sim[part])
        if not out_q:
            return _EMPTY_PARTIAL
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                "cosine": pa.array(np.concatenate(out_c), pa.float64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if exclude_self:
        partials = partials[partials["query_id"] != partials["neighbor_id"]]
    partials = partials.sort_values(
        ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True],
        kind="stable",
    )
    top = partials.groupby("query_id").head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "neighbor_id", "rank"]]


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (random hyperplanes; the other classic scale path next to
# IVF — data-independent, so there is NO training pass at all)
# ---------------------------------------------------------------------------


def lsh_planes(
    dim: int, n_tables: int = 12, n_bits: int = 8, seed: int = 7
) -> np.ndarray:
    """Seeded random hyperplanes for ``n_tables`` sign-LSH tables of
    ``n_bits`` bits each: (n_tables, n_bits, dim) float64. Data-independent
    (Charikar sign-LSH), so index-side and query-side codes agree by seed
    alone — nothing is trained, nothing is broadcast but this array."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_bits, dim))


def lsh_codes(v: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n, dim) vectors -> (n, n_tables) int64 bucket codes: one fused
    matmul against all tables' hyperplanes, sign bits packed little-endian.
    Cosine-LSH collision law: P[bit agrees] = 1 - angle/pi."""
    L, b, dim = planes.shape
    proj = v @ planes.reshape(L * b, dim).T  # (n, L*b), one matmul
    bits = (proj > 0).reshape(len(v), L, b)
    w = (1 << np.arange(b, dtype=np.int64))
    return (bits * w).sum(axis=2)


def _probe_codes(qcodes: np.ndarray, n_bits: int, multiprobe: int = 1):
    """Per-query probe sets: each query's own bucket per table plus every
    bucket within Hamming distance ``multiprobe`` (flip-1 by default) —
    (nq, n_tables, 1 + n_bits) for multiprobe=1. Multiprobe trades a few
    extra bucket reads for far fewer tables at equal recall (Lv et al.,
    VLDB'07, public multi-probe LSH)."""
    nq, L = qcodes.shape
    probes = [qcodes[:, :, None]]
    if multiprobe >= 1:
        flips = qcodes[:, :, None] ^ (1 << np.arange(n_bits, dtype=np.int64))
        probes.append(flips)
    if multiprobe >= 2:
        pairs = [
            (1 << i) | (1 << j)
            for i in range(n_bits)
            for j in range(i + 1, n_bits)
        ]
        probes.append(qcodes[:, :, None] ^ np.asarray(pairs, dtype=np.int64))
    return np.concatenate(probes, axis=2)


def knn_lsh(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    n_tables: int = 12,
    n_bits: int = 8,
    multiprobe: int = 1,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
):
    """LSH-bucketed approximate top-k cosine neighbors (scan form).

    Per batch: one fused code matmul (``n_tables * n_bits`` dot products per
    row), then the exact cosine matmul runs only over the CANDIDATES — rows
    sharing a probed bucket with a query in at least one table. Candidate
    selection is a vectorized sorted-membership test over all queries'
    probe sets at once; nothing but (query_id, neighbor_id, cosine)
    partial-top-k rows leaves a batch.

    Scale notes: the code matmul pays for itself once the query batch is
    larger than ``n_tables * n_bits`` columns (production ANN serving; for
    a handful of queries ``knn_bruteforce`` is cheaper) — and at warehouse
    scale the same ``bucket = code`` assignment becomes the hive partition
    key, making the probe an I/O prune exactly like ``build_ivf_index``.
    Unlike IVF there is no training pass and no centroid drift: codes are
    reproducible from (dim, n_tables, n_bits, seed) forever, so index-side
    codes computed years apart still collide correctly."""
    import ray

    qn = queries.astype(np.float64)
    qn = qn / np.linalg.norm(qn, axis=1, keepdims=True)
    planes = lsh_planes(queries.shape[1], n_tables, n_bits, seed)
    probe = _probe_codes(lsh_codes(qn, planes), n_bits, multiprobe)
    # per-table sorted probe-code pool over ALL queries (tiny): membership
    # of a row in ANY query's probe set is one searchsorted per table
    pool = [np.unique(probe[:, l, :]) for l in range(probe.shape[1])]
    ref = ray.put((qn, np.asarray(query_ids), planes, probe, pool))

    def partial(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _EMPTY_PARTIAL
        q, qids, pl, pr, po = ray.get(ref)
        v = _vec_matrix(t[vec_col])
        codes = lsh_codes(v, pl)  # (n, L)
        cand = np.zeros(len(v), bool)
        for l in range(codes.shape[1]):
            j = np.searchsorted(po[l], codes[:, l])
            j = np.clip(j, 0, len(po[l]) - 1)
            cand |= po[l][j] == codes[:, l]
        if not cand.any():
            return _EMPTY_PARTIAL
        sel = np.flatnonzero(cand)
        vn = v[sel] / np.linalg.norm(v[sel], axis=1, keepdims=True)
        ccodes = codes[sel]
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)[sel]
        out_q, out_n, out_c = [], [], []
        for qi in range(len(q)):
            # candidate rows FOR THIS query: probe-set hit in >= 1 table
            m = np.zeros(len(sel), bool)
            for l in range(ccodes.shape[1]):
                m |= np.isin(ccodes[:, l], pr[qi, l, :])
            if not m.any():
                continue
            sim = q[qi] @ vn[m].T
            sub_ids = ids[m]
            kk = min(k + (1 if exclude_self else 0), len(sub_ids))
            part = np.argpartition(-sim, kk - 1)[:kk]
            out_q.append(np.full(kk, qids[qi], dtype=np.int64))
            out_n.append(sub_ids[part])
            out_c.append(sim[part])
        if not out_q:
            return _EMPTY_PARTIAL
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                "cosine": pa.array(np.concatenate(out_c), pa.float64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if exclude_self:
        partials = partials[partials["query_id"] != partials["neighbor_id"]]
    partials = partials.sort_values(
        ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True],
        kind="stable",
    )
    top = partials.groupby("query_id").head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "neighbor_id", "rank"]]
