"""Per-label embedding centroids and intra-label cosine cohesion.

The cluster-quality audit a curation pipeline runs over labeled/bucketed
embeddings (topic clusters, dedup buckets, IVF cells): the centroid of
every label and how tightly its members hug it. Two streaming passes:

  1. centroid pass — each block reduces to (label, count, sum-vector)
     partials (sort + ``np.add.reduceat`` over the zero-copy reshaped
     value buffer); only L x (dim+1) doubles per block cross the wire and
     the driver folds P such partials (labels are assumed to be a small
     set — topics/buckets — NOT per-document ids);
  2. cohesion pass — centroids broadcast once via ``ray.put``, each block
     computes member->centroid cosines with one matmul and reduces to
     per-label (n, sum, min) partials; a scalar groupby finishes.

The full embedding matrix never concentrates anywhere and never crosses
the object store a second time.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _matrix(col) -> np.ndarray:
    """Vector column -> (n, dim) float64 matrix, zero-copy reshape when the
    list widths are uniform (the common case; already-float64 values come
    back as a read-only VIEW of the Arrow buffer — no caller mutates in
    place). Normalizes every embedding shape a caller can hold here —
    chunked, Ray tensor-extension, fixed_size_list, sliced, empty — so call
    sites never carry their own guards."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.ExtensionArray):  # e.g. Ray's ArrowTensorArray
        col = col.storage
    if pa.types.is_fixed_size_list(col.type):
        # cheap cast: builds only the offsets vector, values buffer shared
        col = col.cast(pa.list_(col.type.value_type))
    if len(col) == 0:
        return np.zeros((0, 0), dtype=np.float64)
    if not hasattr(col, "offsets"):
        return np.asarray(col.to_numpy(zero_copy_only=False)).astype(
            np.float64, copy=False
        )
    offsets = np.asarray(col.offsets)
    widths = np.diff(offsets)
    if (widths == widths[0]).all():
        flat = np.asarray(col.values)
        lo = offsets[0]
        return (
            flat[lo : lo + widths[0] * len(widths)]
            .reshape(len(widths), widths[0])
            .astype(np.float64, copy=False)
        )
    return np.stack([np.asarray(v) for v in col.to_pylist()]).astype(np.float64)


def _centroid_partial(t: pa.Table, label_col: str, vec_col: str):
    labels = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
    vecs = _matrix(t[vec_col])
    order = np.argsort(labels, kind="stable")
    ls = labels[order]
    starts = np.flatnonzero(np.concatenate([[True], ls[1:] != ls[:-1]]))
    sums = np.add.reduceat(vecs[order], starts, axis=0)
    counts = np.diff(np.append(starts, len(ls)))
    return ls[starts], counts.astype(np.int64), sums


def label_centroids(ds=None, label_col: str = "label",
                    vec_col: str = "embedding", *, refs=None):
    """dict label -> (count, centroid ndarray). Driver-side result is
    O(labels x dim) — small by assumption (see module docstring).
    ``refs`` lets a caller that already materialized the dataset's block
    refs share them (one parquet decode for multi-pass consumers)."""
    if refs is None:
        refs = ds.to_arrow_refs()

    @ray.remote
    def partial(t: pa.Table):
        if not t.num_rows:
            return None
        return _centroid_partial(t, label_col, vec_col)

    parts = [p for p in ray.get([partial.remote(b) for b in refs])
             if p is not None]
    if not parts:
        return {}
    # vectorized fold: concatenate all block partials, reduceat by label
    labs = np.concatenate([p[0] for p in parts])
    cnts = np.concatenate([p[1] for p in parts])
    sums = np.concatenate([p[2] for p in parts], axis=0)
    order = np.argsort(labs, kind="stable")
    labs, cnts, sums = labs[order], cnts[order], sums[order]
    starts = np.flatnonzero(np.concatenate([[True], labs[1:] != labs[:-1]]))
    tot_c = np.add.reduceat(cnts, starts)
    tot_s = np.add.reduceat(sums, starts, axis=0)
    return {
        int(l): (int(c), s / c)
        for l, c, s in zip(labs[starts], tot_c, tot_s)
    }


def centroid_cohesion(
    ds, label_col: str = "label", vec_col: str = "embedding",
    round_to: int = 6,
):
    """Per-label cosine cohesion vs the label centroid:
    ``(label, n, mean_cos, min_cos)``. SQL mirror: parallel-unnest
    centroid CTE + ``list_cosine_similarity`` (queries.SQL_EMB_COHESION).
    """
    # One dataset execution feeds BOTH passes: the centroid partials and
    # the cosine scoring read the same materialized blocks (the second
    # pass previously re-ran the parquet read + decode).
    refs = ds.to_arrow_refs()
    cents = label_centroids(label_col=label_col, vec_col=vec_col, refs=refs)
    labs = np.array(sorted(cents), dtype=np.int64)
    mat = np.stack([cents[l][1] for l in labs]) if len(labs) else np.zeros((0, 0))
    cent_ref = ray.put((labs, mat, np.linalg.norm(mat, axis=1)))

    class Cos:
        def __init__(self, ref):
            self.labs, self.mat, self.cnorm = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            if not t.num_rows:
                return pa.table(
                    {
                        label_col: pa.array([], pa.int64()),
                        "cos": pa.array([], pa.float64()),
                    }
                )
            labels = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
            vecs = _matrix(t[vec_col])
            idx = np.searchsorted(self.labs, labels)
            c = self.mat[idx]
            num = np.einsum("ij,ij->i", vecs, c)
            den = np.linalg.norm(vecs, axis=1) * self.cnorm[idx]
            cos = np.divide(num, den, out=np.zeros_like(num), where=den > 0)
            return pa.table(
                {
                    label_col: pa.array(labels, pa.int64()),
                    "cos": pa.array(cos, pa.float64()),
                }
            )

    scored = ray.data.from_arrow_refs(list(refs)).map_batches(
        Cos, batch_format="pyarrow", concurrency=2,
        fn_constructor_args=(cent_ref,),
    )
    from ..agg import exchange_groupby

    agg = exchange_groupby(
        scored,
        label_col,
        {
            "n": (None, "count"),
            "_sum": ("cos", "sum"),
            "_min": ("cos", "min"),
        },
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                label_col: df[label_col].astype("int64"),
                "n": df["n"].astype("int64"),
                "mean_cos": np.round(df["_sum"] / df["n"], round_to),
                "min_cos": np.round(df["_min"], round_to),
            }
        )

    return agg.map_batches(finish, batch_format="pandas")


def projection_matrix(in_dim: int, out_dim: int, seed: int = 42) -> np.ndarray:
    """Deterministic Gaussian random-projection matrix (out_dim x in_dim),
    scaled 1/sqrt(out_dim) (Johnson-Lindenstrauss: pairwise distances are
    preserved within ~1/sqrt(out_dim))."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((out_dim, in_dim)) / np.sqrt(out_dim)


def random_projection(
    ds,
    in_dim: int,
    out_dim: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
):
    """Project embeddings to ``out_dim`` dims: one matmul per batch against
    a broadcast seeded matrix — the dimensionality-reduction step before
    cheap ANN / clustering at scale. Output columns ``d0..d{out_dim-1}``
    (scalar columns, not a list, so results hash directly). The matrix is
    a pure function of (in_dim, out_dim, seed); the SQL mirror inlines the
    identical values as literals (queries.SQL_EMB_PROJECT)."""
    import ray

    R = projection_matrix(in_dim, out_dim, seed)
    ref = ray.put(R)

    class Project:
        def __init__(self, r):
            self.R = ray.get(r)

        def __call__(self, t: pa.Table) -> pa.Table:
            cols = {id_col: t[id_col]}
            if t.num_rows:
                v = _matrix(t[vec_col])
                out = np.round(v @ self.R.T, round_to)
            else:
                out = np.zeros((0, out_dim))
            for j in range(out_dim):
                cols[f"d{j}"] = pa.array(out[:, j], pa.float64())
            return pa.table(cols)

    return ds.map_batches(
        Project, batch_format="pyarrow", concurrency=2,
        fn_constructor_args=(ref,),
    )


def gram_matrix_int(ds, vec_col: str = "embedding", scale: int = 1000,
                    num_partitions: int | None = None):
    """Distributed EXACT gram matrix over integer-quantized embeddings —
    the scale path to PCA/whitening (the d x d gram is all PCA needs; the
    corpus never concentrates).

    Each element quantizes as ``floor(x * scale)`` (int-valued, so every
    per-block product and partial sum is exactly representable in float64:
    |q| <= scale, products <= scale^2, a 10^5-row block sums to ~1e11 <<
    2^53), each block reduces to ONE d x d matmul (BLAS — order-free
    because the arithmetic is exact), and the d(d+1)/2 upper-triangle
    (i, j, s) partials merge through one tiny exchange. int64 holds the
    global sums up to ~10^12 rows at scale=1000 (s <= n * scale^2).

    Returns a Dataset with columns (i, j, s): 0-based indices, i <= j."""
    from ..agg import exchange_groupby

    def part(t: pa.Table) -> pa.Table:
        V = _matrix(t[vec_col])
        if V.size == 0:
            return pa.table({
                "i": pa.array([], pa.int64()),
                "j": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
            })
        Q = np.floor(V * np.float64(scale))
        G = (Q.T @ Q).astype(np.int64)
        d = G.shape[0]
        iu, ju = np.triu_indices(d)
        return pa.table({
            "i": pa.array(iu.astype(np.int64)),
            "j": pa.array(ju.astype(np.int64)),
            "s": pa.array(G[iu, ju]),
        })

    parts = ds.map_batches(part, batch_format="pyarrow")
    return exchange_groupby(
        parts, ["i", "j"], {"s": ("s", "sum")},
        num_partitions=num_partitions,
    )


def int8_quantize_stats(ds, id_col: str = "vec_id",
                        vec_col: str = "embedding"):
    """Per-vector symmetric int8 quantization audit (the PQ/int8 ANN
    compression step): ``scale = max|x| / 127``, ``code = floor(x / scale
    + 0.5)`` (explicit half-up floor — deterministic in IEEE doubles on
    every engine, unlike round()'s half-even vs half-away split). Emits
    (id, scale, code_sum, n_sat): the exact-integer code sum anchors the
    hash, n_sat counts saturated codes (|code| = 127). Zero vectors get
    scale 0 and all-zero codes. Pure per-block map — no shuffle."""

    def part(t: pa.Table) -> pa.Table:
        V = _matrix(t[vec_col])
        ids = t[id_col]
        if V.size == 0:
            return pa.table({
                id_col: ids,
                "scale": pa.array(
                    np.zeros(t.num_rows, dtype=np.float64)
                ),
                "code_sum": pa.array(
                    np.zeros(t.num_rows, dtype=np.int64)
                ),
                "n_sat": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            })
        amax = np.abs(V).max(axis=1)
        sc = amax / np.float64(127.0)
        safe = np.where(sc > 0, sc, 1.0)
        codes = np.floor(V / safe[:, None] + 0.5)
        codes[sc == 0] = 0.0
        return pa.table({
            id_col: ids,
            "scale": pa.array(sc),
            "code_sum": pa.array(codes.sum(axis=1).astype(np.int64)),
            "n_sat": pa.array(
                (np.abs(codes) == 127.0).sum(axis=1).astype(np.int64)
            ),
        })

    return ds.map_batches(part, batch_format="pyarrow")
