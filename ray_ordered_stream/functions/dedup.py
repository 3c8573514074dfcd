"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale notes (100 TB design):
- exact dedup = content-hash in a vectorized ``map_batches`` + ONE
  ``groupby(hash)`` shuffle of (hash, id) pairs only — never the payload;
- MinHash/LSH = per-batch signature computation (numpy), explode to
  (band, band_hash, doc_id) rows, ``groupby`` the bands, verify candidate
  pairs by exact Jaccard inside the group — payload never shuffles, only
  signatures;
- SimHash buckets by the 16-bit prefix of the 64-bit signature;
- embedding near-dup brute-forces cosine inside LSH-style buckets.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

_M61 = (1 << 61) - 1


def _stable_u64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def add_content_hash(ds, text_col: str = "text", out: str = "content_hash"):
    def f(b: pd.DataFrame) -> pd.DataFrame:
        b[out] = b[text_col].map(lambda s: hashlib.md5(s.encode()).hexdigest())
        return b

    return ds.map_batches(f, batch_format="pandas")


def exact_dedup_groups(ds, id_col: str = "doc_id", text_col: str = "text"):
    """One row per distinct content: (content_hash, keep_id=min id, n_dups)."""
    from ray.data.aggregate import Count, Min

    hashed = add_content_hash(ds, text_col).select_columns([id_col, "content_hash"])
    return hashed.groupby("content_hash").aggregate(
        Min(id_col, alias_name="keep_id"), Count(alias_name="n_docs")
    )


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Keep the first (min id) document of each distinct content; payload
    stays distributed — only (hash, id) pairs shuffle, then the keep-set
    broadcasts back as a filter."""
    import ray

    keep = exact_dedup_groups(ds, id_col, text_col).select_columns(["keep_id"])
    keep_ids = set(keep.to_pandas()["keep_id"])  # small: one per distinct doc
    keep_ref = ray.put(keep_ids)

    def f(b: pd.DataFrame) -> pd.DataFrame:
        ids = ray.get(keep_ref)
        return b[b[id_col].isin(ids)]

    return ds.map_batches(f, batch_format="pandas")


# ---------------------------------------------------------------------------
# shingles + MinHash + LSH
# ---------------------------------------------------------------------------


_POLY_BASE = np.uint64(1099511628211)  # FNV prime; u64 arithmetic wraps


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Character k-gram shingle hash set (u64), fully vectorized: one
    polynomial rolling hash over the byte string instead of a Python hash
    call per k-gram (was the hot spot: ~2000 md5 calls per document)."""
    t = " ".join(text.lower().split())
    b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    if len(b) < k:
        return np.array([_stable_u64(t)], dtype=np.uint64)
    n = len(b) - k + 1
    h = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        h = h * _POLY_BASE + b[j : j + n]
    return np.unique(h)


class MinHasher:
    """Per-actor state: the (a, b) hash-family parameters (seeded)."""

    def __init__(self, num_perm: int = 64, k: int = 5, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _M61, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _M61, size=num_perm, dtype=np.uint64)
        self.k = k
        self.num_perm = num_perm

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k).astype(np.uint64)
        # (a*x + b) mod M61 over the shingle set, min per permutation
        vals = (sh[None, :] * self.a[:, None] + self.b[:, None]) % np.uint64(_M61)
        return vals.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack([self.signature(t) for t in batch["text"]])
        batch["minhash"] = list(sigs)
        return batch


def minhash_lsh_candidates(
    ds,
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 8,
    k: int = 7,
    seed: int = 7,
    max_bucket: int = 2048,
):
    """Candidate near-dup pairs via banded MinHash-LSH.

    signature -> split into ``bands`` bands -> (band_id, band_hash, id) rows
    -> groupby band bucket -> pairs within bucket. Returns a Dataset of
    (id_a, id_b, est_jaccard) with id_a < id_b, deduplicated across bands by
    a final groupby.
    """
    rows_per_band = num_perm // bands

    def to_bands(b: pd.DataFrame) -> pd.DataFrame:
        mh = MinHasher(num_perm, k, seed)
        sigs = np.stack([mh.signature(t) for t in b["text"]])  # (n, num_perm)
        n = len(b)
        band_ids = np.repeat(np.arange(bands), n)
        ids = np.tile(b[id_col].to_numpy(), bands)
        hashes = []
        for band in range(bands):
            seg = sigs[:, band * rows_per_band : (band + 1) * rows_per_band]
            hashes.append(
                np.array([hash(tuple(r)) & 0x7FFFFFFFFFFFFFFF for r in seg], dtype=np.int64)
            )
        sig_lists = list(np.tile(sigs, (bands, 1)))
        return pd.DataFrame(
            {
                "band_id": band_ids,
                "band_hash": np.concatenate(hashes),
                id_col: ids,
                "minhash": sig_lists,
            }
        )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
             "est_jaccard": pd.Series(dtype="float64")}
        )
        if len(g) < 2:
            return empty
        if len(g) > max_bucket:
            # NOT silent: a bucket this big means the banding is not
            # selective for this corpus — log and skip rather than O(b^2).
            import logging

            logging.getLogger(__name__).warning(
                "minhash-lsh: dropping bucket of %d docs (> max_bucket=%d)",
                len(g), max_bucket,
            )
            return empty
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        sigs = np.stack(g["minhash"].to_numpy())  # (b, num_perm)
        eq = (sigs[:, None, :] == sigs[None, :, :]).mean(axis=2)
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame(
            {"id_a": ids[ia].astype("int64"), "id_b": ids[ib].astype("int64"),
             "est_jaccard": eq[ia, ib]}
        )

    from ray.data.aggregate import Max

    banded = ds.map_batches(to_bands, batch_format="pandas")
    pairs = banded.groupby(["band_id", "band_hash"]).map_groups(
        pairs_in_bucket, batch_format="pandas"
    )
    # a pair can surface from several bands -> dedup
    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Max("est_jaccard", alias_name="est_jaccard")
    )


def ngram_jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact character-k-gram Jaccard (verification kernel for LSH
    candidates)."""
    a = set(map(int, _shingle_hashes(text_a, k)))
    b = set(map(int, _shingle_hashes(text_b, k)))
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def near_dup_pairs(
    ds, threshold: float = 0.7, id_col: str = "doc_id", k: int = 7, **lsh_kw
):
    """MinHash-LSH candidates filtered by estimated Jaccard >= threshold.
    (For exact verification join texts back by id and apply
    ``ngram_jaccard`` — the estimate is within ~1/sqrt(num_perm).)"""
    cands = minhash_lsh_candidates(ds, id_col=id_col, k=k, **lsh_kw)

    def f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater_equal(t["est_jaccard"], threshold))

    return cands.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash over word tokens; bucket key = top 16 bits."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sims = np.fromiter(
            (self.simhash(t) for t in batch["text"]), dtype=np.uint64, count=len(batch)
        )
        batch["simhash"] = sims.astype("int64")  # reinterpret for Arrow
        batch["simhash_bucket"] = (sims >> np.uint64(48)).astype("int64")
        return batch

    @staticmethod
    def simhash(text: str) -> int:
        acc = np.zeros(64, dtype=np.int64)
        for w in text.lower().split():
            h = _stable_u64(w)
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits.astype(bool), 1, -1)
        out = np.uint64(0)
        for i in np.flatnonzero(acc > 0):
            out |= np.uint64(1) << np.uint64(i)
        return int(out)


def simhash(ds):
    return ds.map_batches(SimHasher, batch_format="pandas", concurrency=(1, 4))


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_near_dups(
    ds, threshold: float = 0.95, id_col: str = "vec_id", vec_col: str = "embedding",
    num_buckets: int = 8, seed: int = 13,
):
    """Near-duplicate vectors by cosine >= threshold, bucketed by a random
    hyperplane LSH (sign of projections onto log2(num_buckets) planes) so
    only same-bucket pairs are compared. Recall is per-bucket (true dups
    nearly always share all signs at threshold ~0.95)."""
    n_planes = max(1, int(np.log2(num_buckets)))

    class Bucketer:
        def __init__(self):
            self.planes = None

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            v = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            if self.planes is None:
                rng = np.random.default_rng(seed)
                self.planes = rng.standard_normal((v.shape[1], n_planes))
            signs = (v @ self.planes) > 0
            bucket = (signs * (1 << np.arange(n_planes))).sum(axis=1)
            return pd.DataFrame(
                {id_col: b[id_col], vec_col: b[vec_col], "bucket": bucket.astype("int64")}
            )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(
                {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
                 "cosine": pd.Series(dtype="float64")}
            )
        g = g.sort_values(id_col)
        v = np.stack(g[vec_col].to_numpy()).astype(np.float64)
        v = v / np.linalg.norm(v, axis=1, keepdims=True)
        sim = v @ v.T
        ids = g[id_col].to_numpy()
        ia, ib = np.triu_indices(len(ids), k=1)
        m = sim[ia, ib] >= threshold
        return pd.DataFrame(
            {"id_a": ids[ia[m]], "id_b": ids[ib[m]], "cosine": sim[ia[m], ib[m]]}
        )

    bucketed = ds.map_batches(Bucketer, batch_format="pandas", concurrency=(1, 4))
    return bucketed.groupby("bucket").map_groups(pairs, batch_format="pandas")
