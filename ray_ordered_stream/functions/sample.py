"""Deterministic sampling operators for training-data curation.

Two scale shapes:

- ``hash_sample``: stateless Bernoulli-by-content-hash — each row keeps or
  drops itself from ``md5(id)`` alone, so the operator is a pure
  ``map_batches`` filter with NO shuffle, reproducible across runs,
  machines, and partition counts (the property a 100-TB sample must have:
  re-running the job, or running it at a different parallelism, selects the
  same rows). SQL mirror: ``substr(md5(cast(id AS varchar)),1,8) < '<hex>'``.

- ``stratified_sample``: exact-n per stratum, rows chosen by a
  content-hash order (uniform within the stratum, deterministic): rank by
  ``md5(text)`` ascending with an id tie-break and keep the first n. Reuses
  ``grouped_topk``'s partial-prune + one-shuffle shape — at most n rows per
  (stratum, input block) ever cross the exchange, so a 10^9-row stratum
  ships n rows, not 10^9. SQL mirror:
  ``QUALIFY row_number() OVER (PARTITION BY s ORDER BY md5(text), id) <= n``.

(The reference repo has no sampling operator — its simulator *generates*
skew instead; these are task-mandated training-pipeline extensions.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def hash_fraction_threshold(fraction: float) -> str:
    """8-hex-digit threshold such that uniformly distributed md5 prefixes
    fall under it with probability ``fraction`` (hex string order ==
    numeric order for equal-length strings)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return format(min(int(fraction * 16**8), 16**8 - 1), "08x")


class _HashSampler:
    """Keep rows whose md5(salt + id) 8-hex prefix falls under the fraction
    threshold, through the repo's shared vectorized md5 kernel
    (stream_dedup._fingerprints — DuckDB C++ md5 / hashlib buffer slices).
    The 8-hex-prefix string compare is done numerically: for equal-length
    hex, string order == numeric order, so ``hexdigest()[:8] < thr`` is
    exactly ``(hi >> 32) < int(thr, 16)``. NULL ids never pass (matching
    the SQL mirror, where ``md5(NULL || ...)`` is NULL)."""

    def __init__(self, id_col: str, threshold: str, salt: str = ""):
        self.id_col = id_col
        self.thr_num = np.uint64(int(threshold, 16))
        self.salt = salt

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..stream_dedup import _fingerprints

        ids = t[self.id_col]
        if not pa.types.is_string(ids.type):
            ids = pc.cast(ids, pa.string())
        if self.salt:
            ids = pc.binary_join_element_wise(pa.scalar(self.salt), ids, "")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        hi, _ = _fingerprints(ids)
        keep = (hi >> np.uint64(32)) < self.thr_num
        if ids.null_count:
            keep &= np.asarray(ids.is_valid())
        return t.filter(pa.array(keep))


def hash_sample(ds, fraction: float, id_col: str, salt: str = ""):
    """Deterministic ~``fraction`` sample keyed on ``md5(salt + id_col)``.

    Stateless filter — streams, no shuffle, stable under re-runs and
    re-partitioning. Distinct ``salt`` values draw independent samples of
    the same id space (SQL mirror: ``md5('<salt>' || cast(id AS varchar))``)."""
    thr = hash_fraction_threshold(fraction)
    return ds.map_batches(
        _HashSampler(id_col, thr, salt), batch_format="pyarrow"
    )


def weighted_hash_sample(
    ds,
    id_col: str,
    weight_col: str,
    rate: float,
    scale: float,
    salt: str = "",
):
    """Deterministic WEIGHTED Bernoulli sample: row kept with probability
    ``min(1, rate * weight / scale)``, decided by the md5(salt + id) hash —
    stateless, shuffle-free, stable under re-runs and re-partitioning (the
    importance-sampling step of corpus mixing: long/high-quality documents
    kept at higher rates).

    Exact SQL-mirrorable arithmetic: the per-row threshold is
    ``min(floor(min(1.0, rate * weight / scale) * 2^32), 2^32 - 1)``
    computed in float64 in that operation order, compared against the hash's
    top-32-bit value — DuckDB replays it as
    ``substr(md5(...), 1, 8) < printf('%08x', cast(... as ubigint))``.
    NULL ids never pass (md5(NULL) is NULL in SQL)."""
    if rate < 0 or scale <= 0:
        raise ValueError("rate must be >= 0 and scale > 0")

    def f(t: pa.Table) -> pa.Table:
        from ..stream_dedup import _fingerprints

        ids = t[id_col]
        if not pa.types.is_string(ids.type):
            ids = pc.cast(ids, pa.string())
        if salt:
            ids = pc.binary_join_element_wise(pa.scalar(salt), ids, "")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        hi, _ = _fingerprints(ids)
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        p = np.minimum(1.0, rate * w / scale)
        thr = np.minimum(np.floor(p * 4294967296.0), 4294967295.0)
        keep = (hi >> np.uint64(32)).astype(np.float64) < thr
        if ids.null_count:
            keep &= np.asarray(ids.is_valid())
        return t.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow")


def stratified_sample(
    ds,
    stratum: str,
    n: int,
    text_col: str,
    id_col: str,
    num_partitions: int | None = None,
):
    """Exactly ``n`` rows per stratum (fewer when the stratum is smaller),
    chosen deterministically by md5(text) order with an id tie-break.

    The md5 is folded to its first 16 hex digits as uint64 — hex-string
    order equals numeric order, so ranking by the fold matches the SQL
    oracle's ``ORDER BY md5(text)`` whenever the 64-bit prefixes differ
    (ties fall through to ``id_col``)."""
    from .topk import grouped_topk

    def add_rank_key(t: pa.Table) -> pa.Table:
        from ..stream_dedup import _fingerprints

        # fold = first 8 digest bytes big-endian == the hi half of the
        # shared vectorized kernel's (hi, lo) pair — no per-row hashing
        hi, _ = _fingerprints(t[text_col])
        return t.append_column("_rk", pa.array(hi, pa.uint64()))

    keyed = ds.map_batches(add_rank_key, batch_format="pyarrow")
    picked = grouped_topk(
        keyed, stratum, "_rk", n, tiebreak=id_col, descending=False,
        num_partitions=num_partitions,
    )
    return picked.drop_columns(["_rk"])


def mix_corpora(parts, id_col: str):
    """Weighted deterministic corpus mixing: each source contributes a
    ``hash_sample`` of its rows at its fraction, tagged with a
    ``mix_source`` column, all unioned into one stream — the
    "40% web, 30% code, ..." mixing step of a training-data pipeline,
    reproducible across runs and shuffle-free (sampling is a stateless
    filter; union concatenates block lists lazily).

    ``parts`` is a list of ``(name, dataset, fraction)``; every dataset
    must already share a schema containing ``id_col``."""
    import pyarrow as _pa

    mixed = None
    for name, ds, fraction in parts:
        # per-source salt: the same id space sampled for two sources must
        # draw INDEPENDENT samples, not the same ids twice
        sampled = hash_sample(ds, fraction, id_col, salt=f"{name}:")

        def tag(t: _pa.Table, _name=name) -> _pa.Table:
            return t.append_column(
                "mix_source", _pa.array([_name] * t.num_rows, _pa.string())
            )

        tagged = sampled.map_batches(tag, batch_format="pyarrow")
        mixed = tagged if mixed is None else mixed.union(tagged)
    return mixed


def shuffle_rank(ds, id_col: str, seed: int = 0, num_partitions: int | None = None):
    """Deterministic global shuffle with MATERIALIZED positions: every row
    gets ``shuffle_pos`` = rank of ``md5(f"{seed}:{id}")`` over the whole
    corpus (ties broken by id). Changing ``seed`` gives an independent
    permutation — the reproducible between-epochs shuffle a training
    pipeline needs, stable across re-runs and partition counts (unlike
    ``Dataset.random_shuffle``, whose layout depends on block structure).

    Two passes, NO global sort and NO sampling: md5 prefixes are uniform,
    so FIXED range bounds on the top 16 hash bits give balanced, ORDERED
    range partitions; each partition sorts locally and a final per-partition
    task adds the exclusive prefix-sum offset of earlier partitions'
    counts. Only (id, 16-byte hash) rows ever shuffle."""
    import ray
    import ray.data

    from ..exchange import default_partitions, split_compact

    P = max(2, num_partitions or default_partitions())  # num_returns=2 floor

    def add_hash(t: pa.Table) -> pa.Table:
        from ..stream_dedup import _fingerprints

        # (hi, lo) uint64 pairs via the shared vectorized md5 kernel: the
        # full digest's hex-string ascending order == (hi, lo) numeric
        # ascending order (big-endian halves), and int(hex[:4], 16) ==
        # hi >> 48 — so ordering and bucketing are bit-identical to the
        # old hex columns at half the shuffled bytes.
        ids = t[id_col]
        if not pa.types.is_string(ids.type):
            ids = pc.cast(ids, pa.string())
        # NULL ids coalesce to "" BEFORE salting so their rank key stays
        # seed-dependent ("changing seed gives an independent permutation"
        # must hold for every row; a post-salt null would hash identically
        # across seeds)
        ids = pc.coalesce(ids, "")
        salted = pc.binary_join_element_wise(pa.scalar(f"{seed}:"), ids, "")
        if isinstance(salted, pa.ChunkedArray):
            salted = salted.combine_chunks()
        hi, lo = _fingerprints(salted)
        return pa.table(
            {
                id_col: t[id_col],
                "_h1": pa.array(hi, pa.uint64()),
                "_h2": pa.array(lo, pa.uint64()),
                "_hp": pa.array(
                    (hi >> np.uint64(48)).astype(np.int64), pa.int64()
                ),
            }
        )

    hashed = ds.select_columns([id_col]).map_batches(
        add_hash, batch_format="pyarrow"
    )

    @ray.remote
    def split(*tbls: pa.Table) -> list[pa.Table]:
        real = [t for t in tbls if t.num_rows]
        if not real:
            e = tbls[0].slice(0, 0) if tbls else pa.table({})
            return [e] * P
        tbl = (
            pa.concat_tables(real, promote_options="none")
            if len(real) > 1
            else real[0]
        )
        parts = (
            tbl["_hp"].to_numpy(zero_copy_only=False) * P
        ) // 65536  # ordered range buckets; uniform by construction
        return split_compact(tbl, parts, P)

    @ray.remote(num_returns=2)
    def local_sort(*shards: pa.Table):
        real = [t for t in shards if t.num_rows]
        if not real:
            e = shards[0].slice(0, 0) if shards else pa.table({})
            return e, 0
        tbl = (
            pa.concat_tables(real, promote_options="none")
            if len(real) > 1
            else real[0]
        )
        tbl = tbl.sort_by(
            [("_h1", "ascending"), ("_h2", "ascending"), (id_col, "ascending")]
        )
        return tbl, tbl.num_rows

    @ray.remote
    def add_offset(off: int, tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: tbl[id_col],
                "shuffle_pos": pa.array(
                    off + np.arange(tbl.num_rows, dtype=np.int64), pa.int64()
                ),
            }
        )

    block_refs = list(hashed.to_arrow_refs())
    if not block_refs:
        return ds.select_columns([id_col])
    n_map = max(1, min(len(block_refs), 2 * P))
    groups = [
        list(g)
        for g in np.array_split(np.array(block_refs, dtype=object), n_map)
        if len(g)
    ]
    per_group = [split.options(num_returns=P).remote(*g) for g in groups]
    sorted_refs, count_refs = [], []
    for p in range(P):
        t_ref, c_ref = local_sort.remote(*[pg[p] for pg in per_group])
        sorted_refs.append(t_ref)
        count_refs.append(c_ref)
    counts = ray.get(count_refs)  # P ints — the only driver-side data
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    out = [
        add_offset.remote(int(offsets[p]), sorted_refs[p]) for p in range(P)
    ]
    return ray.data.from_arrow_refs(out)
