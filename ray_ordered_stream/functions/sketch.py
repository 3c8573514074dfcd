"""Sketch aggregates for 100-TB-scale profiling: HyperLogLog distinct
counting and distributed quantiles with an exact rank certificate.

Task-mandated training-data extensions (no reference counterpart — the
reference delegates analytics to BigQuery SQL, README.md:105-140). Both
operators are deterministic (fixed FNV-1a / splitmix64 hashing, seeded
nothing), mergeable, and never materialize data on the driver beyond
O(blocks) partial rows:

- ``approx_distinct``: per-batch HLL register partials (one m-byte row per
  block) -> elementwise-max merge of the tiny partials -> bias-corrected
  estimate. Registers, not values, cross the wire.
- ``distributed_quantiles``: per-block evenly-spaced sorted candidates ->
  one counting pass (#values <= candidate, vectorized searchsorted per
  block) -> smallest candidate covering the target rank. Rank error is
  bounded by N / candidates_per_block and the EXACT rank of the chosen
  value is returned, so callers can certify the bound (the oracled query
  does exactly that).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..partitioning import hash_string_array


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix of int64/uint64 values (splitmix64 finalizer)."""
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z += np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
    return z


def _hash_column(col) -> np.ndarray:
    """64-bit deterministic hash of a string or integer Arrow column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        # FNV-1a avalanches weakly in the high bits on short keys, and HLL
        # takes its bucket index from the TOP p bits — finalize with
        # splitmix64 for full-width dispersion
        return _splitmix64(hash_string_array(col))
    if pa.types.is_floating(col.type):
        # hash the IEEE bit pattern (a lossy int cast would both truncate
        # and collide distinct values)
        bits = (
            col.cast(pa.float64())
            .to_numpy(zero_copy_only=False)
            .view(np.int64)
        )
        return _splitmix64(bits)
    return _splitmix64(col.cast(pa.int64()).to_numpy(zero_copy_only=False))


class HLL:
    """Mergeable HyperLogLog with 2^p registers. p >= 11 keeps the
    64-p sub-bucket bits within float64's 53-bit exact-integer range so the
    vectorized floor(log2) rho is exact. Relative error ~= 1.04 / sqrt(2^p)."""

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        if not 11 <= p <= 16:
            raise ValueError("p must be in [11, 16]")
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers.astype(np.uint8, copy=True)
            if registers is not None
            else np.zeros(self.m, dtype=np.uint8)
        )

    def add_hashes(self, h: np.ndarray) -> "HLL":
        if not len(h):
            return self
        p = np.uint64(self.p)
        idx = (h >> (np.uint64(64) - p)).astype(np.int64)
        bits = h & np.uint64((1 << (64 - self.p)) - 1)
        # rho = position of the leftmost 1 in the low 64-p bits (1-based
        # from the top); all-zero bits -> 64-p+1
        fl = np.zeros(len(bits), dtype=np.int64)
        nz = bits > 0
        fl[nz] = np.floor(np.log2(bits[nz].astype(np.float64))).astype(np.int64)
        rho = np.where(nz, (64 - self.p) - fl, (64 - self.p) + 1).astype(np.int64)
        order = np.argsort(idx, kind="stable")
        idx_s, rho_s = idx[order], rho[order]
        b = np.empty(len(idx_s), dtype=bool)
        b[0] = True
        b[1:] = idx_s[1:] != idx_s[:-1]
        starts = np.flatnonzero(b)
        best = np.maximum.reduceat(rho_s, starts)
        regs = idx_s[starts]
        self.registers[regs] = np.maximum(
            self.registers[regs], np.minimum(best, 255).astype(np.uint8)
        )
        return self

    def add_column(self, col) -> "HLL":
        return self.add_hashes(_hash_column(col))

    def merge(self, other: "HLL") -> "HLL":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        e = alpha * m * m / np.sum(np.power(2.0, -self.registers.astype(np.float64)))
        v = int(np.sum(self.registers == 0))
        if e <= 2.5 * m and v > 0:  # small-range (linear counting) correction
            return m * np.log(m / v)
        return float(e)


def approx_distinct(ds, col: str, p: int = 12) -> float:
    """Distributed HLL distinct count of ``ds[col]``. One m-byte register row
    leaves each block; the merge is an elementwise max over O(blocks) tiny
    rows (driver-side by design — registers, never values)."""

    def partial(t: pa.Table) -> pa.Table:
        h = HLL(p).add_column(t[col])
        return pa.table(
            {"registers": pa.array([h.registers], pa.list_(pa.uint8(), h.m))}
        )

    parts = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow"
    ).take_all()
    out = HLL(p)
    for row in parts:
        out.merge(HLL(p, registers=np.asarray(row["registers"], dtype=np.uint8)))
    return out.estimate()


def distributed_quantiles(
    ds,
    col: str,
    qs: list[float],
    candidates_per_block: int = 128,
) -> dict[float, dict]:
    """Exact-rank-certified distributed quantiles.

    Two streaming passes, no global sort: (1) each block contributes its
    sorted values at ``candidates_per_block`` evenly spaced ranks; (2) one
    counting pass computes, per block, how many values are <= each candidate
    (vectorized searchsorted), summed into exact global ranks. The reported
    value for q is the smallest candidate whose rank covers ceil(q * n);
    its true rank is off the target by at most N / candidates_per_block
    (adjacent candidates of one block bracket <= stride of its values, summed
    over blocks). Returns {q: {"value", "rank", "n", "max_rank_err"}}.
    """
    import ray

    proj = ds.select_columns([col])

    def cand(t: pa.Table) -> pa.Table:
        v = np.sort(t[col].to_numpy(zero_copy_only=False))
        v = v[~np.isnan(v)] if v.dtype.kind == "f" else v
        if not len(v):
            return pa.table({"c": pa.array([], pa.float64())})
        k = min(candidates_per_block, len(v))
        pos = ((np.arange(k) + 1) * len(v)) // k - 1
        return pa.table({"c": pa.array(v[pos].astype(np.float64))})

    cdf = proj.map_batches(cand, batch_format="pyarrow").to_pandas()
    cands = np.unique(cdf["c"].to_numpy()) if "c" in cdf.columns else np.zeros(0)
    if not len(cands):
        return {q: {"value": None, "rank": 0, "n": 0, "max_rank_err": 0} for q in qs}
    cands_ref = ray.put(cands)

    def count_le(t: pa.Table) -> pa.Table:
        cs = ray.get(cands_ref)
        v = np.sort(t[col].to_numpy(zero_copy_only=False).astype(np.float64))
        v = v[~np.isnan(v)]
        le = np.searchsorted(v, cs, side="right").astype(np.int64)
        return pa.table(
            {
                "le": pa.array([le], pa.list_(pa.int64(), len(cs))),
                "n": pa.array([len(v)], pa.int64()),
            }
        )

    parts = proj.map_batches(count_le, batch_format="pyarrow").take_all()
    ranks = np.zeros(len(cands), dtype=np.int64)
    n = 0
    for row in parts:
        ranks += np.asarray(row["le"], dtype=np.int64)
        n += int(row["n"])
    out = {}
    for q in qs:
        target = max(1, int(np.ceil(q * n)))
        i = int(np.searchsorted(ranks, target, side="left"))
        i = min(i, len(cands) - 1)
        out[q] = {
            "value": float(cands[i]),
            "rank": int(ranks[i]),
            "n": n,
            "max_rank_err": -(-n // candidates_per_block),
        }
    return out


def exact_percentiles(
    ds,
    col: str,
    qs: list[float],
    candidates_per_block: int = 128,
) -> dict[float, float | None]:
    """EXACT interpolated percentiles (SQL ``percentile_cont``) without a
    global sort: three streaming passes.

    (1) candidate pass and (2) counting pass are ``distributed_quantiles``'s
    machinery — evenly-spaced per-block candidates, then exact global ranks
    for every candidate via per-block searchsorted. (3) For each needed
    order statistic (the floor/ceil ranks of ``h = (n-1)·q``), the bracket
    between the two candidates enclosing that rank is collected exactly —
    at most ~n/candidates_per_block values per bracket cross the wire, NOT
    the column — and the order statistic is read off the sorted bracket.
    Linear interpolation between the two statistics finishes percentile_cont
    semantics. NaNs/NULLs drop (SQL ignores them)."""
    import ray

    proj = ds.select_columns([col])

    def cand(t: pa.Table) -> pa.Table:
        v = np.sort(t[col].to_numpy(zero_copy_only=False).astype(np.float64))
        v = v[~np.isnan(v)]
        if not len(v):
            return pa.table({"c": pa.array([], pa.float64())})
        k = min(candidates_per_block, len(v))
        pos = ((np.arange(k) + 1) * len(v)) // k - 1
        return pa.table({"c": pa.array(v[pos])})

    cdf = proj.map_batches(cand, batch_format="pyarrow").to_pandas()
    cands = np.unique(cdf["c"].to_numpy()) if "c" in cdf.columns else np.zeros(0)
    if not len(cands):
        return {q: None for q in qs}
    cands_ref = ray.put(cands)

    def count_le(t: pa.Table) -> pa.Table:
        cs = ray.get(cands_ref)
        v = np.sort(t[col].to_numpy(zero_copy_only=False).astype(np.float64))
        v = v[~np.isnan(v)]
        le = np.searchsorted(v, cs, side="right").astype(np.int64)
        return pa.table(
            {
                "le": pa.array([le], pa.list_(pa.int64(), len(cs))),
                "n": pa.array([len(v)], pa.int64()),
            }
        )

    parts = proj.map_batches(count_le, batch_format="pyarrow").take_all()
    ranks = np.zeros(len(cands), dtype=np.int64)
    n = 0
    for row in parts:
        ranks += np.asarray(row["le"], dtype=np.int64)
        n += int(row["n"])
    if n == 0:
        return {q: None for q in qs}

    # order statistics needed (1-based ranks) across all qs
    need: set[int] = set()
    hs: dict[float, float] = {}
    for q in qs:
        h = (n - 1) * float(q)
        hs[q] = h
        need.add(int(np.floor(h)) + 1)
        need.add(min(int(np.floor(h)) + 2, n))
    # bracket (lo, hi] per needed rank from the candidate rank table; the
    # SMALLEST candidate with rank >= r is an upper bound, its predecessor
    # a strict lower bound
    brackets: dict[int, tuple[float | None, float]] = {}
    for r in sorted(need):
        i = int(np.searchsorted(ranks, r, side="left"))
        i = min(i, len(cands) - 1)
        lo = cands[i - 1] if i > 0 else None
        brackets[r] = (None if lo is None else float(lo), float(cands[i]))
    # one filtered collect for the union of brackets
    lo_arr = np.array(
        [(-np.inf if lo is None else lo) for lo, _hi in brackets.values()]
    )
    hi_arr = np.array([hi for _lo, hi in brackets.values()])
    bounds_ref = ray.put((lo_arr, hi_arr))

    def gather(t: pa.Table) -> pa.Table:
        los, his = ray.get(bounds_ref)
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        keep = np.zeros(len(v), dtype=bool)
        for lo, hi in zip(los, his):
            keep |= (v > lo) & (v <= hi)
        return pa.table({"v": pa.array(v[keep])})

    got = proj.map_batches(gather, batch_format="pyarrow").to_pandas()
    vals = np.sort(got["v"].to_numpy()) if "v" in got.columns else np.zeros(0)

    def kth(r: int) -> float:
        lo, hi = brackets[r]
        lo_rank = 0 if lo is None else int(
            ranks[int(np.searchsorted(cands, lo))]
        )
        inb = vals[
            ((vals > (-np.inf if lo is None else lo)) & (vals <= hi))
        ]
        return float(np.sort(inb)[r - lo_rank - 1])

    out: dict[float, float | None] = {}
    for q in qs:
        h = hs[q]
        f = int(np.floor(h))
        v0 = kth(f + 1)
        if h == f or f + 2 > n:
            out[q] = v0
        else:
            v1 = kth(f + 2)
            out[q] = v0 + (h - f) * (v1 - v0)
    return out


def grouped_quantiles(
    ds,
    col: str,
    group: str,
    qs: list[float],
    candidates_per_block: int = 64,
) -> dict:
    """Per-GROUP exact-rank-certified quantiles (same two-pass construction
    as ``distributed_quantiles``, with candidates and counts keyed by group).

    Intended for MODERATE group cardinality (event types, languages,
    sources): the driver-side candidate/rank state is
    O(groups x candidates_per_block x blocks). For millions of groups use
    the keyed state store / grouped_topk instead. Returns
    {group: {q: {"value", "rank", "n", "max_rank_err"}}}.
    """
    import ray

    proj = ds.select_columns([group, col])

    def cand(t: pa.Table) -> pa.Table:
        gcol = (
            t[group].combine_chunks()
            if isinstance(t[group], pa.ChunkedArray)
            else t[group]
        )
        enc = pc.dictionary_encode(gcol)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = np.asarray(enc.indices).astype(np.int64)
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~np.isnan(v)
        codes, v = codes[ok], v[ok]
        if not len(v):
            return pa.table({"g": pa.array([], pa.string()),
                             "c": pa.array([], pa.float64())})
        order = np.lexsort((v, codes))
        c_s, v_s = codes[order], v[order]
        b = np.empty(len(c_s), dtype=bool)
        b[0] = True
        b[1:] = c_s[1:] != c_s[:-1]
        firsts = np.flatnonzero(b)
        counts = np.diff(np.append(firsts, len(c_s)))
        k_g = np.minimum(candidates_per_block, counts)
        total = int(k_g.sum())
        starts = np.zeros(len(k_g), dtype=np.int64)
        starts[1:] = np.cumsum(k_g)[:-1]
        j = np.arange(total) - np.repeat(starts, k_g)          # 0..k_i-1
        n_rep = np.repeat(counts, k_g)
        k_rep = np.repeat(k_g, k_g)
        pos = np.repeat(firsts, k_g) + ((j + 1) * n_rep) // k_rep - 1
        return pa.table(
            {
                "g": pc.take(enc.dictionary, pa.array(c_s[pos])).cast(pa.string()),
                "c": pa.array(v_s[pos], pa.float64()),
            }
        )

    cdf = proj.map_batches(cand, batch_format="pyarrow").to_pandas()
    if cdf.empty or "g" not in cdf.columns:
        return {}
    per_group = {
        g: np.unique(sub["c"].to_numpy()) for g, sub in cdf.groupby("g", sort=True)
    }
    cands_ref = ray.put(per_group)

    def count_le(t: pa.Table) -> pa.Table:
        cg = ray.get(cands_ref)
        gcol = (
            t[group].combine_chunks()
            if isinstance(t[group], pa.ChunkedArray)
            else t[group]
        )
        enc = pc.dictionary_encode(gcol)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = np.asarray(enc.indices).astype(np.int64)
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~np.isnan(v)
        codes, v = codes[ok], v[ok]
        names = [str(x) for x in enc.dictionary.to_pylist()]
        order = np.lexsort((v, codes))
        c_s, v_s = codes[order], v[order]
        b = np.empty(len(c_s), dtype=bool)
        if len(c_s):
            b[0] = True
            b[1:] = c_s[1:] != c_s[:-1]
        firsts = np.flatnonzero(b) if len(c_s) else np.zeros(0, np.int64)
        ends = np.append(firsts[1:], len(c_s))
        gs, les, ns = [], [], []
        for f, e in zip(firsts, ends):       # one iteration per group present
            gname = names[c_s[f]]
            cs = cg.get(gname)
            if cs is None:
                continue
            seg = v_s[f:e]
            gs.append(gname)
            les.append(np.searchsorted(seg, cs, side="right").astype(np.int64))
            ns.append(e - f)
        return pa.table(
            {
                "g": pa.array(gs, pa.string()),
                "le": pa.array([x.tolist() for x in les], pa.list_(pa.int64())),
                "n": pa.array(ns, pa.int64()),
            }
        )

    rows = proj.map_batches(count_le, batch_format="pyarrow").take_all()
    ranks = {g: np.zeros(len(cs), dtype=np.int64) for g, cs in per_group.items()}
    totals = {g: 0 for g in per_group}
    for r in rows:
        ranks[r["g"]] += np.asarray(r["le"], dtype=np.int64)
        totals[r["g"]] += int(r["n"])
    out = {}
    for g, cs in per_group.items():
        n = totals[g]
        res = {}
        for q in qs:
            target = max(1, int(np.ceil(q * n)))
            i = min(int(np.searchsorted(ranks[g], target, side="left")), len(cs) - 1)
            res[q] = {
                "value": float(cs[i]),
                "rank": int(ranks[g][i]),
                "n": n,
                "max_rank_err": -(-n // candidates_per_block),
            }
        out[g] = res
    return out


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------


def _mg_compress(items: np.ndarray, counts: np.ndarray, k: int):
    """Compress a (items, counts) summary to <= k counters, Misra-Gries
    style: subtract the (k+1)-th largest count from everything, drop <= 0.
    Returns (items, counts, subtracted) — ``subtracted`` adds to the
    summary's undercount bound."""
    if len(items) <= k:
        return items, counts, 0
    d = np.partition(counts, len(counts) - (k + 1))[len(counts) - (k + 1)]
    keep = counts > d
    return items[keep], counts[keep] - d, int(d)


def _mg_merge_arrays(parts, k: int):
    """Merge (items, counts, err, n) summaries: sum counts per item, sum
    errors and totals, compress."""
    import pandas as pd

    real = [p for p in parts if len(p[0])]
    err = sum(int(p[2]) for p in parts)
    n = sum(int(p[3]) for p in parts)
    if not real:
        return np.array([], dtype=object), np.array([], dtype=np.int64), err, n
    items = np.concatenate([p[0] for p in real])
    counts = np.concatenate([p[1] for p in real]).astype(np.int64)
    s = pd.Series(counts).groupby(pd.Series(items), sort=False).sum()
    it, ct, d = _mg_compress(
        s.index.to_numpy(), s.to_numpy().astype(np.int64), k
    )
    return it, ct, err + d, n


def heavy_hitters(
    ds,
    col: str,
    k: int = 16,
    tokenize: bool = False,
    fanin: int = 16,
) -> dict:
    """Mergeable Misra-Gries heavy-hitters summary of a string column (or,
    with ``tokenize=True``, of its RE2 ``\\w+`` word tokens — the repo-wide
    tokenizer semantics).

    Unlike ``vocab_counts`` (exact, shuffles one row per distinct item),
    the summary ships AT MOST k+1 rows per block regardless of
    cardinality — the right shape when the item space itself is huge
    (URLs, n-grams, user ids at 100 TB). Per-block exact value-counts are
    MG-compressed to k counters, then tree-reduced ``fanin`` summaries at
    a time; nothing driver-side grows with data size.

    Guarantees (classic MG, made checkable): every estimate UNDERCOUNTS by
    at most the returned ``err`` (and err <= n/(k+1)); every item with
    true frequency > err is present in the summary. The oracled query
    certifies all three against an exact counting pass.

    Returns ``{"items": list, "estimates": np.ndarray, "err": int,
    "n": int}``.
    """
    import ray

    @ray.remote
    def partial(*tbls: pa.Table):
        toks = []
        for t in tbls:
            if not t.num_rows:
                continue
            arr = t[col]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if tokenize:
                w = pc.utf8_split_whitespace(
                    pc.replace_substring_regex(pc.utf8_lower(arr), r"\W+", " ")
                )
                if isinstance(w, pa.ChunkedArray):
                    w = w.combine_chunks()
                flat = w.flatten()
                flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
                toks.append(flat)
            else:
                toks.append(arr)
        if not toks:
            return np.array([], dtype=object), np.array([], np.int64), 0, 0
        col_all = pa.concat_arrays([a.cast(pa.string()) for a in toks])
        vc = pc.value_counts(col_all)
        items = np.asarray(vc.field("values").to_pylist(), dtype=object)
        counts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        n = int(counts.sum())
        it, ct, d = _mg_compress(items, counts, k)
        return it, ct, d, n

    @ray.remote
    def merge(*parts):
        return _mg_merge_arrays(parts, k)

    block_refs = list(ds.select_columns([col]).to_arrow_refs())
    refs = [
        partial.remote(*g)
        for g in np.array_split(
            np.array(block_refs, dtype=object), max(1, len(block_refs) // 2)
        )
        if len(g)
    ]
    if not refs:
        return {"items": [], "estimates": np.array([], np.int64), "err": 0, "n": 0}
    while len(refs) > 1:
        refs = [
            merge.remote(*refs[i : i + fanin])
            for i in range(0, len(refs), fanin)
        ]
    items, counts, err, n = ray.get(refs[0])
    order = np.argsort(items.astype(str), kind="stable")
    return {
        "items": list(items[order]),
        "estimates": counts[order],
        "err": int(err),
        "n": int(n),
    }


def exact_value_histogram(ds, col: str):
    """Exact global histogram of a SMALL-cardinality integer column
    (word counts, lengths, bucketed scores): per-block ``np.unique``
    partials, driver fold of (distinct-values x P) pairs. The scalable
    building block for exact discrete quantiles / threshold selection —
    nothing but (value, count) pairs leave a block."""
    import ray

    @ray.remote
    def part(t):
        if not t.num_rows:
            return None
        v = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
        vals, cnt = np.unique(v, return_counts=True)
        return vals, cnt

    acc: dict[int, int] = {}
    for p in ray.get([part.remote(b) for b in ds.to_arrow_refs()]):
        if p is None:
            continue
        for v, c in zip(*p):
            acc[int(v)] = acc.get(int(v), 0) + int(c)
    vals = np.array(sorted(acc), dtype=np.int64)
    counts = np.array([acc[int(v)] for v in vals], dtype=np.int64)
    return vals, counts


def quantile_disc_from_hist(vals: np.ndarray, counts: np.ndarray, q: float):
    """The exact discrete quantile (DuckDB ``quantile_disc`` convention:
    the sorted element at index ``floor(q * (n-1))``) from a histogram."""
    n = int(counts.sum())
    if n == 0:
        raise ValueError("empty histogram")
    idx = int(np.floor(q * (n - 1)))
    cum = np.cumsum(counts)
    return int(vals[np.searchsorted(cum, idx + 1)])


def quantile_threshold_filter(ds, col: str, q: float, keep: str = "ge"):
    """Drop the bottom (or top) ``q`` tail of a Dataset by an integer
    metric column: exact histogram -> discrete-quantile threshold ->
    streamed filter (the threshold is a plain Python int captured in the
    map closure; no second shuffle, no driver data pass). ``keep='ge'``
    keeps rows with ``col >= threshold``; ``'le'`` keeps ``<=``."""
    import pyarrow.compute as pc

    vals, counts = exact_value_histogram(ds, col)
    thr = quantile_disc_from_hist(vals, counts, q)
    op = pc.greater_equal if keep == "ge" else pc.less_equal

    def f(t):
        return t.filter(op(t[col], thr))

    return ds.map_batches(f, batch_format="pyarrow"), thr


def exact_distinct(ds, col: str) -> int:
    """Exact distinct count of a column: per-block ``np.unique`` partials,
    ONE value-keyed exchange, per-partition unique counts, driver sums P
    integers. Only distinct values (not rows) shuffle — the certificate
    pass for HLL, without the generic Aggregate's fixed all-to-all cost."""
    import pyarrow as pa_
    import ray

    from ..exchange import default_partitions, shard_refs

    def uniq(t: pa_.Table) -> pa_.Table:
        import pyarrow.compute as pc_

        v = t[col]
        if isinstance(v, pa_.ChunkedArray):
            v = v.combine_chunks()
        if pa.types.is_floating(v.type):
            # route float values by their IEEE bit pattern (the string
            # hash path has no buffers to walk); +0.0 folds -0.0 into 0.0
            # so distinct-bit-patterns == distinct-values
            arr = v.cast(pa.float64()).to_numpy(zero_copy_only=False) + 0.0
            v = pa.array(arr.view(np.int64), pa.int64())
        if not t.num_rows:
            return pa_.table({col: v})
        return pa_.table({col: pc_.unique(v)})

    partials = ds.map_batches(uniq, batch_format="pyarrow")

    @ray.remote
    def count_unique(*shards: pa_.Table) -> int:
        real = [t for t in shards if t.num_rows]
        if not real:
            return 0
        import pyarrow.compute as pc_

        tbl = (
            pa_.concat_tables(real, promote_options="none")
            if len(real) > 1
            else real[0]
        )
        return len(pc_.unique(tbl[col].combine_chunks()))

    refs = list(partials.to_arrow_refs())
    if not refs:
        return 0
    P = default_partitions()
    sch = ds.schema()  # Ray Data Schema wrapper: parallel names/types lists
    typ = dict(zip(sch.names, sch.types))[col]
    if isinstance(typ, pa.DataType):
        # floats were re-expressed as int64 bit patterns in the partial
        by_int = pa.types.is_integer(typ) or pa.types.is_floating(typ)
    else:  # from_pandas plans may report numpy dtypes / python object
        try:
            by_int = np.issubdtype(typ, np.integer) or np.issubdtype(
                typ, np.floating
            )
        except TypeError:
            by_int = False
    groups = shard_refs(refs, col, P, by_int=by_int)
    return int(sum(ray.get([count_unique.remote(*[g[p] for g in groups])
                            for p in range(P)])))


def grouped_approx_distinct(
    ds,
    group_col: str,
    col: str,
    p: int = 12,
    num_partitions: int | None = None,
):
    """Approximate distinct count of ``col`` PER GROUP — HLL with SPARSE
    registers so high group cardinality never materializes groups x m
    bytes: each batch emits (group, register, rho) triples maxed within
    the batch (bounded by the batch's distinct (group, value) pairs, the
    same combiner bound as exact counting), ONE exchange maxes them per
    (group, register), and a second vocabulary-sized exchange folds each
    group's sparse registers into the HLL estimate (untouched registers
    contribute (m - nnz) zeros in closed form, so the full m-vector never
    exists anywhere).

    Returns a Dataset (group_col, approx float64). Same estimator as
    ``HLL.estimate`` (alpha_m bias + linear-counting small-range
    correction); relative error ~1.04/sqrt(2^p)."""
    import pandas as pd_

    from ..agg import exchange_groupby

    m = 1 << p
    pp = p

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                group_col: t[group_col].combine_chunks()
                if isinstance(t[group_col], pa.ChunkedArray)
                else t[group_col],
                "reg": pa.array([], pa.int64()),
                "rho": pa.array([], pa.int64()),
            }
        ) if not t.num_rows else None
        if empty is not None:
            return empty
        g = t[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        enc = pa.compute.dictionary_encode(g)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = np.asarray(enc.indices).astype(np.int64)
        h = _hash_column(t[col])
        idx = (h >> np.uint64(64 - pp)).astype(np.int64)
        bits = h & np.uint64((1 << (64 - pp)) - 1)
        fl = np.zeros(len(bits), dtype=np.int64)
        nz = bits > 0
        fl[nz] = np.floor(np.log2(bits[nz].astype(np.float64))).astype(np.int64)
        rho = np.where(nz, (64 - pp) - fl, (64 - pp) + 1).astype(np.int64)
        order = np.lexsort((idx, codes))
        c_s, i_s, r_s = codes[order], idx[order], rho[order]
        b = np.empty(len(c_s), dtype=bool)
        b[0] = True
        b[1:] = (c_s[1:] != c_s[:-1]) | (i_s[1:] != i_s[:-1])
        starts = np.flatnonzero(b)
        best = np.maximum.reduceat(r_s, starts)
        return pa.table(
            {
                group_col: enc.dictionary.take(pa.array(c_s[starts])),
                "reg": pa.array(i_s[starts], pa.int64()),
                "rho": pa.array(best, pa.int64()),
            }
        )

    partials = ds.select_columns([group_col, col]).map_batches(
        partial, batch_format="pyarrow"
    )
    merged = exchange_groupby(
        partials, [group_col, "reg"], {"rho": ("rho", "max")},
        num_partitions=num_partitions,
    )

    def derive(t: pa.Table) -> pa.Table:
        rho = t["rho"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                group_col: t[group_col],
                "s": pa.array(np.power(2.0, -np.minimum(rho, 255.0))),
            }
        )

    folded = exchange_groupby(
        merged.map_batches(derive, batch_format="pyarrow"),
        group_col,
        {"s": ("s", "sum"), "nnz": (None, "count")},
        num_partitions=num_partitions,
    )

    def estimate(df: pd_.DataFrame) -> pd_.DataFrame:
        s = df["s"].to_numpy(dtype=np.float64)
        nnz = df["nnz"].to_numpy(dtype=np.int64)
        alpha = 0.7213 / (1 + 1.079 / m)
        e = alpha * m * m / ((m - nnz) + s)
        v = m - nnz
        lin = np.where(v > 0, m * np.log(np.where(v > 0, m / np.maximum(v, 1), 1.0)), e)
        out = np.where((e <= 2.5 * m) & (v > 0), lin, e)
        return pd_.DataFrame({group_col: df[group_col], "approx": out})

    return folded.map_batches(estimate, batch_format="pandas")


def equal_width_histogram(
    ds,
    col: str,
    nbins: int,
    lo: float | None = None,
    hi: float | None = None,
    num_partitions: int | None = None,
):
    """Equal-width histogram of a numeric column: ``nbins`` buckets over
    ``[lo, hi]`` (bounds default to the exact global min/max, found with a
    first O(P)-partial pass). Returns a Dataset of the NON-EMPTY buckets
    (SQL GROUP BY semantics) with columns ``bin`` (0-based), ``lo_edge``,
    ``hi_edge``, ``n``.

    The bucket rule is spelled so an oracle reproduces it bit-for-bit in
    IEEE double arithmetic:

        bin     = max(0, min(nbins-1, floor((v - lo) * nbins / (hi - lo))))
        lo_edge = lo + bin * (hi - lo) / nbins          (hi_edge: bin+1)

    i.e. the top edge closes the last bucket (v == hi lands in bin
    nbins-1), values outside [lo, hi] clamp into the end buckets, and
    NULL/NaN rows drop. Degenerate hi == lo puts everything in bin 0.

    Scale shape: two streaming passes over the column projection — a
    per-block (min, max) partial (driver folds P pairs), then per-block
    bucket bincount partials through one bin-keyed exchange_groupby (at
    most nbins rows per block ship; the column never concentrates)."""
    import ray

    from ..agg import exchange_groupby

    proj = ds.select_columns([col])

    if lo is None or hi is None:
        @ray.remote
        def mm(t: pa.Table):
            v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
            v = v[~np.isnan(v)]
            if not len(v):
                return None
            return float(v.min()), float(v.max())

        pairs = [p for p in ray.get(
            [mm.remote(b) for b in proj.to_arrow_refs()]
        ) if p is not None]
        if not pairs:
            return ray.data.from_items([]).limit(0)
        lo = min(p[0] for p in pairs) if lo is None else lo
        hi = max(p[1] for p in pairs) if hi is None else hi
    lo, hi = float(lo), float(hi)

    import ray.data

    def bucketize(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        if hi > lo:
            b = np.floor((v - lo) * np.float64(nbins) / (hi - lo))
            b = np.minimum(np.float64(nbins - 1), b)
            b = np.maximum(np.float64(0.0), b).astype(np.int64)
        else:
            b = np.zeros(len(v), dtype=np.int64)
        vals, cnt = np.unique(b, return_counts=True)
        return pa.table({
            "bin": pa.array(vals, pa.int64()),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    parts = proj.map_batches(bucketize, batch_format="pyarrow")
    agg = exchange_groupby(
        parts, "bin", {"n": ("n", "sum")}, num_partitions=num_partitions
    )

    def edges(t: pa.Table) -> pa.Table:
        b = t["bin"].to_numpy(zero_copy_only=False).astype(np.float64)
        return t.append_column(
            "lo_edge", pa.array(lo + b * (hi - lo) / np.float64(nbins))
        ).append_column(
            "hi_edge", pa.array(lo + (b + 1.0) * (hi - lo) / np.float64(nbins))
        )

    return agg.map_batches(edges, batch_format="pyarrow")


def grouped_percentile_cont(
    ds,
    key: str,
    col: str,
    qs: dict[str, float],
    by_int: bool = False,
    num_partitions: int | None = None,
):
    """EXACT grouped interpolated percentiles (SQL ``percentile_cont ...
    WITHIN GROUP`` per key): ONE key-hash exchange co-locates each group,
    then pandas' C-level ``groupby(...).quantile(interpolation="linear")``
    evaluates every requested quantile per partition. NULLs drop per SQL;
    all-NULL groups emit NULL.

    Partitioning assumption (documented like the other keyed exacts): a
    single group's column values must fit one partition's heap — the right
    tool for modest-cardinality keys (types, languages, buckets). For
    billion-row single groups use the certified sketch path
    (``grouped_quantile_sketch``) or the global ``exact_percentiles``
    bracket machinery instead.

    ``qs``: alias -> quantile in [0, 1]. Returns key + one column per
    alias (float64)."""
    import ray
    import ray.data

    from ..exchange import default_partitions, shard_refs

    P = max(2, num_partitions or default_partitions())
    qlist = list(qs.values())
    aliases = list(qs.keys())

    @ray.remote
    def part(*shards: pa.Table) -> pa.Table:
        real = [t for t in shards if t.num_rows]
        if not real:
            for t in shards:
                if t.column_names:
                    base = t.slice(0, 0).to_pandas()[[key]]
                    for a in aliases:
                        base[a] = pd.Series([], dtype="float64")
                    return pa.Table.from_pandas(base, preserve_index=False)
            return pa.table({})
        tbl = (
            pa.concat_tables(real, promote_options="none")
            if len(real) > 1
            else real[0]
        )
        df = tbl.to_pandas()
        # unstack orders columns by the q VALUE (and collapses
        # duplicates): look each alias's q up explicitly
        qv = (
            df.groupby(key, sort=False, dropna=False)[col]
            .quantile(sorted(set(qlist)), interpolation="linear")
            .unstack()
        )
        r = pd.DataFrame({a: qv[q] for a, q in qs.items()})
        r.index.name = key
        out = r.reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    groups = shard_refs(list(ds.to_arrow_refs()), key, P, by_int=by_int)
    refs = [part.remote(*[g[p] for g in groups]) for p in range(P)]
    return ray.data.from_arrow_refs(refs)
