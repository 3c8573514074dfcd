"""Deterministic hash partitioning + skew handling for the ordered engine.

≙ the keyed shuffle in front of the reference's stateful ParDo
(docs/pipeline-design.md:13-17: events hash-partitioned by SessionContractKey
across workers). Routing must be deterministic across processes and across
resume (SURVEY.md §7.4.1), so we hash with crc32 over the key bytes — never
Python's ``hash`` (randomized per process).

Skew: hash already spreads *distinct* hot keys uniformly; the residual risk is
several hot keys colliding into one partition (reference stresses this with
power-law key activity, Simulator.java:61-70). ``compute_hot_key_overrides``
samples key frequencies and pins the heaviest keys round-robin across
partitions, overriding their hash route — the "skew-salted" assignment of the
north star. A single hot key remains inherently serial (same as the
reference: per-key order forces serial processing per key).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def key_partition_codes(
    keys: pa.ChunkedArray | pa.Array,
    num_partitions: int,
    overrides: dict[str, int] | None = None,
) -> np.ndarray:
    """Vectorized-by-unique partition assignment: crc32(key) % P with
    optional per-key overrides. O(rows) take + O(unique) hashing."""
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    enc = pc.dictionary_encode(keys)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = np.asarray(enc.indices.fill_null(-1)).astype(np.int64)
    uniques = enc.dictionary.to_pylist()
    part_of_unique = np.empty(len(uniques) + 1, dtype=np.int64)
    part_of_unique[-1] = 0  # null keys -> partition 0 (quarantined at worker)
    for i, u in enumerate(uniques):
        if overrides and u in overrides:
            part_of_unique[i] = overrides[u] % num_partitions
        else:
            part_of_unique[i] = zlib.crc32(u.encode("utf-8")) % num_partitions
    return part_of_unique[codes]


def split_table(
    tbl: pa.Table,
    key: str,
    num_partitions: int,
    overrides: dict[str, int] | None = None,
    range_bounds: list[str] | None = None,
) -> list[pa.Table]:
    """Split one block into P per-partition sub-tables (map side of the
    exchange). Row order within each sub-table preserves the block's arrival
    order.

    Each sub-table MUST be a compact copy, not a zero-copy slice: pickling a
    sliced Arrow table ships the slice's entire parent buffers (string data
    buffers are not truncated), which turns the exchange into O(P * block)
    bytes — measured 6 MB per 1000-row slice vs 81 KiB compact. One stable
    argsort + P contiguous-range takes keeps the copy at O(n) total."""
    if range_bounds is not None:
        parts = range_partition_codes(tbl[key], range_bounds)
    else:
        parts = key_partition_codes(tbl[key], num_partitions, overrides)
    order = np.argsort(parts, kind="stable")
    bounds = np.searchsorted(parts[order], np.arange(num_partitions + 1))
    return [
        tbl.take(pa.array(order[bounds[p] : bounds[p + 1]]))
        for p in range(num_partitions)
    ]


def compute_range_bounds(
    sample: pa.Table, key: str, num_partitions: int
) -> list[str]:
    """P-1 quantile cut points of the key from a sample — range partitioning
    keeps each partition a contiguous key range (co-locates lexicographic
    neighbours; the north-star 'range-partitioned' mode). Deterministic given
    the sample."""
    ks = sorted(set(sample[key].to_pylist()))
    if len(ks) <= num_partitions:
        return ks[1:]
    idx = [int(i * len(ks) / num_partitions) for i in range(1, num_partitions)]
    return [ks[i] for i in idx]


def range_partition_codes(
    keys: pa.ChunkedArray | pa.Array, bounds: list[str]
) -> np.ndarray:
    """Vectorized-by-unique range assignment: partition = number of bounds
    <= key (np.searchsorted over the unique values)."""
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    enc = pc.dictionary_encode(keys)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = np.asarray(enc.indices.fill_null(-1)).astype(np.int64)
    uniques = np.array(enc.dictionary.to_pylist(), dtype=object)
    part_of_unique = np.append(
        np.searchsorted(np.array(bounds, dtype=object), uniques, side="right"),
        0,  # null keys -> partition 0
    ).astype(np.int64)
    return part_of_unique[codes]


def compute_hot_key_overrides(
    sample: pa.Table, key: str, num_partitions: int, top_n: int = 0
) -> dict[str, int]:
    """Pin the heaviest keys (from a sample) round-robin across partitions,
    heaviest first, so no partition accumulates several hot keys.
    ``top_n`` defaults to 2 × partitions."""
    if top_n <= 0:
        top_n = 2 * num_partitions
    vc = pc.value_counts(sample[key])
    values = vc.field("values").to_pylist()
    counts = np.asarray(vc.field("counts").to_pylist())
    order = np.argsort(-counts, kind="stable")[:top_n]
    return {values[i]: int(r % num_partitions) for r, i in enumerate(order)}
