"""Mergeable Bloom filter for join pre-filtering.

At 100 TB the dominant cost of a semi join is shuffling the BIG side's
non-matching rows to partitions that will discard them. A Bloom filter of
the key side is tiny (n_bits/8 bytes, OR-mergeable), broadcasts once via
``ray.put``, and lets every left block drop definite-non-matches BEFORE
the exchange — false positives (a few %) still shuffle and are removed by
the exact join, so the result is exactly the plain semi join.

Construction is a streaming partial: each block builds its own bloom over
its keys (vectorized double hashing, ``np.bitwise_or.at``) and the driver
ORs P fixed-size bit arrays.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..partitioning import hash_string_array


def _key_hashes(col) -> tuple[np.ndarray, np.ndarray]:
    """Two independent u64 hash streams of a key column (ints use
    splitmix-style mixes, strings the vectorized FNV-1a)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h1 = v * np.uint64(0x9E3779B97F4A7C15)
            h1 ^= h1 >> np.uint64(31)
            h1 *= np.uint64(0xBF58476D1CE4E5B9)
            h2 = v * np.uint64(0xC2B2AE3D27D4EB4F)
            h2 ^= h2 >> np.uint64(29)
            h2 *= np.uint64(0x94D049BB133111EB)
        return h1, h2
    h1 = hash_string_array(col.cast(pa.string()))
    with np.errstate(over="ignore"):
        h2 = h1 * np.uint64(0xC2B2AE3D27D4EB4F)
        h2 ^= h2 >> np.uint64(29)
    return h1, h2


class Bloom:
    """Fixed-size Bloom filter over a u64 bit array (pickles compactly,
    merges with |=)."""

    def __init__(self, n_bits: int = 1 << 23, k: int = 4):
        if n_bits % 64:
            raise ValueError("n_bits must be a multiple of 64")
        self.m = np.uint64(n_bits)
        self.k = k
        self.bits = np.zeros(n_bits // 64, dtype=np.uint64)

    def add_column(self, col) -> None:
        h1, h2 = _key_hashes(col)
        with np.errstate(over="ignore"):
            for i in range(self.k):
                idx = (h1 + np.uint64(i) * h2) % self.m
                np.bitwise_or.at(
                    self.bits, (idx >> np.uint64(6)).astype(np.int64),
                    np.uint64(1) << (idx & np.uint64(63)),
                )

    def maybe_contains(self, col) -> np.ndarray:
        """Boolean mask: False = DEFINITELY absent, True = maybe present."""
        h1, h2 = _key_hashes(col)
        out = np.ones(len(h1), dtype=bool)
        with np.errstate(over="ignore"):
            for i in range(self.k):
                idx = (h1 + np.uint64(i) * h2) % self.m
                word = self.bits[(idx >> np.uint64(6)).astype(np.int64)]
                out &= (word >> (idx & np.uint64(63))) & np.uint64(1) != 0
        return out

    def merge(self, other: "Bloom") -> "Bloom":
        self.bits |= other.bits
        return self


def build_bloom_from_refs(
    refs: list, col: str, n_bits: int = 1 << 23, k: int = 4
) -> Bloom:
    """OR-merged Bloom over the ``col`` values of a list of Arrow block
    refs: one fixed-size partial per block crosses the wire."""

    @ray.remote
    def partial(t: pa.Table) -> np.ndarray:
        b = Bloom(n_bits, k)
        if t.num_rows:
            b.add_column(t[col])
        return b.bits

    out = Bloom(n_bits, k)
    for bits in ray.get([partial.remote(r) for r in refs]):
        out.bits |= bits
    return out
