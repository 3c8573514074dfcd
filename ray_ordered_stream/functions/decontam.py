"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark corpus (the standard 13-gram-overlap
rule of GPT-3/PaLM data cards, parameterized by ``n``).

Scale shape (100 TB corpus, small benchmark): the BENCHMARK side is the
broadcast side — eval suites are 10^4..10^7 n-grams, so their unique gram
hashes are collected once (per-batch UNIQUE partials, union on the driver)
and shipped to every task via ``ray.put``; the training corpus streams
through ``map_batches`` and never shuffles. Membership is a sorted-array
``searchsorted`` per batch. If the blocklist ever outgrew worker memory the
shape to switch to is a hash-partitioned semi-join (functions/dedup
``exact_dedup``), not a bigger broadcast.

Tokenization is the repo-wide RE2 ``\\w+`` semantics so the DuckDB oracle
mirrors it exactly; grams are compared by a 64-bit rolling hash of the
token hashes (collision odds ~ grams·|bench| / 2^64 — negligible, and at
corpus scale a false hit costs one wrongly-dropped document, never a
wrongly-kept one... the conservative direction for decontamination).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_B = np.uint64(1099511628211)  # FNV prime; u64 arithmetic wraps


def _word_gram_hashes(texts: pa.Array, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(doc_of, gram_hash) for every word n-gram position of a text column,
    batch-vectorized: one Arrow tokenization, one FNV-1a pass over the
    tokens, one rolling combine with a same-document mask."""
    import pyarrow.compute as pc

    from ..partitioning import hash_string_array

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    words = pc.utf8_split_whitespace(
        pc.replace_substring_regex(pc.utf8_lower(texts), r"\W+", " ")
    )
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    counts = (
        pc.list_value_length(words)
        .fill_null(0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    flat = words.flatten()
    nz = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    doc_of = np.repeat(np.arange(len(counts)), counts)[nz]
    h = hash_string_array(flat)[nz]
    if len(h) < n:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    m = len(h) - n + 1
    g = h[:m].copy()
    same = np.ones(m, dtype=bool)
    with np.errstate(over="ignore"):
        for j in range(1, n):
            g = g * _B + h[j : j + m]
            same &= doc_of[j : j + m] == doc_of[:m]
    return doc_of[:m][same], g[same]


def collect_ngram_hashes(ds, n: int = 3, text_col: str = "text") -> np.ndarray:
    """Sorted unique n-gram hashes of a (small) benchmark Dataset. Partials
    are per-batch unique, so the driver receives one deduped hash column
    per batch, not one row per occurrence."""

    def partial(t: pa.Table) -> pa.Table:
        _, g = _word_gram_hashes(t[text_col], n)
        return pa.table({"g": pa.array(np.unique(g).view(np.int64), pa.int64())})

    parts = [
        b["g"].to_numpy(zero_copy_only=False)
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
        if b.num_rows
    ]
    if not parts:
        return np.empty(0, np.uint64)
    return np.unique(np.concatenate(parts)).astype(np.int64).view(np.uint64)


def decontaminate(
    docs,
    benchmark,
    n: int = 3,
    text_col: str = "text",
):
    """Per-document contamination counts vs a benchmark corpus: appends
    ``n_ngrams`` (n-gram positions), ``n_contaminated`` (positions whose
    gram appears anywhere in the benchmark) and ``contaminated``. Filter
    on ``contaminated`` (or a count threshold) to scrub."""
    import ray

    bench = np.sort(collect_ngram_hashes(benchmark, n, text_col))
    bench_ref = ray.put(bench)

    class Tag:
        def __init__(self):
            self.bench = None

        def __call__(self, t: pa.Table) -> pa.Table:
            if self.bench is None:
                self.bench = ray.get(bench_ref)
            doc_of, g = _word_gram_hashes(t[text_col], n)
            n_rows = len(t)
            n_ngrams = np.bincount(doc_of, minlength=n_rows).astype(np.int64)
            if len(self.bench) and len(g):
                pos = np.searchsorted(self.bench, g)
                pos[pos >= len(self.bench)] = len(self.bench) - 1
                hit = self.bench[pos] == g
            else:
                hit = np.zeros(len(g), dtype=bool)
            n_cont = np.bincount(
                doc_of[hit], minlength=n_rows
            ).astype(np.int64)
            return (
                t.append_column("n_ngrams", pa.array(n_ngrams))
                .append_column("n_contaminated", pa.array(n_cont))
                .append_column("contaminated", pa.array(n_cont > 0))
            )

    return docs.map_batches(Tag(), batch_format="pyarrow")
