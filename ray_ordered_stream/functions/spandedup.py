"""Span-level exact substring deduplication (duplicated n-gram spans).

The training-data op popularized by "Deduplicating Training Data Makes
Language Models Better" (Lee et al., 2021, arXiv:2107.06499): instead of
dropping whole near-duplicate documents, find every TOKEN SPAN whose
n-grams repeat anywhere in the corpus (including inside the same document)
and report it as a merged [start, end) interval per document — the input
to span-stripping, boilerplate removal, or a duplicated-fraction quality
gate.

Pipeline shape (two hash exchanges, nothing materializes on the driver):

1. per input block: tokenize (lowercase ``\\w+`` — the engine's shared
   tokenizer, identical to the vocab/bigram SQL mirrors), assemble n-gram
   strings with Arrow's element-wise join (grams never cross document
   boundaries), emit one (gram, doc_id, pos) occurrence row per position;
2. exchange on gram: each partition then holds EVERY occurrence of its
   grams — count per gram, keep grams with >= min_count occurrences,
   forward only their (doc_id, pos) pairs;
3. exchange on doc_id: per-partition interval merge (islands: a new span
   starts where pos > running max(prev pos + n) within the doc) ->
   (doc_id, span_start, span_end).

Scale note: stage 1 shuffles one row per token position, with the gram
string as the key — exact by construction (and what the SQL oracle can
mirror). At 100 TB you would shuffle a 128-bit gram fingerprint instead
of the string (16 B/row vs ~8 words/row) and accept the negligible
collision odds, exactly like stream_dedup's content fingerprints; the
exchange/merge shape is unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..exchange import default_partitions, shard_refs

SPAN_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("span_start", pa.int64()),
        ("span_end", pa.int64()),
    ]
)


def _empty_occurrences() -> pa.Table:
    return pa.table(
        {
            "gram": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
            "pos": pa.array([], pa.int64()),
        }
    )


def _tokenize_block(t: pa.Table, id_col: str, text_col: str):
    """Shared lowercase-\\w+ tokenization -> (flat tokens, doc_of, pos,
    doc_ids_per_row). Mirrors textstats._VocabPartial so every text
    operator (and every SQL oracle) agrees on what a token is."""
    import pyarrow.compute as pc

    arr = t[text_col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    low = pc.utf8_lower(arr)
    words = pc.utf8_split_whitespace(
        pc.replace_substring_regex(low, r"\W+", " ")
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
    toks = flat.filter(pa.array(nz))
    idx = np.arange(len(doc_of), dtype=np.int64)
    pos = idx - np.searchsorted(doc_of, doc_of, side="left")
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    return toks, doc_of, pos, ids


def _gram_occurrences(t: pa.Table, n: int, id_col: str, text_col: str) -> pa.Table:
    import pyarrow.compute as pc

    toks, doc_of, pos, ids = _tokenize_block(t, id_col, text_col)
    m = len(toks) - n + 1
    if m <= 0:
        return _empty_occurrences()
    grams = toks.slice(0, m)
    for j in range(1, n):
        grams = pc.binary_join_element_wise(grams, toks.slice(j, m), " ")
    same_doc = doc_of[n - 1 :] == doc_of[:m]
    return pa.table(
        {
            "gram": grams.filter(pa.array(same_doc)),
            "doc_id": pa.array(ids[doc_of[:m][same_doc]], pa.int64()),
            "pos": pa.array(pos[:m][same_doc], pa.int64()),
        }
    )


def _span_refs(doc_refs, n: int, min_count: int, id_col: str, text_col: str,
               P: int):
    """The span pipeline up to its doc-partitioned output: takes the
    (id, text) block refs — MATERIALIZED ONCE by the caller so the
    upstream dataset is never executed twice — and returns P refs of
    SPAN_SCHEMA tables, where partition p holds exactly the docs whose
    int hash routes to p (exchange.int_partition_codes) — so callers can
    zip them against an identically-sharded doc exchange with no extra
    shuffle."""
    if n < 1:
        raise ValueError("n must be >= 1")

    @ray.remote
    def occurrences(*blocks: pa.Table) -> pa.Table:
        real = [b for b in blocks if b.num_rows]
        if not real:
            return _empty_occurrences()
        t = (
            pa.concat_tables(real, promote_options="none")
            if len(real) > 1
            else real[0]
        )
        return _gram_occurrences(t, n, id_col, text_col)

    @ray.remote
    def dup_positions(*shards: pa.Table) -> pa.Table:
        """All occurrences of this partition's grams are here: keep the
        positions of grams repeated >= min_count times."""
        import pyarrow.compute as pc

        real = [s for s in shards if s.num_rows]
        if not real:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "pos": pa.array([], pa.int64())}
            )
        t = (
            pa.concat_tables(real, promote_options="none")
            if len(real) > 1
            else real[0]
        )
        enc = pc.dictionary_encode(t["gram"].combine_chunks())
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = np.asarray(enc.indices).astype(np.int64)
        cnt = np.bincount(codes, minlength=len(enc.dictionary))
        keep = cnt[codes] >= min_count
        kept = t.filter(pa.array(keep))
        return kept.select(["doc_id", "pos"])

    @ray.remote
    def merge_spans(*shards: pa.Table) -> pa.Table:
        """Island merge per doc: intervals are all [pos, pos+n); a new
        span begins where pos exceeds the running max end of its doc."""
        import pandas as pd

        real = [s for s in shards if s.num_rows]
        if not real:
            return SPAN_SCHEMA.empty_table()
        t = (
            pa.concat_tables(real, promote_options="none")
            if len(real) > 1
            else real[0]
        )
        doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = t["pos"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((pos, doc))
        doc, pos = doc[order], pos[order]
        ends = pos + n
        prev_end = (
            pd.Series(ends).groupby(doc, sort=False).cummax().shift(1).to_numpy()
        )
        new_doc = np.empty(len(doc), dtype=bool)
        new_doc[0] = True
        new_doc[1:] = doc[1:] != doc[:-1]
        brk = new_doc | (pos > np.nan_to_num(prev_end, nan=-1))
        # shift(1) crosses doc boundaries; new_doc rows always break
        grp_starts = np.flatnonzero(brk)
        grp_ends = np.r_[grp_starts[1:], len(doc)] - 1
        return pa.table(
            {
                "doc_id": pa.array(doc[grp_starts], pa.int64()),
                "span_start": pa.array(pos[grp_starts], pa.int64()),
                "span_end": pa.array(ends[grp_ends], pa.int64()),
            }
        )

    refs = list(doc_refs)
    if not refs:
        return None
    occ = [occurrences.remote(r) for r in refs]
    by_gram = shard_refs(occ, "gram", P)
    dups = [dup_positions.remote(*[g[p] for g in by_gram]) for p in range(P)]
    by_doc = shard_refs(dups, "doc_id", P, by_int=True)
    return [merge_spans.remote(*[g[p] for g in by_doc]) for p in range(P)]


def duplicated_ngram_spans(
    ds,
    n: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
):
    """Merged [span_start, span_end) token intervals per document covering
    every n-gram that occurs >= min_count times corpus-wide. Returns a
    Dataset with SPAN_SCHEMA; end is exclusive, indices are 0-based token
    positions under the shared lowercase-\\w+ tokenizer."""
    P = num_partitions or default_partitions()
    refs = list(ds.select_columns([id_col, text_col]).to_arrow_refs())
    spans = _span_refs(refs, n, min_count, id_col, text_col, P)
    if spans is None:
        return ray.data.from_arrow(SPAN_SCHEMA.empty_table())
    return ray.data.from_arrow_refs(spans)


def strip_duplicated_spans(
    ds,
    n: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
):
    """The span-stripping pass of Lee et al. 2021: remove every duplicated
    span's tokens and return (doc_id, clean_text) — the deduplicated TOKEN
    stream (space-joined lowercase tokens; training pipelines consume the
    token sequence, so stripping happens in token space, not on the raw
    bytes). Every document appears, '' when everything was stripped.

    No extra shuffle beyond duplicated_ngram_spans: the span pipeline's
    final partitions use the same int hash as the doc exchange here, so
    partition p's docs and spans meet with a zip, not a join."""
    import pyarrow.compute as pc

    P = num_partitions or default_partitions()
    doc_refs = list(ds.select_columns([id_col, text_col]).to_arrow_refs())
    spans = _span_refs(doc_refs, n, min_count, id_col, text_col, P)
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "clean_text": pa.array([], pa.string())}
    )
    if spans is None:
        return ray.data.from_arrow(empty)

    @ray.remote
    def strip(span_tbl: pa.Table, *doc_shards: pa.Table) -> pa.Table:
        real = [s for s in doc_shards if s.num_rows]
        if not real:
            return empty
        t = (
            pa.concat_tables(real, promote_options="none")
            if len(real) > 1
            else real[0]
        )
        toks, doc_of, pos, ids = _tokenize_block(t, id_col, text_col)
        # global token coordinates: per-doc base offset within this block
        counts = np.bincount(doc_of, minlength=t.num_rows).astype(np.int64)
        base = np.concatenate([[0], np.cumsum(counts)[:-1]])
        keep = np.ones(len(doc_of), dtype=bool)
        if span_tbl.num_rows:
            sdoc = span_tbl["doc_id"].to_numpy(zero_copy_only=False)
            sst = span_tbl["span_start"].to_numpy(zero_copy_only=False)
            sen = span_tbl["span_end"].to_numpy(zero_copy_only=False)
            # map span doc_ids to row indices of this block
            order = np.argsort(ids, kind="stable")
            ridx = order[np.searchsorted(ids[order], sdoc)]
            gs = base[ridx] + sst
            ge = base[ridx] + sen
            so = np.argsort(gs, kind="stable")
            gs, ge = gs[so], ge[so]
            gpos = np.arange(len(doc_of), dtype=np.int64)
            # spans are disjoint per doc and doc blocks are disjoint in
            # global coords, so the latest span starting at-or-before pos
            # decides coverage
            j = np.searchsorted(gs, gpos, side="right") - 1
            jj = np.maximum(j, 0)
            covered = (j >= 0) & (gpos < ge[jj])
            keep &= ~covered
        kept_doc = doc_of[keep]
        kept_toks = toks.filter(pa.array(keep))
        # per-doc join of kept tokens (Arrow list + binary_join, no loop)
        kcnt = np.bincount(kept_doc, minlength=t.num_rows).astype(np.int64)
        offs = np.concatenate([[0], np.cumsum(kcnt)]).astype(np.int32)
        lists = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), kept_toks)
        joined = pc.binary_join(lists, " ")
        return pa.table(
            {"doc_id": t[id_col].cast(pa.int64()), "clean_text": joined}
        )

    by_doc = shard_refs(list(doc_refs), id_col, P, by_int=True)
    out = [
        strip.remote(spans[p], *[g[p] for g in by_doc]) for p in range(P)
    ]
    return ray.data.from_arrow_refs(out)


def dup_span_stats(
    ds,
    n: int = 8,
    min_count: int = 2,
    max_dup_frac: float = 0.3,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
):
    """Per-document duplicated-span totals + keep verdict: dup_tokens =
    total tokens covered by duplicated spans, n_tokens, and keep =
    (dup_tokens <= max_dup_frac * n_tokens) as an integer-exact rule
    (dup_tokens * 100 <= frac_pct * n_tokens). Every document appears in
    the output (docs with no duplicated span report 0), so the verdict can
    gate a curation pipeline directly."""
    import pyarrow.compute as pc

    import ray.data as _rd

    from ..exchange import default_partitions as _dp

    frac_pct = int(round(max_dup_frac * 100))
    P = num_partitions or _dp()
    doc_refs = list(ds.select_columns([id_col, text_col]).to_arrow_refs())
    span_refs = _span_refs(doc_refs, n, min_count, id_col, text_col, P)
    spans = (
        _rd.from_arrow(SPAN_SCHEMA.empty_table())
        if span_refs is None
        else _rd.from_arrow_refs(span_refs)
    )

    def span_partial(t: pa.Table) -> pa.Table:
        lens = pc.subtract(t["span_end"], t["span_start"])
        return pa.table({"doc_id": t["doc_id"], "dup_tokens": lens})

    from ..agg import exchange_groupby

    per_doc = exchange_groupby(
        spans.map_batches(span_partial, batch_format="pyarrow"),
        "doc_id",
        {"dup_tokens": ("dup_tokens", "sum")},
        num_partitions=num_partitions,
    )

    def tok_counts(t: pa.Table) -> pa.Table:
        _, doc_of, _, ids = _tokenize_block(t, id_col, text_col)
        cnt = np.bincount(doc_of, minlength=t.num_rows).astype(np.int64)
        return pa.table(
            {
                "doc_id": t[id_col].cast(pa.int64()),
                "n_tokens": pa.array(cnt, pa.int64()),
            }
        )

    totals = _rd.from_arrow_refs(list(doc_refs)).map_batches(
        tok_counts, batch_format="pyarrow"
    )

    from ..join import hash_join

    joined = hash_join(
        totals, per_doc, "doc_id", how="left", by_int=True,
        num_partitions=num_partitions,
    )

    def verdict(t: pa.Table) -> pa.Table:
        dup = (
            pc.fill_null(pc.cast(t["dup_tokens"], pa.int64()), 0)
            if "dup_tokens" in t.column_names
            else pa.array(np.zeros(t.num_rows, dtype=np.int64), pa.int64())
        )
        ntok = t["n_tokens"]
        keep = pc.less_equal(
            pc.multiply(dup, 100),
            pc.multiply(pc.cast(ntok, pa.int64()), frac_pct),
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pc.cast(ntok, pa.int64()),
                "dup_tokens": dup,
                "keep": keep,
            }
        )

    return joined.map_batches(verdict, batch_format="pyarrow")
