"""TF-IDF keyword extraction over a document corpus.

Composed from the engine's own scale primitives, nothing bespoke:

  tf  — per-batch vectorized tokenization (same Arrow RE2 ``\\w+``
        semantics as textstats) + per-(doc, token) counts via
        dictionary-encode + lexsort + boundary diff. One row per distinct
        (doc, token) leaves the batch; the text itself never shuffles.
  df  — a (doc, token) pair is globally unique after tf, so document
        frequency is a plain Sum-groupby of per-batch token value-counts
        (vocabulary-sized shuffle, corpus-sized never moves).
  join — ``join.hash_join`` co-partitioning exchange on ``token`` (the df
        side could be broadcast when the vocabulary is small; the hash
        join is the 100 TB-safe default where vocabularies are billions
        of n-grams).
  top-k — per-doc rank by (tfidf DESC, token ASC) with the partial-prune +
        one-exchange shape of functions/topk (Arrow multi-key sort here
        because the tiebreak is a string column).

The tf Dataset is executed ONCE (its block refs are shared by the df
aggregation and the join probe side) — no double tokenization pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _combine(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _term_freq_batch(id_col: str, text_col: str, t: pa.Table) -> pa.Table:
    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "token": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
        }
    )
    if not t.num_rows:
        return empty
    low = pc.utf8_lower(_combine(t[text_col]))
    words = pc.utf8_split_whitespace(pc.replace_substring_regex(low, r"\W+", " "))
    words = _combine(words)
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
    if not len(toks):
        return empty
    enc = _combine(pc.dictionary_encode(toks))
    tok_codes = np.asarray(enc.indices).astype(np.int64)
    order = np.lexsort((tok_codes, doc_of))
    d_s, c_s = doc_of[order], tok_codes[order]
    n = len(d_s)
    boundary = np.empty(n, dtype=bool)
    boundary[0] = True
    boundary[1:] = (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])
    starts = np.flatnonzero(boundary)
    tf = np.diff(np.append(starts, n)).astype(np.int64)
    ids = _combine(t[id_col].cast(pa.int64())).take(pa.array(d_s[starts]))
    tokens = enc.dictionary.take(pa.array(c_s[starts]))
    return pa.table({id_col: ids, "token": tokens, "tf": pa.array(tf, pa.int64())})


def doc_term_freqs(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Dataset of documents -> Dataset of (id, token, tf) rows, one per
    distinct (document, token)."""
    return ds.map_batches(
        lambda t: _term_freq_batch(id_col, text_col, t), batch_format="pyarrow"
    )


def _topk_partition(
    id_col: str, k: int, *shards: pa.Table
) -> pa.Table:
    real = [t for t in shards if t.num_rows]
    if not real:
        return shards[0].slice(0, 0) if shards else pa.table({})
    tbl = pa.concat_tables(real, promote_options="none") if len(real) > 1 else real[0]
    order = pc.sort_indices(
        tbl,
        sort_keys=[
            (id_col, "ascending"),
            ("tfidf", "descending"),
            ("token", "ascending"),
        ],
    )
    tbl = tbl.take(order)
    ids = tbl[id_col].to_numpy(zero_copy_only=False)
    n = len(ids)
    boundary = np.empty(n, dtype=bool)
    boundary[0] = True
    boundary[1:] = ids[1:] != ids[:-1]
    firsts = np.flatnonzero(boundary)
    first_of = np.repeat(firsts, np.diff(np.append(firsts, n)))
    rank = np.arange(n) - first_of
    return tbl.filter(pa.array(rank < k))


def tfidf_top_terms(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    n_docs: int | None = None,
    num_partitions: int | None = None,
):
    """Top-k tokens per document by tf-idf (tf * ln(N/df)), deterministic
    tie-break on the token. Output: (id, token, tf, df, tfidf)."""
    import ray
    import ray.data

    from ..exchange import default_partitions, shard_refs
    from ..join import hash_join

    if n_docs is None:
        n_docs = ds.count()
    if num_partitions is None:
        num_partitions = default_partitions()
    P = num_partitions

    # execute the tf pipeline once; share its refs between df and the join
    tf_refs = list(doc_term_freqs(ds, id_col, text_col).to_arrow_refs())
    if not tf_refs:
        return ds
    tf_ds_a = ray.data.from_arrow_refs(list(tf_refs))
    tf_ds_b = ray.data.from_arrow_refs(list(tf_refs))

    def df_partial(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table(
                {"token": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
            )
        vc = pc.value_counts(_combine(t["token"]))
        return pa.table(
            {"token": vc.field("values"), "df": vc.field("counts").cast(pa.int64())}
        )

    from ..agg import exchange_groupby

    df_ds = exchange_groupby(
        tf_ds_a.map_batches(df_partial, batch_format="pyarrow"),
        "token",
        {"df": ("df", "sum")},
        num_partitions=P,
    )

    joined = hash_join(tf_ds_b, df_ds, key="token", num_partitions=P)

    def score(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return t.append_column("tfidf", pa.array([], pa.float64()))
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        df = t["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        tfidf = tf * np.log(float(n_docs) / df)
        return t.append_column("tfidf", pa.array(tfidf, pa.float64()))

    scored = joined.map_batches(score, batch_format="pyarrow")

    # partial prune inside each scored block, then one exchange on the doc id
    pruned = scored.map_batches(
        lambda t: _topk_partition(id_col, k, t), batch_format="pyarrow"
    )
    block_refs = list(pruned.to_arrow_refs())
    if not block_refs:
        return pruned
    final = ray.remote(_topk_partition)
    if P < 2:
        return ray.data.from_arrow_refs(
            [final.remote(id_col, k, *block_refs)]
        )
    groups = shard_refs(block_refs, id_col, P, by_int=True)
    parts = [
        final.remote(id_col, k, *[g[p] for g in groups]) for p in range(P)
    ]
    return ray.data.from_arrow_refs(parts)
