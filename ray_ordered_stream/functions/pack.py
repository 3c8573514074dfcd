"""Token-budget sequence packing: lay a whole corpus out as one global
token stream and assign every document its token interval and the
fixed-size training sequences ("packs") it lands in.

Pre-training pipelines concatenate documents into fixed-length sequences
(budget = context length), splitting documents across sequence boundaries.
The assignment for a document is a pure function of the GLOBAL running
token offset at its position in a deterministic corpus order (here:
``id`` order), so at 100 TB this is a distributed prefix sum, not a sort:

  1. one bounded sample pass picks integer range bounds on ``id``;
  2. each input block counts tokens per doc (one Arrow RE2 kernel) and
     range-splits ``(id, n_tokens)`` — the text column never shuffles;
  3. each partition sorts its contiguous id range and computes local
     cumulative sums, reporting ONE total upstream;
  4. the driver exclusive-scans the P totals (P integers, not data) and a
     second per-partition pass adds the offset and derives pack ids.

Every document row gets ``(begin_tok, end_tok]`` in the global stream,
``first_pack``/``last_pack`` (= floor division by the budget) and
``n_chunks`` (how many training sequences the doc touches; 0 for empty
docs). Exploding per-chunk rows is a local flat map from this plan.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

_TOKEN_RE = r"\w+"


@ray.remote
def _sample_ids(id_col: str, cap: int, tbl: pa.Table) -> np.ndarray:
    if id_col not in tbl.column_names:  # empty block with empty schema
        return np.empty(0, dtype=np.int64)
    ids = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(ids) > cap:
        stride = len(ids) // cap
        ids = ids[::stride][:cap]
    return ids


@ray.remote
def _project_tokens(id_col: str, text_col: str, *tbls: pa.Table) -> pa.Table:
    outs = []
    for t in tbls:
        if not t.num_rows:
            continue
        n_tok = pc.count_substring_regex(t[text_col], _TOKEN_RE).cast(pa.int64())
        outs.append(
            pa.table({id_col: t[id_col].cast(pa.int64()), "n_tokens": n_tok})
        )
    if not outs:
        return pa.table(
            {id_col: pa.array([], pa.int64()), "n_tokens": pa.array([], pa.int64())}
        )
    return pa.concat_tables(outs, promote_options="none")


@ray.remote
def _count_split(
    id_col: str, text_col: str, bounds: np.ndarray, *tbls: pa.Table
) -> list[pa.Table]:
    from ..exchange import split_compact

    P = len(bounds) + 1
    outs = []
    for t in tbls:
        if not t.num_rows:
            continue
        n_tok = pc.count_substring_regex(t[text_col], _TOKEN_RE).cast(pa.int64())
        proj = pa.table({id_col: t[id_col].cast(pa.int64()), "n_tokens": n_tok})
        ids = proj[id_col].to_numpy(zero_copy_only=False)
        parts = np.searchsorted(bounds, ids, side="right").astype(np.int64)
        outs.append(split_compact(proj, parts, P))
    if not outs:
        e = pa.table(
            {id_col: pa.array([], pa.int64()), "n_tokens": pa.array([], pa.int64())}
        )
        return [e] * P
    return [
        pa.concat_tables([o[p] for o in outs], promote_options="none")
        for p in range(P)
    ]


@ray.remote(num_returns=2)
def _local_scan(id_col: str, *shards: pa.Table):
    """Sort this contiguous id range, compute the local inclusive cumsum.
    Returns (table with local end offsets, partition token total)."""
    real = [t for t in shards if t.num_rows]
    if not real:
        e = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "_local_end": pa.array([], pa.int64()),
            }
        )
        return e, 0
    tbl = pa.concat_tables(real, promote_options="none") if len(real) > 1 else real[0]
    ids = tbl[id_col].to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    tbl = tbl.take(pa.array(order))
    toks = tbl["n_tokens"].to_numpy(zero_copy_only=False)
    local_end = np.cumsum(toks)
    tbl = tbl.append_column("_local_end", pa.array(local_end, pa.int64()))
    return tbl, int(local_end[-1]) if len(local_end) else 0


@ray.remote
def _finalize(budget: int, offset: int, id_col: str, tbl: pa.Table) -> pa.Table:
    n_tok = tbl["n_tokens"].to_numpy(zero_copy_only=False)
    end_tok = tbl["_local_end"].to_numpy(zero_copy_only=False) + offset
    begin_tok = end_tok - n_tok
    first_pack = begin_tok // budget
    nonempty = n_tok > 0
    last_pack = np.where(nonempty, (end_tok - 1) // budget, first_pack)
    n_chunks = np.where(nonempty, last_pack - first_pack + 1, 0)
    return pa.table(
        {
            id_col: tbl[id_col],
            "n_tokens": tbl["n_tokens"],
            "begin_tok": pa.array(begin_tok, pa.int64()),
            "end_tok": pa.array(end_tok, pa.int64()),
            "first_pack": pa.array(first_pack, pa.int64()),
            "last_pack": pa.array(last_pack, pa.int64()),
            "n_chunks": pa.array(n_chunks, pa.int64()),
        }
    )


def chunk_and_pack(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
    num_partitions: int | None = None,
    sample_per_block: int = 1024,
):
    """Global packing plan: one row per document with its token interval in
    the id-ordered corpus stream and the packs (fixed ``budget``-token
    training sequences) it occupies.

    SQL mirror: a running ``sum(n_tokens) OVER (ORDER BY id)`` window plus
    floor divisions — see queries.SQL_DOC_PACK."""
    import ray.data

    if num_partitions is None:
        from ..exchange import default_partitions

        num_partitions = default_partitions()
    P = num_partitions
    block_refs = list(ds.to_arrow_refs())
    if not block_refs:
        return ds

    samples = ray.get(
        [_sample_ids.remote(id_col, sample_per_block, b) for b in block_refs]
    )
    all_ids = np.sort(np.concatenate(samples)) if samples else np.array([], np.int64)
    if len(all_ids) == 0 or P == 1:
        bounds = np.array([], dtype=np.int64)
    else:
        qs = np.linspace(0, len(all_ids) - 1, P + 1)[1:-1].astype(np.int64)
        bounds = np.unique(all_ids[qs])
    P = len(bounds) + 1

    groups = [
        list(g)
        for g in np.array_split(
            np.array(block_refs, dtype=object),
            max(1, min(len(block_refs), 2 * P)),
        )
        if len(g)
    ]
    if P == 1:
        # degenerate key range: project per group, single scan partition
        projected = [
            _project_tokens.remote(id_col, text_col, *g) for g in groups
        ]
        scans = [_local_scan.remote(id_col, *projected)]
    else:
        split_groups = [
            _count_split.options(num_returns=P).remote(id_col, text_col, bounds, *g)
            for g in groups
        ]
        scans = [
            _local_scan.remote(id_col, *[g[p] for g in split_groups])
            for p in range(P)
        ]
    tbl_refs = [s[0] for s in scans]
    totals = ray.get([s[1] for s in scans])

    offsets = np.concatenate([[0], np.cumsum(totals)[:-1]]).astype(np.int64)
    finals = [
        _finalize.remote(budget, int(offsets[p]), id_col, tbl_refs[p])
        for p in range(P)
    ]
    return ray.data.from_arrow_refs(finals)


def _token_ids(flat: pa.Array, vocab_size: int) -> np.ndarray:
    """Stable token ids: int(md5(token)[:8], 16) % vocab_size — md5 runs
    once per UNIQUE token (the vocabulary, not the stream), everything
    else is a vectorized codes gather. Matches DuckDB
    ``('0x' || substr(md5(w),1,8))::BIGINT % V`` exactly."""
    import hashlib

    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = np.asarray(enc.indices).astype(np.int64)
    vocab = enc.dictionary.to_pylist()
    lut = np.array(
        [int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % vocab_size
         for w in vocab],
        dtype=np.int64,
    )
    return lut[codes]


@ray.remote
def _range_split_text(
    id_col: str, text_col: str, bounds: np.ndarray, *tbls: pa.Table
) -> list[pa.Table]:
    """Range split carrying the TEXT column (materialization is the one
    pack stage where payload must move — once)."""
    from ..exchange import split_compact

    P = len(bounds) + 1
    outs = []
    for t in tbls:
        if not t.num_rows:
            continue
        proj = pa.table(
            {id_col: t[id_col].cast(pa.int64()), text_col: t[text_col]}
        )
        ids = proj[id_col].to_numpy(zero_copy_only=False)
        parts = np.searchsorted(bounds, ids, side="right").astype(np.int64)
        outs.append(split_compact(proj, parts, P))
    if not outs:
        e = pa.table(
            {id_col: pa.array([], pa.int64()),
             text_col: pa.array([], pa.string())}
        )
        return [e] * P
    return [
        pa.concat_tables([o[p] for o in outs], promote_options="none")
        for p in range(P)
    ]


@ray.remote(num_returns=2)
def _tokenize_partition(
    id_col: str, text_col: str, vocab_size: int, *shards: pa.Table
):
    """Sort this id range, tokenize, return (flat token-id array, count)."""
    from .chunk import _tokenize_flat

    real = [t for t in shards if t.num_rows]
    if not real:
        return np.empty(0, dtype=np.int64), 0
    tbl = pa.concat_tables(real, promote_options="none") if len(real) > 1 else real[0]
    ids = tbl[id_col].to_numpy(zero_copy_only=False)
    tbl = tbl.take(pa.array(np.argsort(ids, kind="stable")))
    flat, _offsets = _tokenize_flat(tbl[text_col])
    tk = _token_ids(flat, vocab_size) if len(flat) else np.empty(0, np.int64)
    return tk, len(tk)


@ray.remote(num_returns=2)
def _emit_packs(budget: int, off: int, tokens: np.ndarray):
    """Packs fully inside this partition's token range as a table, plus
    the (<= 2) boundary fragments as (pack_id, start_pos, token list)."""
    out_schema = pa.schema(
        [
            ("pack_id", pa.int64()),
            ("n_tokens", pa.int64()),
            ("token_ids", pa.large_list(pa.int64())),
        ]
    )
    L = len(tokens)
    frags = []
    if L == 0:
        return out_schema.empty_table(), frags
    end = off + L
    k0 = -(-off // budget)          # first pack starting inside
    k1 = end // budget              # first pack NOT fully covered
    full = tokens[k0 * budget - off : k1 * budget - off] if k1 > k0 else \
        np.empty(0, dtype=np.int64)
    n_full = len(full) // budget
    offsets = np.arange(n_full + 1, dtype=np.int64) * budget
    tbl = pa.table(
        {
            "pack_id": pa.array(k0 + np.arange(n_full, dtype=np.int64)),
            "n_tokens": pa.array(np.full(n_full, budget, np.int64)),
            "token_ids": pa.LargeListArray.from_arrays(
                pa.array(offsets, pa.int64()), pa.array(full, pa.int64())
            ),
        }
    )
    if k1 >= k0:  # head fragment: [off, min(k0*B, end)) -> pack k0-1's tail
        head_end = min(k0 * budget - off, L)
        if head_end > 0:
            frags.append((off // budget, off, tokens[:head_end]))
        tail_start = k1 * budget - off
        if tail_start < L:
            frags.append((k1, off + tail_start, tokens[tail_start:]))
    else:  # the whole partition sits inside one pack
        frags.append((off // budget, off, tokens))
    return tbl, frags


@ray.remote
def _resolve_boundary_packs(budget: int, total: int, *frag_lists) -> pa.Table:
    """Assemble the straddling packs from every partition's boundary
    fragments (<= 2 per partition, <= budget tokens each — tiny)."""
    by_pack: dict[int, list] = {}
    for fl in frag_lists:
        for pack_id, start, toks in fl:
            by_pack.setdefault(int(pack_id), []).append((start, toks))
    packs = []
    for k in sorted(by_pack):
        parts = sorted(by_pack[k], key=lambda x: x[0])
        toks = np.concatenate([t for _s, t in parts])
        want = min(budget, total - k * budget)
        if len(toks) != want:  # full pack emitted locally already
            continue
        packs.append((k, toks))
    offsets = np.concatenate(
        [[0], np.cumsum([len(t) for _k, t in packs])]
    ).astype(np.int64) if packs else np.array([0], np.int64)
    flat = np.concatenate([t for _k, t in packs]) if packs else \
        np.empty(0, np.int64)
    return pa.table(
        {
            "pack_id": pa.array([k for k, _t in packs], pa.int64()),
            "n_tokens": pa.array(
                [len(t) for _k, t in packs], pa.int64()
            ),
            "token_ids": pa.LargeListArray.from_arrays(
                pa.array(offsets, pa.int64()), pa.array(flat, pa.int64())
            ),
        }
    )


def materialize_packs(
    ds,
    budget: int = 512,
    vocab_size: int = 65536,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
    sample_per_block: int = 1024,
):
    """MATERIALIZED sequence packing: the whole corpus tokenized (stable
    md5-derived ids) and laid out as fixed-``budget`` training sequences
    crossing document boundaries — the rows a pretraining loader reads.

    Same distributed-prefix-sum plan as ``chunk_and_pack`` but carrying
    text through the ONE range exchange; each partition emits its fully
    contained packs locally (a reshape — no further movement) and ships at
    most two boundary fragments to a single tiny resolver task. The final
    pack may be short (no padding — the trainer's collator owns that).
    """
    import ray.data

    if num_partitions is None:
        from ..exchange import default_partitions

        num_partitions = default_partitions()
    P = num_partitions
    block_refs = list(ds.to_arrow_refs())
    if not block_refs:
        return ds

    samples = ray.get(
        [_sample_ids.remote(id_col, sample_per_block, b) for b in block_refs]
    )
    all_ids = np.sort(np.concatenate(samples)) if samples else np.array([], np.int64)
    if len(all_ids) == 0 or P == 1:
        bounds = np.array([], dtype=np.int64)
    else:
        qs = np.linspace(0, len(all_ids) - 1, P + 1)[1:-1].astype(np.int64)
        bounds = np.unique(all_ids[qs])
    P = len(bounds) + 1

    groups = [
        list(g)
        for g in np.array_split(
            np.array(block_refs, dtype=object),
            max(1, min(len(block_refs), 2 * P)),
        )
        if len(g)
    ]
    if P == 1:
        toks = [_tokenize_partition.remote(id_col, text_col, vocab_size,
                                           *block_refs)]
    else:
        split_groups = [
            _range_split_text.options(num_returns=P).remote(
                id_col, text_col, bounds, *g
            )
            for g in groups
        ]
        toks = [
            _tokenize_partition.remote(
                id_col, text_col, vocab_size, *[g[p] for g in split_groups]
            )
            for p in range(P)
        ]
    counts = ray.get([t[1] for t in toks])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    total = int(sum(counts))

    emitted = [
        _emit_packs.remote(budget, int(offsets[p]), toks[p][0])
        for p in range(P)
    ]
    boundary = _resolve_boundary_packs.remote(
        budget, total, *[e[1] for e in emitted]
    )
    return ray.data.from_arrow_refs([e[0] for e in emitted] + [boundary])
