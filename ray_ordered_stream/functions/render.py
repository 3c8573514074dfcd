"""Ordered conversation rendering: transcript turns -> one training example
per conversation.

The reference engine's whole point is releasing each key's events in
sequence order (docs/pipeline-design.md:117-122); the training-data consumer
of that guarantee is "render the conversation": concatenate every turn of a
conversation in turn order into a single role-tagged text blob (the shape an
SFT tokenizer ingests). At 100 TB this is a per-key ordered fold — exactly
one hash exchange on the key, then a fully vectorized in-partition pass:
lexsort by (key, seq), build the per-turn lines with the Arrow element-wise
join kernel, slice them into per-conversation lists via group-boundary
offsets, and join each list with the separator using Arrow's list-join
kernel. No per-conversation Python, no global sort, payload crosses the
object store exactly once.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..schema import KEY, SEQ


@ray.remote
def _render_partition(
    key: str, seq: str, role: str, text: str, line_sep: str, role_sep: str,
    *shards: pa.Table,
) -> pa.Table:
    out_schema = pa.schema(
        [
            (key, pa.string()),
            ("n_turns", pa.int64()),
            ("n_chars", pa.int64()),
            ("rendered", pa.string()),
        ]
    )
    real = [t for t in shards if t.num_rows]
    if not real:
        return out_schema.empty_table()
    tbl = pa.concat_tables(real, promote_options="none") if len(real) > 1 else real[0]

    karr = tbl[key]
    if isinstance(karr, pa.ChunkedArray):
        karr = karr.combine_chunks()
    enc = pc.dictionary_encode(karr)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = np.asarray(enc.indices).astype(np.int64)
    seqs = tbl[seq].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((seqs, codes))
    tbl = tbl.take(pa.array(order))
    c_s = codes[order]

    lines = pc.binary_join_element_wise(
        tbl[role].cast(pa.string()), tbl[text].cast(pa.string()), role_sep
    )
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    n = len(c_s)
    boundary = np.empty(n, dtype=bool)
    boundary[0] = True
    boundary[1:] = c_s[1:] != c_s[:-1]
    starts = np.flatnonzero(boundary)
    offsets = np.append(starts, n).astype(np.int32)
    per_conv = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), lines)
    rendered = pc.binary_join(per_conv, line_sep)
    conv_ids = karr.take(pa.array(order[starts]))
    n_turns = np.diff(offsets).astype(np.int64)
    return pa.table(
        {
            key: conv_ids.cast(pa.string()),
            "n_turns": pa.array(n_turns, pa.int64()),
            "n_chars": pc.utf8_length(rendered).cast(pa.int64()),
            "rendered": rendered,
        }
    )


@ray.remote
def _examples_partition(
    key: str, seq: str, role: str, text: str, target_role: str, k: int,
    line_sep: str, role_sep: str, *shards: pa.Table,
) -> pa.Table:
    from .chunk import ranges_join

    out_schema = pa.schema(
        [
            (key, pa.string()),
            (seq, pa.int64()),
            ("context", pa.string()),
            ("target", pa.string()),
        ]
    )
    real = [t for t in shards if t.num_rows]
    if not real:
        return out_schema.empty_table()
    tbl = pa.concat_tables(real, promote_options="none") if len(real) > 1 else real[0]

    karr = tbl[key]
    if isinstance(karr, pa.ChunkedArray):
        karr = karr.combine_chunks()
    enc = pc.dictionary_encode(karr)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = np.asarray(enc.indices).astype(np.int64)
    seqs = tbl[seq].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((seqs, codes))
    tbl = tbl.take(pa.array(order))
    c_s = codes[order]

    lines = pc.binary_join_element_wise(
        tbl[role].cast(pa.string()), tbl[text].cast(pa.string()), role_sep
    )
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    n = len(c_s)
    boundary = np.empty(n, dtype=bool)
    boundary[0] = True
    boundary[1:] = c_s[1:] != c_s[:-1]
    starts = np.flatnonzero(boundary)
    counts = np.diff(np.append(starts, n))
    conv_start = np.repeat(starts, counts)
    pos = np.arange(n, dtype=np.int64)
    is_target = np.asarray(
        pc.equal(tbl[role].cast(pa.string()), target_role).fill_null(False)
    )
    mask = is_target & (pos > conv_start)  # need >=1 turn of context
    sel = np.flatnonzero(mask)
    ctx = ranges_join(
        lines, np.maximum(conv_start[sel], sel - k), sel, line_sep
    )
    take = pa.array(sel, pa.int64())
    return pa.table(
        {
            key: tbl[key].take(take).cast(pa.string()),
            seq: pa.array(seqs[order][sel], pa.int64()),
            "context": ctx,
            "target": tbl[text].take(take).cast(pa.string()),
        }
    )


def next_turn_examples(
    ds,
    key: str = KEY,
    seq: str = SEQ,
    role: str = "role",
    text: str = "text",
    target_role: str = "assistant",
    k: int = 3,
    line_sep: str = "\n",
    role_sep: str = ": ",
    num_partitions: int | None = None,
):
    """Next-turn-prediction training examples: for every ``target_role``
    turn with at least one preceding turn, emit the rendered context of up
    to ``k`` preceding turns and the turn's text as the target — the
    per-key ordered sibling of ``render_conversations``. Same one-exchange
    plan; the context windows overlap, so they are gathered with the
    grouped-arange kernel (chunk.ranges_join) rather than list offsets.

    SQL mirror: ``string_agg(...) OVER (PARTITION BY key ORDER BY seq
    ROWS BETWEEN k PRECEDING AND 1 PRECEDING)`` filtered to target rows."""
    import ray.data

    from ..exchange import shard_refs

    if num_partitions is None:
        from ..exchange import default_partitions

        num_partitions = default_partitions()
    P = num_partitions
    block_refs = list(ds.to_arrow_refs())
    if not block_refs:
        return ds
    if P == 1:
        parts = [
            _examples_partition.remote(
                key, seq, role, text, target_role, k, line_sep, role_sep,
                *block_refs,
            )
        ]
    else:
        groups = shard_refs(block_refs, key, P)
        parts = [
            _examples_partition.remote(
                key, seq, role, text, target_role, k, line_sep, role_sep,
                *[g[p] for g in groups],
            )
            for p in range(P)
        ]
    return ray.data.from_arrow_refs(parts)


def render_conversations(
    ds,
    key: str = KEY,
    seq: str = SEQ,
    role: str = "role",
    text: str = "text",
    line_sep: str = "\n",
    role_sep: str = ": ",
    num_partitions: int | None = None,
):
    """Dataset of turns -> Dataset of one rendered example per conversation:
    ``(key, n_turns, n_chars, rendered)`` where ``rendered`` is
    ``role<role_sep>text`` lines joined by ``line_sep`` in ``seq`` order.

    SQL mirror: ``string_agg(role || role_sep || text, line_sep
    ORDER BY seq) GROUP BY key``."""
    import ray.data

    from ..exchange import shard_refs

    if num_partitions is None:
        from ..exchange import default_partitions

        num_partitions = default_partitions()
    P = num_partitions
    block_refs = list(ds.to_arrow_refs())
    if not block_refs:
        return ds
    if P == 1:
        return ray.data.from_arrow_refs(
            [
                _render_partition.remote(
                    key, seq, role, text, line_sep, role_sep, *block_refs
                )
            ]
        )
    groups = shard_refs(block_refs, key, P)
    parts = [
        _render_partition.remote(
            key, seq, role, text, line_sep, role_sep, *[g[p] for g in groups]
        )
        for p in range(P)
    ]
    return ray.data.from_arrow_refs(parts)
