"""Distributed verification of the ordered-output invariant.

The reference's perf harness decides completion by querying the
processing-status table (run-perf-test.sh `check_processing_progress`);
this module is the complementary check on the DATA itself: per key, the
emitted ``turn_idx`` must be contiguous from its minimum (no gap, no
duplicate survived) and ``emit_seq`` must be strictly increasing in
``turn_idx`` order (emission respected sequence order).

Scale shape: one hash exchange on the key (exchange.shard_refs), then a
fully vectorized per-partition scan (lexsort + diff — the ordered-drain
shape); only a handful of counter rows ever reach the driver, so this runs
on the full 100-TB output, not a sample.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .schema import KEY, SEQ


def verify_ordered(
    ds,
    key: str = KEY,
    seq: str = SEQ,
    emit: str | None = "emit_seq",
    num_partitions: int | None = None,
) -> dict:
    """Check the per-key ordering invariant over an ordered-output Dataset.

    Returns ``{"keys": total_keys, "rows": total_rows, "gap_keys": n,
    "dup_keys": n, "emit_disorder_keys": n, "ok": bool}`` — zero
    ``*_keys`` counters and ``ok=True`` on a correct output."""
    import ray
    import ray.data  # noqa: F401  (ray.get on task refs only)

    from .exchange import default_partitions, shard_refs

    cols = [key, seq] + ([emit] if emit else [])

    @ray.remote
    def check(*shards: pa.Table) -> dict:
        real = [t for t in shards if t.num_rows]
        if not real:
            return {"keys": 0, "rows": 0, "gap_keys": 0, "dup_keys": 0,
                    "emit_disorder_keys": 0}
        tbl = (
            pa.concat_tables(real, promote_options="none")
            if len(real) > 1
            else real[0]
        )
        import pyarrow.compute as pc

        col = tbl[key]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        enc = pc.dictionary_encode(col)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = np.asarray(enc.indices).astype(np.int64)
        s = tbl[seq].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((s, codes))
        c, sv = codes[order], s[order]
        n = len(c)
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = c[1:] != c[:-1]
        d = np.empty(n, dtype=np.int64)
        d[0] = 1
        d[1:] = sv[1:] - sv[:-1]
        # within a key, consecutive sorted seqs must differ by exactly 1
        gap = (~new_key) & (d > 1)
        dup = (~new_key) & (d == 0)
        kc = c[new_key]
        gap_keys = len(np.unique(c[gap]))
        dup_keys = len(np.unique(c[dup]))
        emit_bad = 0
        if emit and emit in tbl.column_names:
            e = tbl[emit].to_numpy(zero_copy_only=False).astype(np.int64)[order]
            de = np.empty(n, dtype=np.int64)
            de[0] = 1
            de[1:] = e[1:] - e[:-1]
            emit_bad = len(np.unique(c[(~new_key) & (de <= 0)]))
        return {
            "keys": int(len(kc)),
            "rows": int(n),
            "gap_keys": int(gap_keys),
            "dup_keys": int(dup_keys),
            "emit_disorder_keys": int(emit_bad),
        }

    P = max(2, num_partitions or default_partitions())
    block_refs = list(ds.select_columns(cols).to_arrow_refs())
    if not block_refs:
        return {"keys": 0, "rows": 0, "gap_keys": 0, "dup_keys": 0,
                "emit_disorder_keys": 0, "ok": True}
    groups = shard_refs(block_refs, key, P)
    parts = ray.get([check.remote(*[g[p] for g in groups]) for p in range(P)])
    out = {k: sum(p[k] for p in parts) for k in parts[0]}
    out["ok"] = (
        out["gap_keys"] == 0
        and out["dup_keys"] == 0
        and out["emit_disorder_keys"] == 0
    )
    return out
