"""Checkpoint rescaling: migrate the sharded state store from P_old to
P_new partitions at a consistent cut.

Real streaming engines must rescale keyed state without replaying the
stream (Flink's savepoint rescaling is the canonical example); without this
a changed partition count invalidates the checkpoint lineage by design
(resume_epoch finds no consistent cut and the stream re-runs from scratch).

``rescale_checkpoint`` reads every old partition's merged state at the cut
epoch, re-routes every keyed piece with the SAME deterministic hash the
exchange uses (partitioning.key_partition_codes — mandatory, or routed keys
would not meet their state), and writes one FULL checkpoint per new
partition at the same epoch:

- ordered counters (per-key tuples) and the out-of-order buffer (split by
  the key column);
- window accumulator (acc entries by key; names rebuilt sorted; watermark =
  max over contributing partitions — at a consistent cut every partition
  has processed the same epochs, so the frontier is comparable);
- session accumulator (open intervals + per-key session_id counters);
- stream-join pending lefts, CEP carry tails, order-book levels/last.

Epochs AFTER the cut and partitions >= P_new are deleted so the new
lineage is unambiguous; a subsequent ``run_stream(..., num_partitions=
P_new)`` resumes from the cut and produces output content-equal to an
uninterrupted run (part-file layout differs — content, counts and per-key
results do not). Post-rescale emission order within a partition file may
differ from the pre-rescale run's (different key co-location), which is why
the rescaled checkpoint is a new deterministic BASE, not a byte-identical
continuation.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import numpy as np
import pyarrow as pa

from .checkpoint import (
    read_merged_checkpoint,
    write_partition_checkpoint,
)
from .partitioning import key_partition_codes, split_table


def _route(keys: list[str], new_P: int) -> np.ndarray:
    if not keys:
        return np.zeros(0, dtype=np.int64)
    return key_partition_codes(pa.array(keys, pa.string()), new_P)


def rescale_checkpoint(
    root: str, epoch: int, old_P: int, new_P: int, key: str = "conv_id"
) -> None:
    """Rewrite the checkpoint lineage at ``epoch`` from ``old_P`` to
    ``new_P`` partitions. ``key`` is the ordering-key column of the buffered
    rows. Raises if any old partition lacks a committed checkpoint at the
    cut (no consistent state to migrate)."""
    snaps = []
    for p in range(old_P):
        s = read_merged_checkpoint(root, p, epoch)
        if s is None:
            raise ValueError(
                f"partition {p} has no committed checkpoint at epoch {epoch}; "
                "rescale needs a consistent cut"
            )
        snaps.append(s)

    new: list[dict] = [
        {
            "counters": {},
            "buffer": None,
            "call_count": max(s.get("call_count", 0) for s in snaps),
            "last_status_us": max(
                (s.get("last_status_us") or 0 for s in snaps), default=0
            )
            or None,
        }
        for _ in range(new_P)
    ]

    # counters
    all_keys, all_vals = [], []
    for s in snaps:
        for k, v in s["counters"].items():
            all_keys.append(k)
            all_vals.append(v)
    for k, v, q in zip(all_keys, all_vals, _route(all_keys, new_P)):
        new[q]["counters"][k] = v

    # buffer rows
    bufs = [s["buffer"] for s in snaps if s["buffer"] is not None and s["buffer"].num_rows]
    if bufs:
        tbl = pa.concat_tables(bufs, promote_options="none") if len(bufs) > 1 else bufs[0]
        for q, part in enumerate(split_table(tbl, key, new_P)):
            new[q]["buffer"] = part if part.num_rows else None

    # windows accumulator
    if any("windows" in s for s in snaps):
        wm = max(
            (s["windows"]["watermark"] for s in snaps
             if "windows" in s and s["windows"]["watermark"] is not None),
            default=None,
        )
        accs: list[dict] = [dict() for _ in range(new_P)]
        names: list[set] = [set() for _ in range(new_P)]
        items = [
            (k, ws, v)
            for s in snaps
            if "windows" in s
            for (k, ws), v in s["windows"]["acc"].items()
        ]
        for (k, ws, v), q in zip(items, _route([i[0] for i in items], new_P)):
            accs[q][(k, ws)] = v
        nm = [n for s in snaps if "windows" in s for n in s["windows"].get("names", [])]
        for n, q in zip(nm, _route(nm, new_P)):
            names[q].add(n)
        for q in range(new_P):
            names[q].update(k for (k, _ws) in accs[q])
            new[q]["windows"] = {
                "watermark": wm,
                "acc": accs[q],
                "names": sorted(names[q]),
            }

    # session accumulator
    if any("sessions" in s for s in snaps):
        wm = max(
            (s["sessions"]["watermark"] for s in snaps
             if "sessions" in s and s["sessions"]["watermark"] is not None),
            default=None,
        )
        opens: list[list] = [[] for _ in range(new_P)]   # (name, s, e, c, u, a)
        sids: list[dict] = [dict() for _ in range(new_P)]
        for s in snaps:
            if "sessions" not in s:
                continue
            ss = s["sessions"]
            snames = ss["names"]
            rows = [(snames[int(o[0])], *o[1:]) for o in ss["open"]]
            for r, q in zip(rows, _route([r[0] for r in rows], new_P)):
                opens[q].append(r)
            nz = [(n, sid) for n, sid in zip(snames, ss["next_sid"]) if sid]
            for (n, sid), q in zip(nz, _route([n for n, _ in nz], new_P)):
                sids[q][n] = sid
        for q in range(new_P):
            nms = sorted({r[0] for r in opens[q]} | set(sids[q]))
            idx = {n: i for i, n in enumerate(nms)}
            next_sid = [0] * len(nms)
            for n, sid in sids[q].items():
                next_sid[idx[n]] = sid
            new[q]["sessions"] = {
                "watermark": wm,
                "names": nms,
                "open": [[idx[r[0]], *r[1:]] for r in opens[q]],
                "next_sid": next_sid,
            }

    # stream-join pending lefts
    if any("join" in s for s in snaps):
        pend: list[dict] = [dict() for _ in range(new_P)]
        items = [
            (k, v) for s in snaps if "join" in s
            for k, v in s["join"]["pending"].items()
        ]
        for (k, v), q in zip(items, _route([i[0] for i in items], new_P)):
            pend[q][k] = v
        for q in range(new_P):
            new[q]["join"] = {"pending": pend[q]}

    # CEP carry tails
    if any("cep" in s for s in snaps):
        cols = None
        rows: list[tuple] = []
        for s in snaps:
            c = s.get("cep", {}).get("carry")
            if not c:
                continue
            cols = list(c.keys())  # (key, seq, role, ts) — key first
            rows.extend(zip(*[c[col] for col in cols]))
        carries: list[list] = [[] for _ in range(new_P)]
        for r, q in zip(rows, _route([r[0] for r in rows], new_P)):
            carries[q].append(r)
        for q in range(new_P):
            if carries[q] and cols:
                new[q]["cep"] = {
                    "carry": {
                        col: [r[i] for r in carries[q]]
                        for i, col in enumerate(cols)
                    }
                }
            else:
                new[q]["cep"] = {"carry": None}

    # order book
    if any("book" in s for s in snaps):
        books: list[dict] = [dict() for _ in range(new_P)]
        lasts: list[dict] = [dict() for _ in range(new_P)]
        bitems = [
            (k, v) for s in snaps if "book" in s
            for k, v in s["book"]["books"].items()
        ]
        for (k, v), q in zip(bitems, _route([i[0] for i in bitems], new_P)):
            books[q][k] = v
        litems = [
            (k, v) for s in snaps if "book" in s
            for k, v in s["book"]["last"].items()
        ]
        for (k, v), q in zip(litems, _route([i[0] for i in litems], new_P)):
            lasts[q][k] = v
        for q in range(new_P):
            new[q]["book"] = {"books": books[q], "last": lasts[q]}

    # drop stale lineage FIRST (epochs after the cut, partitions >= new_P),
    # then write the rescaled FULL checkpoints at the cut epoch
    ck = Path(root) / "ckpt"
    for pdir in sorted(ck.glob("p=*")):
        pnum = int(pdir.name.split("=")[1])
        if pnum >= new_P:
            shutil.rmtree(pdir)
            continue
        for edir in sorted(pdir.glob("epoch-*")):
            if int(edir.name.split("-")[1]) > epoch:
                shutil.rmtree(edir)
    for q in range(new_P):
        write_partition_checkpoint(root, q, epoch, new[q], full=True)
