"""Checkpoint rescaling: migrate the sharded state store from P_old to
P_new partitions at a consistent cut.

Real streaming engines must rescale keyed state without replaying the
stream (Flink's savepoint rescaling is the canonical example); without this
a changed partition count invalidates the checkpoint lineage by design
(the lineage records its partition count in ``ckpt/meta.json``;
``resume_epoch`` raises on a mismatch rather than silently resuming from a
partial cut, and ``resume=False`` restarts from scratch).

``rescale_checkpoint`` reads every old partition's merged state at the cut
epoch, re-routes every keyed piece with the SAME deterministic hash the
exchange uses (partitioning.key_partition_codes — mandatory, or routed keys
would not meet their state), and writes one FULL checkpoint per new
partition at the same epoch:

- ordered counters (per-key tuples) and the out-of-order buffer (split by
  the key column);
- window accumulator (acc entries by key; names rebuilt sorted; watermark =
  MIN over contributing partitions — a key inheriting a FARTHER frontier
  than its old partition's would release its windows/sessions early and
  split them vs an uninterrupted run; min only delays release, which is
  content-invariant under bounded lateness);
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

import json
import os
import shutil
from pathlib import Path

import numpy as np
import pyarrow as pa

from .checkpoint import (
    read_lineage_meta,
    read_merged_checkpoint,
    write_lineage_meta_raw,
    write_partition_checkpoint,
)
from .partitioning import key_partition_codes, split_table


def _route(
    keys: list[str], new_P: int, overrides: dict[str, int] | None = None
) -> np.ndarray:
    if not keys:
        return np.zeros(0, dtype=np.int64)
    return key_partition_codes(pa.array(keys, pa.string()), new_P, overrides)


def _derive_old_P(root: str) -> int | None:
    """The lineage's actual partition count: the recorded meta if present,
    else the number of ``p=*`` directories (pre-meta lineages)."""
    meta = read_lineage_meta(root)
    if meta is not None and meta.get("partitions") is not None:
        return meta["partitions"]
    dirs = sorted((Path(root) / "ckpt").glob("p=*"))
    return len(dirs) or None


def rescale_checkpoint(
    root: str, epoch: int, old_P: int, new_P: int, key: str = "conv_id"
) -> None:
    """Rewrite the checkpoint lineage at ``epoch`` from ``old_P`` to
    ``new_P`` partitions. ``key`` is the ordering-key column of the buffered
    rows. Raises if any old partition lacks a committed checkpoint at the
    cut (no consistent state to migrate), or if ``old_P`` does not match the
    lineage's actual partition count (an understated old_P would leave
    un-migrated partitions behind as silent mixed-lineage corruption)."""
    actual = _derive_old_P(root)
    if actual is not None and actual != old_P:
        raise ValueError(
            f"old_P={old_P} but the checkpoint lineage at {root} was written "
            f"with {actual} partitions; rescaling a subset would corrupt the "
            "lineage"
        )
    meta = read_lineage_meta(root)
    resuming_migration = (
        meta is not None and meta.get("migrating_to") is not None
    )
    if resuming_migration and meta["migrating_to"] != new_P:
        raise ValueError(
            f"an interrupted rescale targets {meta['migrating_to']} "
            f"partitions; finish it (same new_P) before rescaling to {new_P}"
        )
    # hot-key pins (skew salting) are routing and routing is lineage: remap
    # the recorded pins round-robin over new_P (order preserved = heaviest
    # first), route the migrated state with the NEW pins, and record them in
    # the new meta so the resumed run routes identically. Deterministic, so
    # re-running after a crash rebuilds the same stage.
    old_overrides = (meta or {}).get("overrides") or None
    new_overrides = (
        {k: i % new_P for i, k in enumerate(old_overrides)}
        if old_overrides
        else None
    )

    # Two-phase crash-safe protocol. Phase boundaries on disk:
    #   meta "migrating_to"  — set before anything is modified; resume_epoch
    #                          raises while present
    #   _rescale/stage.json  — written after ALL migrated checkpoints are
    #                          staged (old lineage still untouched)
    #   swap                 — replace cut-epoch dirs from the stage, drop
    #                          stale lineage; every step derivable from the
    #                          stage alone, so re-running the swap after a
    #                          crash is idempotent
    # A crash before stage.json re-runs the (pure) rebuild; a crash after it
    # re-runs only the swap; old state is never modified before the stage is
    # complete, so no key is ever without a durable home.
    ck = Path(root) / "ckpt"
    stage_root = ck / "_rescale"
    stage_marker = stage_root / "stage.json"
    stage_ready = False
    if resuming_migration and stage_marker.exists():
        sm = json.loads(stage_marker.read_text())
        stage_ready = sm.get("epoch") == epoch and sm.get("new_P") == new_P

    if not stage_ready:
        snaps = []
        for p in range(old_P):
            s = read_merged_checkpoint(root, p, epoch)
            if s is None:
                raise ValueError(
                    f"partition {p} has no committed checkpoint at epoch "
                    f"{epoch}; rescale needs a consistent cut"
                )
            snaps.append(s)
        new = _migrate_snapshots(snaps, new_P, key, new_overrides)
        mig_meta: dict = {"partitions": old_P, "migrating_to": new_P}
        if old_overrides:
            mig_meta["overrides"] = old_overrides
        write_lineage_meta_raw(root, mig_meta)
        if stage_root.exists():  # stale stage from an older aborted attempt
            shutil.rmtree(stage_root)
        for q in range(new_P):
            write_partition_checkpoint(str(stage_root), q, epoch, new[q],
                                       full=True)
        tmp = stage_root / "stage.json.tmp"
        tmp.write_text(json.dumps({"epoch": epoch, "new_P": new_P}))
        os.replace(tmp, stage_marker)

    _swap_stage(ck, stage_root, epoch, new_P)
    final_meta: dict = {"partitions": new_P}
    if new_overrides:
        final_meta["overrides"] = new_overrides
    write_lineage_meta_raw(root, final_meta)
    shutil.rmtree(stage_root, ignore_errors=True)


def _migrate_snapshots(
    snaps: list[dict], new_P: int, key: str,
    overrides: dict[str, int] | None = None,
) -> list[dict]:
    """Pure re-route of ``old_P`` merged snapshots into ``new_P`` migrated
    snapshots (no disk I/O — re-runnable after any crash). ``overrides`` are
    the NEW lineage's hot-key pins; every routed piece must use them."""
    def route(keys: list[str]) -> np.ndarray:
        return _route(keys, new_P, overrides)
    new: list[dict] = [
        {
            "counters": {},
            "buffer": None,
            "call_count": max(s.get("call_count", 0) for s in snaps),
            # NB: 0 is a legitimate value (status_ts epoch ladder starts at
            # 1970-01-01) and must not collapse to None, or the interval-
            # suppression phase is lost on resume.
            "last_status_us": max(
                (s["last_status_us"] for s in snaps
                 if s.get("last_status_us") is not None),
                default=None,
            ),
        }
        for _ in range(new_P)
    ]

    # counters
    all_keys, all_vals = [], []
    for s in snaps:
        for k, v in s["counters"].items():
            all_keys.append(k)
            all_vals.append(v)
    for k, v, q in zip(all_keys, all_vals, route(all_keys)):
        new[q]["counters"][k] = v

    # buffer rows
    bufs = [s["buffer"] for s in snaps if s["buffer"] is not None and s["buffer"].num_rows]
    if bufs:
        tbl = pa.concat_tables(bufs, promote_options="none") if len(bufs) > 1 else bufs[0]
        for q, part in enumerate(split_table(tbl, key, new_P, overrides)):
            new[q]["buffer"] = part if part.num_rows else None

    # windows accumulator. Watermark merges with MIN: the frontier is
    # per-partition event time, so a key moved next to faster keys must not
    # inherit their farther frontier (early release splits its windows /
    # sessions vs an uninterrupted run); min only delays release, which is
    # content-invariant under bounded lateness.
    if any("windows" in s for s in snaps):
        wm = min(
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
        for (k, ws, v), q in zip(items, route([i[0] for i in items])):
            accs[q][(k, ws)] = v
        nm = [n for s in snaps if "windows" in s for n in s["windows"].get("names", [])]
        for n, q in zip(nm, route(nm)):
            names[q].add(n)
        for q in range(new_P):
            names[q].update(k for (k, _ws) in accs[q])
            new[q]["windows"] = {
                "watermark": wm,
                "acc": accs[q],
                "names": sorted(names[q]),
            }

    # session accumulator (watermark min-merge: same reasoning as windows)
    if any("sessions" in s for s in snaps):
        wm = min(
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
            for r, q in zip(rows, route([r[0] for r in rows])):
                opens[q].append(r)
            nz = [(n, sid) for n, sid in zip(snames, ss["next_sid"]) if sid]
            for (n, sid), q in zip(nz, route([n for n, _ in nz])):
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
        for (k, v), q in zip(items, route([i[0] for i in items])):
            pend[q][k] = v
        for q in range(new_P):
            new[q]["join"] = {"pending": pend[q]}

    # CEP state: PatternMatcher snapshots are {carry, watermark};
    # AbsenceMatcher snapshots are {pm: {carry, watermark}, pending} —
    # both the inner carry AND the pending-candidate rows re-route by key
    if any("cep" in s for s in snaps):
        absence = any("pm" in s.get("cep", {}) for s in snaps)

        def inner(s):
            c = s.get("cep", {})
            return c.get("pm", c)

        cols = None
        rows: list[tuple] = []
        for s in snaps:
            c = inner(s).get("carry")
            if not c:
                continue
            cols = list(c.keys())  # (key, seq, role, ts) — key first
            rows.extend(zip(*[c[col] for col in cols]))
        carries: list[list] = [[] for _ in range(new_P)]
        for r, q in zip(rows, route([r[0] for r in rows])):
            carries[q].append(r)
        pm_parts = [
            {
                "carry": {
                    col: [r[i] for r in carries[q]]
                    for i, col in enumerate(cols)
                }
            }
            if carries[q] and cols
            else {"carry": None}
            for q in range(new_P)
        ]
        if not absence:
            for q in range(new_P):
                new[q]["cep"] = pm_parts[q]
        else:
            from .cep import _PENDING_COLS

            pend_rows: list[tuple] = []
            for s in snaps:
                p = s.get("cep", {}).get("pending")
                if not p or not p.get("keys"):
                    continue
                pend_rows.extend(
                    zip(p["keys"], *[p[c] for c in _PENDING_COLS])
                )
            pends: list[list] = [[] for _ in range(new_P)]
            for r, q in zip(pend_rows, route([r[0] for r in pend_rows])):
                pends[q].append(r)
            for q in range(new_P):
                new[q]["cep"] = {
                    "pm": pm_parts[q],
                    "pending": {
                        "keys": [r[0] for r in pends[q]],
                        **{
                            c: [r[i + 1] for r in pends[q]]
                            for i, c in enumerate(_PENDING_COLS)
                        },
                    },
                }

    # order book
    if any("book" in s for s in snaps):
        books: list[dict] = [dict() for _ in range(new_P)]
        lasts: list[dict] = [dict() for _ in range(new_P)]
        bitems = [
            (k, v) for s in snaps if "book" in s
            for k, v in s["book"]["books"].items()
        ]
        for (k, v), q in zip(bitems, route([i[0] for i in bitems])):
            books[q][k] = v
        litems = [
            (k, v) for s in snaps if "book" in s
            for k, v in s["book"]["last"].items()
        ]
        for (k, v), q in zip(litems, route([i[0] for i in litems])):
            lasts[q][k] = v
        for q in range(new_P):
            new[q]["book"] = {"books": books[q], "last": lasts[q]}

    # user state (userstate.py contract: snapshot() is a JSON-safe map
    # keyed by the ordering-key value, so each key's entry re-routes with
    # the same hash as the counters — the generic MutableState analogue of
    # the per-operator migrations above)
    if any("user" in s for s in snaps):
        uitems = [
            (k, v) for s in snaps if "user" in s
            for k, v in s["user"].items()
        ]
        uparts: list[dict] = [dict() for _ in range(new_P)]
        for (k, v), q in zip(uitems, route([i[0] for i in uitems])):
            uparts[q][k] = v
        for q in range(new_P):
            new[q]["user"] = uparts[q]

    return new


def _swap_stage(ck: Path, stage_root: Path, epoch: int, new_P: int) -> None:
    """Install the staged migrated checkpoints over the live lineage. Every
    step is derivable from the stage alone and idempotent: stale lineage
    deletion re-runs harmlessly, and a staged dir already moved by a
    previous (crashed) swap is skipped (its dest carries the _COMMIT)."""
    for pdir in sorted(ck.glob("p=*")):
        pnum = int(pdir.name.split("=")[1])
        if pnum >= new_P:
            shutil.rmtree(pdir)
            continue
        for edir in sorted(pdir.glob("epoch-*")):
            if int(edir.name.split("-")[1]) > epoch:
                shutil.rmtree(edir)
    for q in range(new_P):
        src = stage_root / "ckpt" / f"p={q:05d}" / f"epoch-{epoch:05d}"
        dst = ck / f"p={q:05d}" / f"epoch-{epoch:05d}"
        if not src.exists():
            continue  # moved by a previous (crashed) swap
        if dst.exists():
            shutil.rmtree(dst)  # replace old cut-epoch state wholesale
        dst.parent.mkdir(parents=True, exist_ok=True)
        os.replace(src, dst)
