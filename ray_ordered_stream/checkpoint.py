"""Per-partition checkpoint lineage (SURVEY.md §4 'Checkpoint / resume').

Layout::

    <root>/ckpt/p=<partition>/epoch-<n>/
        buffer.parquet     # buffered out-of-order rows (may be absent)
        counters.parquet   # per-key counters incl. next_seq
        extras.json        # window/join accumulator state (small dicts)
        _COMMIT            # marker written last (atomic rename)

Commit order per epoch is: sink manifests FIRST, then the checkpoint
(SURVEY.md §7.4.3). After a crash the engine resumes from the newest epoch
whose checkpoint committed; any later epoch whose sink manifest exists is
re-produced deterministically and overwritten idempotently.
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq


def _dir(root: str, partition: int, epoch: int) -> Path:
    return Path(root) / "ckpt" / f"p={partition:05d}" / f"epoch-{epoch:05d}"


def write_partition_checkpoint(
    root: str, partition: int, epoch: int, snap: dict, full: bool = False
) -> str:
    """``full=True`` marks this epoch's counters as a complete snapshot (not a
    delta): restore then merges deltas only from the newest full epoch, which
    bounds resume cost on long streams (compaction)."""
    d = _dir(root, partition, epoch)
    d.mkdir(parents=True, exist_ok=True)

    if snap["buffer"] is not None and snap["buffer"].num_rows:
        tmp = d / "buffer.parquet.tmp"
        pq.write_table(snap["buffer"], tmp)
        os.replace(tmp, d / "buffer.parquet")
    else:
        # A re-run may overwrite an epoch dir that previously committed with
        # a non-empty buffer (crash recovery / changed config reusing the
        # out_root). A committed checkpoint must contain only files from the
        # current write, else resume restores phantom buffered rows.
        (d / "buffer.parquet").unlink(missing_ok=True)

    c = snap["counters"]
    keys = sorted(c)
    counters = pa.table(
        {
            "key": pa.array(keys, pa.string()),
            "received": pa.array([c[k][0] for k in keys], pa.int64()),
            "duplicates": pa.array([c[k][1] for k in keys], pa.int64()),
            "results": pa.array([c[k][2] for k in keys], pa.int64()),
            "next_seq": pa.array([c[k][3] for k in keys], pa.int64()),
            "last_event": pa.array([c[k][4] for k in keys], pa.bool_()),
            "digest": pa.array([c[k][5] for k in keys], pa.string()),
        }
    )
    tmp = d / "counters.parquet.tmp"
    pq.write_table(counters, tmp)
    os.replace(tmp, d / "counters.parquet")

    extras = {"call_count": snap.get("call_count", 0),
              "last_status_us": snap.get("last_status_us")}
    if "windows" in snap:
        w = snap["windows"]
        extras["windows"] = {
            "watermark": w["watermark"],
            "acc": [[k, ws, v] for (k, ws), v in w["acc"].items()],
            "names": w.get("names", []),
        }
    if "join" in snap:
        extras["join"] = snap["join"]
    if "sessions" in snap:
        extras["sessions"] = snap["sessions"]
    if "cep" in snap:
        extras["cep"] = snap["cep"]
    if "book" in snap:
        extras["book"] = snap["book"]
    if "user" in snap:
        extras["user"] = snap["user"]  # JSON-safe per-key map (userstate.py)
    tmp = d / "extras.json.tmp"
    tmp.write_text(json.dumps(extras))
    os.replace(tmp, d / "extras.json")

    full_marker = d / "_FULL"
    if full:
        tmp = d / "_FULL.tmp"
        tmp.write_text("ok")
        os.replace(tmp, full_marker)
    else:
        full_marker.unlink(missing_ok=True)  # re-run may change the cadence

    tmp = d / "_COMMIT.tmp"
    tmp.write_text("ok")
    os.replace(tmp, d / "_COMMIT")
    return str(d)


def read_partition_checkpoint(root: str, partition: int, epoch: int) -> dict | None:
    d = _dir(root, partition, epoch)
    if not (d / "_COMMIT").exists():
        return None
    buffer = None
    if (d / "buffer.parquet").exists():
        buffer = pq.read_table(d / "buffer.parquet")
    ct = pq.read_table(d / "counters.parquet")
    cols = ct.to_pydict()  # one Python conversion per column, not per cell
    counters = dict(
        zip(
            cols["key"],
            zip(
                cols["received"],
                cols["duplicates"],
                cols["results"],
                cols["next_seq"],
                cols["last_event"],
                cols["digest"],
            ),
        )
    )
    snap: dict = {"counters": counters, "buffer": buffer}
    extras = json.loads((d / "extras.json").read_text())
    snap["call_count"] = extras.get("call_count", 0)
    snap["last_status_us"] = extras.get("last_status_us")
    if "windows" in extras:
        snap["windows"] = {
            "watermark": extras["windows"]["watermark"],
            "names": extras["windows"].get("names", []),
            "acc": {(k, ws): v for k, ws, v in extras["windows"]["acc"]},
        }
    if "join" in extras:
        j = extras["join"]
        snap["join"] = {
            "pending": {k: [tuple(p) for p in v] for k, v in j["pending"].items()}
        }
    if "sessions" in extras:
        s = extras["sessions"]
        snap["sessions"] = {
            "watermark": s["watermark"],
            "names": s["names"],
            "open": [list(o) for o in s["open"]],
            "next_sid": list(s["next_sid"]),
        }
    if "cep" in extras:
        snap["cep"] = extras["cep"]
    if "book" in extras:
        snap["book"] = extras["book"]
    if "user" in extras:
        snap["user"] = extras["user"]
    return snap


def read_merged_checkpoint(root: str, partition: int, epoch: int) -> dict | None:
    """Reconstruct partition state at ``epoch`` from incremental counter
    deltas: merge counters of committed epochs in ascending order (last write
    per key wins) starting from the newest FULL snapshot <= epoch (compaction
    bound — restore cost is O(epochs since last full), not O(all epochs));
    buffer and window/join extras are written in full each epoch, so only the
    target epoch's are used."""
    latest = read_partition_checkpoint(root, partition, epoch)
    if latest is None:
        return None
    base = 0
    for e in range(epoch, -1, -1):
        d = _dir(root, partition, e)
        if (d / "_FULL").exists() and (d / "_COMMIT").exists():
            base = e
            break
    merged: dict = {}
    for e in range(base, epoch + 1):
        snap = read_partition_checkpoint(root, partition, e)
        if snap is None:
            continue  # partitions may skip epochs only if never committed
        merged.update(snap["counters"])
    latest["counters"] = merged
    return latest


def committed_epoch(root: str, partition: int) -> int | None:
    """Newest committed checkpoint epoch for a partition, or None."""
    base = Path(root) / "ckpt" / f"p={partition:05d}"
    if not base.exists():
        return None
    epochs = [
        int(d.name.split("-")[1])
        for d in base.glob("epoch-*")
        if (d / "_COMMIT").exists()
    ]
    return max(epochs) if epochs else None


def write_lineage_meta(
    root: str, partitions: int, clear_mismatched: bool = False,
    overrides: dict[str, int] | None = None,
) -> None:
    """Record the partition count the checkpoint lineage was written with
    (SURVEY.md §7.4.1: P is part of the lineage). ``clear_mismatched`` is
    for the stream drivers: if an existing lineage was written with a
    DIFFERENT P it is invalid for the new run and is cleared — that path is
    only reachable with resume=False (resume raises first), so the caller
    already opted into a from-scratch rerun. ``rescale_checkpoint`` instead
    updates the meta in place after migrating the partition state.

    ``overrides`` (hot-key partition pins from skew salting) are part of the
    routing and therefore of the lineage: a resumed run MUST route with the
    recorded overrides or keys would miss their checkpointed state. For the
    same reason ``clear_mismatched`` compares the pins too — a resume=False
    rerun with a different salt setting must not leave stale checkpoints
    routed under the old pins for a later crash-resume to silently adopt."""
    ck = Path(root) / "ckpt"
    meta = read_lineage_meta(root)
    if (
        meta is not None
        and clear_mismatched
        and (
            meta.get("partitions") != partitions
            or (meta.get("overrides") or None) != (overrides or None)
        )
    ):
        shutil.rmtree(ck)
    ck.mkdir(parents=True, exist_ok=True)
    m: dict = {"partitions": partitions}
    if overrides:
        m["overrides"] = overrides
    write_lineage_meta_raw(root, m)


def write_lineage_meta_raw(root: str, meta: dict) -> None:
    ck = Path(root) / "ckpt"
    ck.mkdir(parents=True, exist_ok=True)
    tmp = ck / "meta.json.tmp"
    tmp.write_text(json.dumps(meta))
    os.replace(tmp, ck / "meta.json")


def read_lineage_meta(root: str) -> dict | None:
    """The lineage meta dict ({"partitions": P, optional "migrating_to": Q})
    or None for a pre-meta / fresh lineage."""
    f = Path(root) / "ckpt" / "meta.json"
    if not f.exists():
        return None
    return json.loads(f.read_text())


def resume_epoch(root: str, partitions: int) -> int | None:
    """Newest epoch committed by ALL partitions (the consistent cut).

    Raises if the lineage records a different partition count: resuming
    with fewer partitions would silently drop the extra partitions' keyed
    state (counters, buffers, open windows/sessions); resuming with more
    would re-run with partial state. Rescaling is an explicit operation
    (``rescale.rescale_checkpoint``). Also raises while a rescale is
    in flight (``migrating_to`` marker): the lineage is mixed-routing until
    the rescale completes, and re-running the rescale is the only safe move.
    """
    meta = read_lineage_meta(root)
    if meta is not None and meta.get("migrating_to") is not None:
        raise ValueError(
            f"checkpoint lineage at {root} has an interrupted rescale "
            f"({meta['partitions']} -> {meta['migrating_to']} partitions); "
            "re-run rescale.rescale_checkpoint(...) to complete it (the "
            "migration is idempotent), or pass resume=False to restart."
        )
    recorded = None if meta is None else meta.get("partitions")
    if recorded is not None and recorded != partitions:
        raise ValueError(
            f"checkpoint lineage at {root} was written with {recorded} "
            f"partitions but this run uses {partitions}; resuming would "
            "silently lose keyed state. Migrate with "
            "rescale.rescale_checkpoint(...), rerun with the recorded "
            "partition count, or pass resume=False to restart from scratch."
        )
    per = [committed_epoch(root, p) for p in range(partitions)]
    if any(e is None for e in per):
        return None
    return min(per)
