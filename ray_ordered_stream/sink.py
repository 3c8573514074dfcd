"""Exactly-once Parquet sink with commit manifests.

≙ the reference's three BigQuery Storage-Write sinks
(OrderBookProcessingPipeline.java:131-147) re-expressed for files
(SURVEY.md §4 'Retries / exactly-once'):

- every partition's epoch output is staged to its final path via
  write-temp + atomic ``os.replace`` (same filesystem);
- an epoch is COMMITTED only when ``_manifests/epoch-<n>.json`` exists; the
  manifest lists the part files and row counts;
- content is deterministic given (input epoch, state checkpoint), so a
  crashed epoch is simply re-run: parts are overwritten byte-identically and
  the manifest is rewritten — idempotent, exactly-once on read;
- readers (and resume) consult only committed manifests, never the
  directory listing.

Output layout is partitioned (one file per state partition per epoch), so a
failed run skips finished epochs and a 100 TB run never rewrites history.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq


def write_part_atomic(tbl: pa.Table, path: str) -> int:
    """Stage + atomic rename; returns rows written.

    zstd-1 instead of the snappy default: ~42% fewer bytes for ~30% more
    encode CPU (measured on the transcript workload). Disk bandwidth is the
    one resource that does NOT scale with cores (or with nodes, on shared
    stores), so trading scalable CPU for unscalable I/O is the right side."""
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    tmp = p.with_suffix(".tmp")
    pq.write_table(tbl, tmp, compression="zstd", compression_level=1)
    os.replace(tmp, p)
    return tbl.num_rows


class ManifestSink:
    def __init__(self, root: str, name: str):
        self.root = Path(root) / name
        self.name = name
        (self.root / "_manifests").mkdir(parents=True, exist_ok=True)

    def reset(self) -> None:
        """Remove every committed part + manifest (a fresh non-resume run
        must not inherit phantom epochs from a previous, longer run)."""
        import shutil

        shutil.rmtree(self.root, ignore_errors=True)
        (self.root / "_manifests").mkdir(parents=True, exist_ok=True)

    def part_path(self, epoch: int, partition: int) -> str:
        return str(self.root / f"epoch={epoch:05d}" / f"part-{partition:05d}.parquet")

    def manifest_path(self, epoch: int) -> Path:
        return self.root / "_manifests" / f"epoch-{epoch:05d}.json"

    def commit_epoch(self, epoch: int, parts: dict[int, int]) -> None:
        """parts: partition -> rows written. Manifest write is staged +
        atomically renamed; its existence IS the commit."""
        m = self.manifest_path(epoch)
        tmp = m.with_suffix(".tmp")
        tmp.write_text(
            json.dumps(
                {
                    "sink": self.name,
                    "epoch": epoch,
                    "parts": {
                        str(p): {"rows": n, "file": self.part_path(epoch, p)}
                        for p, n in sorted(parts.items())
                    },
                    "total_rows": int(sum(parts.values())),
                }
            )
        )
        os.replace(tmp, m)

    def committed_epochs(self) -> list[int]:
        out = []
        for f in sorted((self.root / "_manifests").glob("epoch-*.json")):
            out.append(int(f.stem.split("-")[1]))
        return out

    def committed_files(self) -> list[str]:
        files = []
        for e in self.committed_epochs():
            man = json.loads(self.manifest_path(e).read_text())
            files.extend(
                v["file"] for v in man["parts"].values() if v["rows"] > 0
            )
        return files

    def read(self):
        """Committed rows as a Ray Dataset (never trusts directory
        listings)."""
        import ray.data as rd

        files = self.committed_files()
        if not files:
            raise FileNotFoundError(f"sink {self.name}: no committed epochs")
        return rd.read_parquet(files)

    def total_committed_rows(self) -> int:
        return sum(
            json.loads(self.manifest_path(e).read_text())["total_rows"]
            for e in self.committed_epochs()
        )


def export_dataset(ds, out_dir: str, name: str = "export") -> dict:
    """Resumable batch export: one Parquet part per input block, each
    committed by its own atomic per-part manifest. Re-running the same
    export skips parts whose manifest already exists — the driver checks
    BEFORE submitting, so finished partitions are neither refetched nor
    rewritten and a failed 100 TB export resumes where it stopped. A
    ``_SUCCESS`` summary (part list + row counts) is written atomically
    once every part is committed; readers that need all-or-nothing
    semantics gate on it, incremental readers consult the part manifests.

    The batch sibling of ManifestSink's epoch protocol (same staged
    write + ``os.replace`` commit; ≙ the reference's Storage-Write sink
    semantics, OrderBookProcessingPipeline.java:131-147)."""
    import ray

    root = Path(out_dir) / name
    mdir = root / "_manifests"
    mdir.mkdir(parents=True, exist_ok=True)

    @ray.remote
    def write_part(tbl: pa.Table, path: str, mpath: str, part: int) -> int:
        rows = write_part_atomic(tbl, path)
        tmp = Path(mpath).with_suffix(".tmp")
        tmp.write_text(json.dumps({"part": part, "rows": rows, "file": path}))
        os.replace(tmp, mpath)
        return rows

    refs = list(ds.to_arrow_refs())
    pending, skipped, rows_skipped = [], 0, 0
    for i, ref in enumerate(refs):
        part_file = str(root / f"part-{i:05d}.parquet")
        mpath = mdir / f"part-{i:05d}.json"
        if mpath.exists() and Path(part_file).exists():
            skipped += 1
            rows_skipped += json.loads(mpath.read_text())["rows"]
            continue
        pending.append(write_part.remote(ref, part_file, str(mpath), i))
    rows_written = sum(ray.get(pending))

    parts = sorted(p.name for p in mdir.glob("part-*.json"))
    summary = {
        "name": name,
        "n_parts": len(refs),
        "rows": rows_written + rows_skipped,
        "parts_written": len(pending),
        "parts_skipped": skipped,
    }
    if len(parts) == len(refs):
        tmp = root / "_SUCCESS.tmp"
        tmp.write_text(json.dumps(summary))
        os.replace(tmp, root / "_SUCCESS")
    return summary


def export_partitioned(
    ds, out_dir: str, by: str, name: str = "export"
) -> dict:
    """Resumable HIVE-PARTITIONED export: ``name/<by>=<value>/part-*.parquet``
    so downstream reads prune whole directories by partition value (the
    "one directory per key" layout the 100-TB resume story needs).

    No shuffle: each input block splits locally by the partition column
    and writes one file per value it contains, then commits ONE atomic
    per-block manifest listing those files — a crashed run re-submits only
    blocks whose manifest is missing, rewriting their files in place
    (staged-write + ``os.replace``, so readers never see torn parts).
    Intended for low-cardinality partition columns (date / lang / source);
    a high-cardinality ``by`` would fan out to files-per-block × values.

    Returns the summary dict also written to ``_SUCCESS`` when all blocks
    have committed."""
    import pyarrow.compute as pc
    import ray

    root = Path(out_dir) / name
    mdir = root / "_manifests"
    mdir.mkdir(parents=True, exist_ok=True)

    @ray.remote
    def write_block(tbl: pa.Table, block: int, root_s: str, mpath: str) -> dict:
        col = tbl[by]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        files = []
        if tbl.num_rows:
            for v in pc.unique(col).to_pylist():
                sub = tbl.filter(pc.equal(col, v))
                d = Path(root_s) / f"{by}={v}"
                d.mkdir(parents=True, exist_ok=True)
                path = str(d / f"part-{block:05d}.parquet")
                rows = write_part_atomic(sub, path)
                files.append({"value": str(v), "file": path, "rows": rows})
        man = {"block": block, "files": files,
               "rows": int(sum(f["rows"] for f in files))}
        tmp = Path(mpath).with_suffix(".tmp")
        tmp.write_text(json.dumps(man))
        os.replace(tmp, mpath)
        return man

    refs = list(ds.to_arrow_refs())
    pending, skipped_rows, skipped = [], 0, 0
    for i, ref in enumerate(refs):
        mpath = mdir / f"block-{i:05d}.json"
        if mpath.exists():
            man = json.loads(mpath.read_text())
            if all(Path(f["file"]).exists() for f in man["files"]):
                skipped += 1
                skipped_rows += man["rows"]
                continue
        pending.append(write_block.remote(ref, i, str(root), str(mpath)))
    written = ray.get(pending)

    values: dict[str, int] = {}
    for mp in sorted(mdir.glob("block-*.json")):
        for f in json.loads(mp.read_text())["files"]:
            values[f["value"]] = values.get(f["value"], 0) + f["rows"]
    summary = {
        "name": name,
        "by": by,
        "n_blocks": len(refs),
        "blocks_written": len(written),
        "blocks_skipped": skipped,
        "rows": int(sum(m["rows"] for m in written)) + skipped_rows,
        "values": values,
    }
    if len(list(mdir.glob("block-*.json"))) == len(refs):
        tmp = root / "_SUCCESS.tmp"
        tmp.write_text(json.dumps(summary))
        os.replace(tmp, root / "_SUCCESS")
    return summary
