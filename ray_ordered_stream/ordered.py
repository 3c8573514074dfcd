"""Public API: ``ordered_process`` — per-key in-sequence emission on Ray.

≙ the composite ``OrderBookProducer`` transform (reference:
order-book-pipeline/.../OrderBookProducer.java:32-77 = key extraction +
OrderedEventProcessor) returning the pair (output, processingStatuses)
exactly like ``OrderedEventProcessorResult``
(OrderBookProcessingPipeline.java:107-120).

Physical plan (SURVEY.md §7.0):

    input Dataset (arrival order)
      -> map-side split tasks: each block -> P per-partition sub-tables
      -> P long-lived OrderedWorker actors (the sharded state store);
         one actor call per (block-group, partition) drains contiguous runs
      -> emitted / status Arrow refs -> ray.data.from_arrow_refs (lazy)

The exchange is block-ref based: sub-tables travel through the object store
and are fetched by the owning actor (zero-copy on the same node), which is
how a multi-node shuffle moves data; nothing is materialized on the driver.
Ray Data's ``map_batches(cls, concurrency=N)`` is NOT used for the state
store because it does not guarantee key->actor affinity across epochs, which
checkpoint lineage requires (SURVEY.md §7.4.1).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import ray
import ray.data

from .partitioning import split_table
from .schema import ARRIVAL
from .state import OrderedConfig, OrderedPartitionState


@ray.remote
def _split_block(tbl: pa.Table, key: str, P: int, overrides) -> list[pa.Table]:
    return split_table(tbl, key, P, overrides)


@ray.remote
class OrderedWorker:
    """One partition of the sharded state store (≙ Beam keyed state owned by
    one worker, docs/pipeline-design.md:13-17). Serial execution per actor
    gives per-key serial state access for free within our routing."""

    def __init__(self, cfg: OrderedConfig):
        self.cfg = cfg
        self.state = OrderedPartitionState(cfg)

    def process_epoch(self, status_ts, *parts: pa.Table):
        """Feed this partition's sub-tables for one epoch (in arrival order);
        returns (emitted, status) Arrow tables."""
        tables = [t for t in parts if t.num_rows]
        if not tables:
            empty = parts[0].slice(0, 0)
            return self.state._empty_emitted(empty), self.state._status_for([], status_ts)
        batch = (
            pa.concat_tables(tables, promote_options="none")
            if len(tables) > 1
            else tables[0]
        )
        return self.state.process(batch, status_ts)

    def drain(self, status_ts):
        """Drain buffered overflow after a capped round (≙ re-firing of the
        batch timer; used with max_emit_per_round). Returns
        (emitted, status, n_emitted)."""
        if self.state.buffer is None or not self.state.buffer.num_rows:
            return None, None, 0
        empty = self.state.buffer.slice(0, 0)
        emitted, status = self.state.process(empty, status_ts)
        return emitted, status, emitted.num_rows

    def final_status(self, status_ts):
        return self.state._status_for(sorted(self.state.counters), status_ts)

    def buffered_rows(self) -> int:
        return 0 if self.state.buffer is None else self.state.buffer.num_rows

    def snapshot(self):
        return self.state.snapshot()

    def restore(self, snap):
        self.state = OrderedPartitionState.restore(self.cfg, snap)

    def ping(self):
        return True


@dataclass
class OrderedResult:
    """≙ OrderedEventProcessorResult: .ordered ≙ output(),
    .status ≙ processingStatuses()."""

    ordered: "ray.data.Dataset"
    status: "ray.data.Dataset"


class OrderedProcessor:
    """Long-lived engine handle: a fixed pool of P state actors fed epoch by
    epoch. ``ordered_process`` is the one-shot (single-epoch batch) facade."""

    def __init__(self, cfg: OrderedConfig | None = None, num_partitions: int | None = None,
                 overrides: dict[str, int] | None = None):
        self.cfg = cfg or OrderedConfig()
        if num_partitions is None:
            num_partitions = self.cfg.partitions or _default_partitions()
        self.P = num_partitions
        self.overrides = overrides
        self.workers = [
            OrderedWorker.options(num_cpus=self.cfg.actor_num_cpus).remote(self.cfg)
            for _ in range(self.P)
        ]
        self._emitted_refs: list[ray.ObjectRef] = []
        self._status_refs: list[ray.ObjectRef] = []

    # -- streaming feed ----------------------------------------------------

    def feed_epoch(self, ds_or_table, status_ts) -> tuple[list, list]:
        """Run one epoch through the state store. Returns (emitted_refs,
        status_refs) — one pair per partition; nothing touches the driver."""
        _check_columns(ds_or_table, self.cfg)
        block_refs = _to_block_refs(ds_or_table)
        if not block_refs:
            return [], []
        key = self.cfg.key
        if self.P == 1:
            per_block = [[b] for b in block_refs]
        else:
            per_block = [
                _split_block.options(num_returns=self.P).remote(
                    b, key, self.P, self.overrides
                )
                for b in block_refs
            ]
        emitted_refs, status_refs = [], []
        for p, w in enumerate(self.workers):
            parts = [pb[p] for pb in per_block]
            e, s = w.process_epoch.options(num_returns=2).remote(status_ts, *parts)
            emitted_refs.append(e)
            status_refs.append(s)
        if self.cfg.max_emit_per_round:
            emitted_refs, status_refs = self._drain_loop(emitted_refs, status_refs, status_ts)
        self._emitted_refs.extend(emitted_refs)
        self._status_refs.extend(status_refs)
        return emitted_refs, status_refs

    def _drain_loop(self, emitted_refs, status_refs, status_ts):
        # loop-drain capped overflow until every partition's buffer stops
        # yielding (bounded: each round emits >=1 row per non-empty buffer)
        pending = list(range(self.P))
        while pending:
            nxt = []
            calls = [
                self.workers[p].drain.options(num_returns=3).remote(status_ts)
                for p in pending
            ]
            counts = ray.get([c[2] for c in calls])
            for p, (e, s, _), n in zip(pending, calls, counts):
                if n:
                    emitted_refs.append(e)
                    status_refs.append(s)
                    nxt.append(p)
            pending = nxt
        return emitted_refs, status_refs

    # -- results -----------------------------------------------------------

    def datasets(self) -> OrderedResult:
        emitted = [r for r in self._emitted_refs if r is not None]
        status = [r for r in self._status_refs if r is not None]
        return OrderedResult(
            ordered=ray.data.from_arrow_refs(emitted),
            status=ray.data.from_arrow_refs(status),
        )

    def final_status(self, status_ts) -> "ray.data.Dataset":
        """Current consolidated per-key status (one row per key ever seen) —
        the completion surface used by the perf protocol (run-perf-test.sh
        check_processing_progress ≙ BASELINE.md 'Completion/progress')."""
        refs = [w.final_status.remote(status_ts) for w in self.workers]
        return ray.data.from_arrow_refs(refs)

    def buffered_rows(self) -> int:
        return sum(ray.get([w.buffered_rows.remote() for w in self.workers]))

    def shutdown(self):
        for w in self.workers:
            ray.kill(w)
        self.workers = []


def ordered_process(
    ds,
    cfg: OrderedConfig | None = None,
    num_partitions: int | None = None,
    status_ts=None,
    overrides: dict[str, int] | None = None,
) -> OrderedResult:
    """One-shot batch facade: feed the whole Dataset as a single epoch and
    return (ordered, status) Datasets. For multi-epoch streaming with
    checkpoint/resume use ``epochs.run_stream``."""
    import pandas as pd

    proc = OrderedProcessor(cfg, num_partitions, overrides)
    proc.feed_epoch(ds, status_ts or pd.Timestamp("1970-01-01"))
    return proc.datasets()


def _default_partitions() -> int:
    cpus = int(ray.cluster_resources().get("CPU", 2))
    return max(2, cpus // 2)


def _check_columns(ds_or_table, cfg: OrderedConfig) -> None:
    """Fail fast with a clear message instead of a KeyError from a remote
    split task."""
    if isinstance(ds_or_table, pa.Table):
        names = ds_or_table.column_names
    elif hasattr(ds_or_table, "schema"):
        names = ds_or_table.schema().names
    else:
        return
    missing = {cfg.key, cfg.seq} - set(names)
    if missing:
        raise ValueError(
            f"input is missing ordered-processing columns {sorted(missing)} "
            f"(have: {names}); configure OrderedConfig(key=..., seq=...)"
        )


def _to_block_refs(ds_or_table) -> list:
    if isinstance(ds_or_table, pa.Table):
        return [ray.put(ds_or_table)]
    if isinstance(ds_or_table, list):  # already refs
        return ds_or_table
    # ray.data.Dataset: execute and hand back the block refs (object store
    # resident; epochs bound the size of what is in flight at once).
    return list(ds_or_table.to_arrow_refs())
