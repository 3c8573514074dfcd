"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (nor in the library) calls ``ray.init`` / ``ray.shutdown``.

- ``entry()``       — flagship ordered-processing pipeline at sf0.001.
- ``queries()``     — every implemented operator/pipeline (SURVEY.md §2 and
                      the training-data extensions), keyed by name.
- ``oracle_sql()``  — DuckDB-runnable SQL mirror for EVERY query (100%
                      oracled: the sketch/LSH queries replay their seeded
                      hash families in HUGEINT wrap-mod arithmetic with
                      the constants inlined as literals).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: shuffled-arrival transcript stream (derived from events)
    through the ordered engine -> in-sequence emitted turns Dataset."""
    from ray_ordered_stream.pipelines.queries import q_ordered_replay

    return q_ordered_replay("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from ray_ordered_stream.pipelines.queries import QUERIES

    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from ray_ordered_stream.pipelines.queries import QUERIES

    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
