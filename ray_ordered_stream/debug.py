"""Debug sinks.

≙ the simulator's local output consumers:
- ``show_turns``        ≙ ``StandardOutputConsumer`` (human-readable text to
                          stdout; reference simulator/.../StandardOutputConsumer.java)
- ``write_json_debug``  ≙ ``JSONOutputConsumer`` (JSON lines;
                          simulator/.../JSONOutputConsumer.java)

Debug only — never in a hot path.
"""

from __future__ import annotations


def format_turn(row: dict) -> str:
    """One human-readable line per turn (stable column order)."""
    ts = row.get("ts")
    return (
        f"[{row.get('conv_id')}#{row.get('turn_idx')}] "
        f"{row.get('role', ''):>9} @ {ts}: {str(row.get('text', ''))[:80]}"
        + (f" (tool={row['tool']})" if row.get("tool") else "")
    )


def show_turns(ds, limit: int = 20, file=None) -> int:
    """Print the first ``limit`` turns of a Dataset/Table human-readably."""
    import pyarrow as pa

    rows = (
        ds.slice(0, limit).to_pylist()
        if isinstance(ds, pa.Table)
        else ds.take(limit)
    )
    for r in rows:
        print(format_turn(r), file=file)
    return len(rows)


def write_json_debug(ds, path: str) -> None:
    """JSON-lines dump of a (small) Dataset."""
    ds.write_json(path)
