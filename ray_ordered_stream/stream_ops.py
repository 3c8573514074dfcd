"""In-actor streaming operators fed by the ordered emission stream.

These are the streaming counterparts of windows.py / join.py, co-located
with the ordered state in the same partition actor (same key => no extra
shuffle, SURVEY.md §7.3):

- ``WindowAccumulator``: per (key, window) tumbling counts; window rows are
  released when the event-time watermark (max ts seen - allowed lateness)
  passes window_end — the role Beam's watermark machinery plays in the
  reference's tests (OrderBookProcessingPipelineTest.java:204-217).
- ``StreamJoiner``: forward as-of join of two role streams. Because the
  ordered processor emits strictly in sequence per key, the join is
  sequence-driven and needs no watermark: an arriving right-side (assistant)
  turn matches every pending left-side (user) turn with a smaller turn_idx.

Both are pure Python/numpy over Arrow batches (no Ray imports) and
checkpoint as plain dicts alongside the ordered state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .schema import KEY, SEQ

_US = 1_000_000


class WindowAccumulator:
    """Tumbling event-time windows with watermark-gated emission."""

    def __init__(self, size_s: float, key: str = KEY, ts: str = "ts",
                 allowed_lateness_s: float = 0.0):
        self.size = int(size_s * _US)
        self.key = key
        self.ts = ts
        self.lateness = int(allowed_lateness_s * _US)
        self.watermark: int | None = None
        # (key, window_start) -> [turn_count, n_user, n_assistant]
        self.acc: dict[tuple[str, int], list[int]] = {}

    def update(self, emitted: pa.Table) -> None:
        if emitted.num_rows == 0 or self.ts not in emitted.column_names:
            return
        tsi = emitted[self.ts].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ws = (tsi // self.size) * self.size
        keys = emitted[self.key].to_numpy(zero_copy_only=False)
        roles = (
            emitted["role"].to_numpy(zero_copy_only=False)
            if "role" in emitted.column_names
            else np.full(len(keys), "", dtype=object)
        )
        for k, w, r in zip(keys, ws, roles):
            slot = self.acc.setdefault((k, int(w)), [0, 0, 0])
            slot[0] += 1
            if r == "user":
                slot[1] += 1
            elif r == "assistant":
                slot[2] += 1
        mx = int(tsi.max())
        self.watermark = mx if self.watermark is None else max(self.watermark, mx)

    def take_closed(self, final: bool = False) -> pa.Table:
        """Release windows whose end precedes the watermark (or everything on
        final flush)."""
        if self.watermark is None:
            return self._empty()
        horizon = self.watermark - self.lateness
        out_keys, out_ws, rows = [], [], []
        for (k, w) in sorted(self.acc):
            if final or w + self.size <= horizon:
                out_keys.append(k)
                out_ws.append(w)
                rows.append(self.acc.pop((k, w)))
        if not rows:
            return self._empty()
        arr = np.asarray(rows, dtype=np.int64)
        ws_arr = np.asarray(out_ws, dtype=np.int64)
        return pa.table(
            {
                self.key: pa.array(out_keys, pa.string()),
                "window_start": pa.array(ws_arr, pa.int64()).cast(pa.timestamp("us")),
                "window_end": pa.array(ws_arr + self.size, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "turn_count": pa.array(arr[:, 0], pa.int64()),
                "n_user": pa.array(arr[:, 1], pa.int64()),
                "n_assistant": pa.array(arr[:, 2], pa.int64()),
            }
        )

    def _empty(self) -> pa.Table:
        return pa.table(
            {
                self.key: pa.array([], pa.string()),
                "window_start": pa.array([], pa.timestamp("us")),
                "window_end": pa.array([], pa.timestamp("us")),
                "turn_count": pa.array([], pa.int64()),
                "n_user": pa.array([], pa.int64()),
                "n_assistant": pa.array([], pa.int64()),
            }
        )

    def snapshot(self) -> dict:
        return {"watermark": self.watermark, "acc": dict(self.acc)}

    def restore(self, snap: dict) -> None:
        self.watermark = snap["watermark"]
        self.acc = dict(snap["acc"])


class StreamJoiner:
    """Sequence-driven forward as-of join of role streams on the ordered
    emission (left=user waits for the next right=assistant turn per key)."""

    def __init__(self, key: str = KEY, seq: str = SEQ,
                 left_role: str = "user", right_role: str = "assistant"):
        self.key = key
        self.seq = seq
        self.left_role = left_role
        self.right_role = right_role
        # key -> list of (turn_idx, text, ts_us) pending left turns
        self.pending: dict[str, list[tuple[int, str, int]]] = {}

    def update(self, emitted: pa.Table) -> pa.Table:
        """Feed in-sequence emitted rows; returns newly-joined pairs."""
        cols = emitted.column_names
        if emitted.num_rows == 0 or "role" not in cols:
            return self._empty()
        keys = emitted[self.key].to_numpy(zero_copy_only=False)
        seqs = emitted[self.seq].to_numpy(zero_copy_only=False)
        roles = emitted["role"].to_numpy(zero_copy_only=False)
        texts = (
            emitted["text"].to_numpy(zero_copy_only=False)
            if "text" in cols
            else np.full(len(keys), "", dtype=object)
        )
        tsi = (
            emitted["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            if "ts" in cols
            else np.zeros(len(keys), dtype=np.int64)
        )
        out = {c: [] for c in (
            self.key, "user_turn_idx", "assistant_turn_idx",
            "user_text", "assistant_text", "lag_us",
        )}
        # rows arrive in per-key sequence order (guaranteed upstream)
        for k, s, r, txt, t in zip(keys, seqs, roles, texts, tsi):
            if r == self.left_role:
                self.pending.setdefault(k, []).append((int(s), txt, int(t)))
            elif r == self.right_role and self.pending.get(k):
                matched = [p for p in self.pending[k] if p[0] < s]
                if matched:
                    self.pending[k] = [p for p in self.pending[k] if p[0] >= s]
                    for us, utxt, uts in matched:
                        out[self.key].append(k)
                        out["user_turn_idx"].append(us)
                        out["assistant_turn_idx"].append(int(s))
                        out["user_text"].append(utxt)
                        out["assistant_text"].append(txt)
                        out["lag_us"].append(int(t) - uts)
        if not out[self.key]:
            return self._empty()
        return pa.table(
            {
                self.key: pa.array(out[self.key], pa.string()),
                "user_turn_idx": pa.array(out["user_turn_idx"], pa.int32()),
                "assistant_turn_idx": pa.array(out["assistant_turn_idx"], pa.int32()),
                "user_text": pa.array(out["user_text"], pa.string()),
                "assistant_text": pa.array(out["assistant_text"], pa.string()),
                "lag_us": pa.array(out["lag_us"], pa.int64()),
            }
        )

    def _empty(self) -> pa.Table:
        return pa.table(
            {
                self.key: pa.array([], pa.string()),
                "user_turn_idx": pa.array([], pa.int32()),
                "assistant_turn_idx": pa.array([], pa.int32()),
                "user_text": pa.array([], pa.string()),
                "assistant_text": pa.array([], pa.string()),
                "lag_us": pa.array([], pa.int64()),
            }
        )

    def snapshot(self) -> dict:
        return {"pending": {k: list(v) for k, v in self.pending.items()}}

    def restore(self, snap: dict) -> None:
        self.pending = {k: list(v) for k, v in snap["pending"].items()}
