"""In-actor streaming operators fed by the ordered emission stream.

These are the streaming counterparts of windows.py / join.py, co-located
with the ordered state in the same partition actor (same key => no extra
shuffle, SURVEY.md §7.3):

- ``WindowAccumulator``: per (key, window) tumbling OR sliding counts
  (``step_s`` < ``size_s`` gives overlapping hops; each row explodes into its
  covering windows, vectorized); window rows are released when the
  event-time watermark (max ts seen - allowed lateness) passes window_end —
  the role Beam's watermark machinery plays in the reference's tests
  (OrderBookProcessingPipelineTest.java:204-217).
- ``SessionAccumulator``: per-key gap-merged sessions (the streaming
  counterpart of windows.session_windows); open sessions are columnar
  intervals merged per batch with a vectorized chain-merge, and a session
  closes once the watermark passes ``session_end + gap`` (no in-flight event
  can extend it).
- ``StreamJoiner``: forward as-of join of two role streams. Because the
  ordered processor emits strictly in sequence per key, the join is
  sequence-driven and needs no watermark: a left (user) turn pairs with the
  key's next right (assistant) turn.

Both sit in the state actor's hot path, so ``update`` is vectorized like the
ordered drain (group-boundary detection over lexsorted key codes + reduceat
/ searchsorted); per-row Python touches only the small carry-over sets
(pending lefts, per-group dict slots). No Ray imports; checkpoint as plain
dicts alongside the ordered state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .schema import KEY, SEQ

_US = 1_000_000


def _late_table(emitted: pa.Table, key: str, ts: str, operator: str,
                rows_idx: np.ndarray, dropped: np.ndarray) -> pa.Table:
    """Side-output rows for late data: the offending input rows with which
    operator dropped them and how many window assignments expired."""
    key_col = emitted[key]
    if isinstance(key_col, pa.ChunkedArray):
        key_col = key_col.combine_chunks()
    ts_col = emitted[ts].cast(pa.timestamp("us"))
    if isinstance(ts_col, pa.ChunkedArray):
        ts_col = ts_col.combine_chunks()
    idx = pa.array(rows_idx)
    return pa.table(
        {
            key: key_col.take(idx),
            "ts": ts_col.take(idx),
            "operator": pa.array([operator] * len(rows_idx), pa.string()),
            "dropped_windows": pa.array(dropped, pa.int64()),
        }
    )


def _dict_codes(col) -> tuple[np.ndarray, list]:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    enc = pc.dictionary_encode(col)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    return (
        np.asarray(enc.indices).astype(np.int64),
        enc.dictionary.to_pylist(),
    )


class WindowAccumulator:
    """Tumbling/sliding event-time windows with watermark-gated emission.

    ``step_s`` defaults to the window size (tumbling); a smaller step gives
    sliding windows: each row is exploded (vectorized) into the
    ceil(size/step) hops containing it, after which the state machinery is
    identical.

    Open-window state is COLUMNAR: parallel numpy arrays sorted by
    (key_code, window_start), merged with each batch's per-group partial
    aggregates by one lexsort + reduceat. Per-row / per-group Python is
    avoided entirely (worst case — every turn its own window — degenerates
    to a vectorized array merge, not a million dict operations); Python
    touches only newly-seen KEYS (string interning)."""

    def __init__(self, size_s: float, key: str = KEY, ts: str = "ts",
                 allowed_lateness_s: float = 0.0, step_s: float | None = None,
                 late_data: str = "merge"):
        self.size = int(size_s * _US)
        self.step = int(step_s * _US) if step_s else self.size
        if not (0 < self.step <= self.size):
            raise ValueError("window step must be in (0, size]")
        if late_data not in ("merge", "drop"):
            raise ValueError("late_data must be 'merge' or 'drop'")
        self.key = key
        self.ts = ts
        self.lateness = int(allowed_lateness_s * _US)
        # "merge": a contribution to an already-released window re-opens it
        #   and re-fires a partial row (downstream must aggregate; today's
        #   default). "drop": expired (row, window) contributions are routed
        #   to a late side output instead — Flink's allowedLateness +
        #   sideOutputLateData semantics; each (key, window) fires at most
        #   once.
        self.late_data = late_data
        self.watermark: int | None = None
        self._intern: dict[str, int] = {}   # key -> global code
        self._names: list[str] = []         # global code -> key
        z = np.zeros(0, dtype=np.int64)
        # sorted by (kc, ws)
        self._kc, self._ws = z, z.copy()
        self._cnt, self._nu, self._na = z.copy(), z.copy(), z.copy()
        self._key_last = z.copy()           # per code: last activity (event time)

    def update(self, emitted: pa.Table, codes_kv=None) -> pa.Table | None:
        """Merge a batch of in-sequence emitted rows; with
        ``late_data="drop"`` returns the late side-output rows (or None)."""
        if emitted.num_rows == 0 or self.ts not in emitted.column_names:
            return None
        tsi = emitted[self.ts].cast(pa.int64()).to_numpy(zero_copy_only=False)
        # callers co-located with the drain can pass the key encode through
        codes, key_values = codes_kv or _dict_codes(emitted[self.key])
        if "role" in emitted.column_names:
            is_user = np.asarray(pc.equal(emitted["role"], "user"))
            is_asst = np.asarray(pc.equal(emitted["role"], "assistant"))
        else:
            is_user = is_asst = np.zeros(len(codes), dtype=bool)

        # local dictionary codes -> stable global codes (intern new keys)
        intern, names = self._intern, self._names
        glob = np.empty(len(key_values), dtype=np.int64)
        for i, kv in enumerate(key_values):
            g = intern.get(kv)
            if g is None:
                g = len(names)
                intern[kv] = g
                names.append(kv)
            glob[i] = g
        if len(names) > len(self._key_last):
            grown = np.zeros(len(names), dtype=np.int64)
            grown[: len(self._key_last)] = self._key_last
            self._key_last = grown
        gc = glob[codes]
        np.maximum.at(self._key_last, gc, tsi)

        if self.step == self.size:  # tumbling: one window per row
            ws = (tsi // self.size) * self.size
            rep = None  # (row, window) pairs are exactly the rows
        else:
            # sliding: explode each row into its covering hops (same
            # construction as windows.sliding_counts, kept vectorized)
            n_w = -(-self.size // self.step)
            last_ws = (tsi // self.step) * self.step
            offs = (np.arange(n_w, dtype=np.int64) * self.step)[None, :]
            wm = last_ws[:, None] - offs                  # (rows, n_w)
            valid = ((wm + self.size) > tsi[:, None]) & (wm >= 0)
            flat = valid.ravel()
            ws = wm.ravel()[flat]
            rep = np.repeat(np.arange(len(gc)), n_w)[flat]
            gc, is_user, is_asst = gc[rep], is_user[rep], is_asst[rep]

        # late-data drop: a (row, window) contribution whose window already
        # released (take_closed's criterion, against the watermark BEFORE
        # this batch) is diverted to the side output instead of re-opening
        # the window (≙ Flink allowedLateness + sideOutputLateData)
        late = None
        if self.late_data == "drop" and self.watermark is not None:
            lp = ws + self.size <= self.watermark - self.lateness
            if lp.any():
                dropped = (
                    lp.astype(np.int64)
                    if rep is None
                    else np.bincount(rep[lp], minlength=len(tsi))
                )
                rl = np.flatnonzero(dropped)
                late = _late_table(
                    emitted, self.key, self.ts, "windows", rl, dropped[rl]
                )
                keep = ~lp
                ws, gc = ws[keep], gc[keep]
                is_user, is_asst = is_user[keep], is_asst[keep]
                if not len(ws):
                    self.watermark = max(self.watermark, int(tsi.max()))
                    return late

        # per-(key, window) partial aggregates: lexsort + boundary + reduceat
        order = np.lexsort((ws, gc))
        c_s, w_s = gc[order], ws[order]
        boundary = np.empty(len(c_s), dtype=bool)
        boundary[0] = True
        boundary[1:] = (c_s[1:] != c_s[:-1]) | (w_s[1:] != w_s[:-1])
        starts = np.flatnonzero(boundary)
        counts = np.diff(np.append(starts, len(c_s)))
        nu = np.add.reduceat(is_user[order], starts)
        na = np.add.reduceat(is_asst[order], starts)

        # merge into the open-window arrays (both sides sorted): concat,
        # lexsort, collapse duplicate (kc, ws) pairs by reduceat
        kc = np.concatenate([self._kc, c_s[starts]])
        wv = np.concatenate([self._ws, w_s[starts]])
        cnt = np.concatenate([self._cnt, counts])
        nuv = np.concatenate([self._nu, nu])
        nav = np.concatenate([self._na, na])
        m = np.lexsort((wv, kc))
        kc, wv, cnt, nuv, nav = kc[m], wv[m], cnt[m], nuv[m], nav[m]
        if len(kc):
            b2 = np.empty(len(kc), dtype=bool)
            b2[0] = True
            b2[1:] = (kc[1:] != kc[:-1]) | (wv[1:] != wv[:-1])
            s2 = np.flatnonzero(b2)
            self._kc, self._ws = kc[s2], wv[s2]
            self._cnt = np.add.reduceat(cnt, s2)
            self._nu = np.add.reduceat(nuv, s2)
            self._na = np.add.reduceat(nav, s2)
        mx = int(tsi.max())
        self.watermark = mx if self.watermark is None else max(self.watermark, mx)
        return late

    def take_closed(self, final: bool = False) -> pa.Table:
        """Release windows whose end precedes the watermark (or everything on
        final flush)."""
        if self.watermark is None or not len(self._kc):
            return self._empty()
        horizon = self.watermark - self.lateness
        closed = (
            np.ones(len(self._kc), dtype=bool)
            if final
            else self._ws + self.size <= horizon
        )
        if not closed.any():
            return self._empty()
        keep = ~closed
        kc, ws_arr = self._kc[closed], self._ws[closed]
        out = pa.table(
            {
                self.key: pc.take(
                    pa.array(self._names, pa.string()), pa.array(kc)
                ),
                "window_start": pa.array(ws_arr, pa.int64()).cast(pa.timestamp("us")),
                "window_end": pa.array(ws_arr + self.size, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "turn_count": pa.array(self._cnt[closed], pa.int64()),
                "n_user": pa.array(self._nu[closed], pa.int64()),
                "n_assistant": pa.array(self._na[closed], pa.int64()),
            }
        )
        self._kc, self._ws = self._kc[keep], self._ws[keep]
        self._cnt, self._nu, self._na = (
            self._cnt[keep], self._nu[keep], self._na[keep],
        )
        return out

    def gc(self, ttl_us: int) -> int:
        """Evict keys idle past the event-time TTL and with no open window
        (≙ Beam/Flink keyed-state GC on window expiry — without it the
        intern table grows with every key ever seen on an unbounded
        keyspace). Codes compact monotonically, so the open-window arrays
        stay sorted. Deterministic given (state, watermark): called at
        epoch boundaries before the checkpoint, a crash-resume replays the
        same evictions. Returns the number of evicted keys."""
        if self.watermark is None or not len(self._names):
            return 0
        horizon = self.watermark - ttl_us
        keep_mask = self._key_last >= horizon
        keep_mask[self._kc] = True  # open windows pin their key
        if keep_mask.all():
            return 0
        new_codes = np.cumsum(keep_mask) - 1
        keep_idx = np.flatnonzero(keep_mask)
        self._names = [self._names[i] for i in keep_idx]
        self._intern = {k: i for i, k in enumerate(self._names)}
        self._key_last = self._key_last[keep_idx]
        self._kc = new_codes[self._kc]
        return int(len(keep_mask) - len(keep_idx))

    def state_size(self) -> dict:
        return {"keys": len(self._names), "open": int(len(self._kc))}

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

    # dict view (checkpoint format + tests): (key, ws) -> [cnt, nu, na]
    @property
    def acc(self) -> dict[tuple[str, int], list[int]]:
        return {
            (self._names[k], int(w)): [int(c), int(u), int(a)]
            for k, w, c, u, a in zip(
                self._kc, self._ws, self._cnt, self._nu, self._na
            )
        }

    def snapshot(self) -> dict:
        # the FULL intern table rides along: emission order in take_closed
        # follows key codes, so codes must survive resume even for keys
        # whose windows all closed before the checkpoint — else a re-run
        # epoch's part file is not byte-identical to the committed one
        return {"watermark": self.watermark, "acc": self.acc,
                "names": list(self._names),
                "last": [int(x) for x in self._key_last]}

    def restore(self, snap: dict) -> None:
        self.watermark = snap["watermark"]
        items = list(snap["acc"].items())
        self._intern, self._names = {}, []
        for k in snap.get("names", ()):  # authoritative code assignment
            self._intern[k] = len(self._names)
            self._names.append(k)
        kcs = []
        for (k, _w), _v in items:
            g = self._intern.get(k)
            if g is None:
                # legacy snapshot without names: intern in iteration order
                # (= original first-seen order)
                g = len(self._names)
                self._intern[k] = g
                self._names.append(k)
            kcs.append(g)
        kc = np.asarray(kcs, dtype=np.int64)
        wv = np.asarray([w for (_k, w), _v in items], dtype=np.int64)
        vals = np.asarray([v for _kw, v in items], dtype=np.int64).reshape(-1, 3)
        m = np.lexsort((wv, kc))
        self._kc, self._ws = kc[m], wv[m]
        self._cnt, self._nu, self._na = vals[m, 0], vals[m, 1], vals[m, 2]
        last = snap.get("last")
        self._key_last = (
            np.asarray(last, dtype=np.int64)
            if last is not None and len(last) == len(self._names)
            else np.zeros(len(self._names), dtype=np.int64)
        )


class SessionAccumulator:
    """Streaming session windows: per-key gap merge with watermark-gated
    release (the in-actor counterpart of ``windows.session_windows``).

    Open sessions are COLUMNAR intervals — parallel arrays sorted by
    (key_code, session_start) — merged with each batch's per-key
    mini-sessions by a vectorized chain-merge (lexsort + boundary flags +
    reduceat; containment chains converge in a couple of passes). A session
    is released once ``watermark - lateness > session_end + gap``: no event
    still in flight (within the lateness bound) can extend it. Per-key
    ``session_id`` assignment matches the batch operator (index in
    session_start order), valid because sessions of a key close in start
    order. Caveat (standard streaming-session semantics): an event later
    than the allowed lateness opens a NEW session even if its ts precedes an
    already-released one, so its session_id reflects release order, not
    global start order — size ``allowed_lateness_s`` to the source's real
    disorder when batch/stream equality matters."""

    def __init__(self, gap_s: float, key: str = KEY, ts: str = "ts",
                 allowed_lateness_s: float = 0.0, late_data: str = "merge"):
        self.gap = int(gap_s * _US)
        self.key = key
        self.ts = ts
        self.lateness = int(allowed_lateness_s * _US)
        if late_data not in ("merge", "drop"):
            raise ValueError("late_data must be 'merge' or 'drop'")
        # "drop": an event whose singleton session [ts, ts] would already be
        # releasable (ts + gap behind the watermark horizon) goes to the
        # late side output instead of opening a new out-of-order session —
        # Flink's session-window lateness rule (the element's initial
        # window is late => drop), which also removes the session_id
        # release-order caveat below for late events.
        self.late_data = late_data
        self.watermark: int | None = None
        self._intern: dict[str, int] = {}
        self._names: list[str] = []
        z = np.zeros(0, dtype=np.int64)
        # open sessions, sorted by (kc, start)
        self._kc, self._start, self._end = z, z.copy(), z.copy()
        self._cnt, self._nu, self._na = z.copy(), z.copy(), z.copy()
        self._next_sid = z.copy()   # per key code: next session_id to emit
        self._key_last = z.copy()   # per code: last activity (event time)

    def update(self, emitted: pa.Table, codes_kv=None) -> pa.Table | None:
        """Merge a batch of in-sequence emitted rows; with
        ``late_data="drop"`` returns the late side-output rows (or None)."""
        if emitted.num_rows == 0 or self.ts not in emitted.column_names:
            return None
        tsi = emitted[self.ts].cast(pa.int64()).to_numpy(zero_copy_only=False)
        codes, key_values = codes_kv or _dict_codes(emitted[self.key])
        if "role" in emitted.column_names:
            is_user = np.asarray(pc.equal(emitted["role"], "user"))
            is_asst = np.asarray(pc.equal(emitted["role"], "assistant"))
        else:
            is_user = is_asst = np.zeros(len(codes), dtype=bool)

        intern, names = self._intern, self._names
        glob = np.empty(len(key_values), dtype=np.int64)
        for i, kv in enumerate(key_values):
            g = intern.get(kv)
            if g is None:
                g = len(names)
                intern[kv] = g
                names.append(kv)
            glob[i] = g
        if len(names) > len(self._next_sid):
            grown = np.zeros(len(names), dtype=np.int64)
            grown[: len(self._next_sid)] = self._next_sid
            self._next_sid = grown
        if len(names) > len(self._key_last):
            grown = np.zeros(len(names), dtype=np.int64)
            grown[: len(self._key_last)] = self._key_last
            self._key_last = grown
        gc = glob[codes]
        np.maximum.at(self._key_last, gc, tsi)

        # late-data drop (Flink session-lateness rule): assign the event its
        # singleton window [ts, ts+gap); if it MERGES with a still-open
        # session of its key the merged window is live and the event is
        # kept; only an event whose merged window is still the releasable
        # singleton (take_closed's criterion against the watermark BEFORE
        # this batch) is diverted to the side output. Candidates are checked
        # against PRE-batch open sessions (deterministic batch semantics:
        # a late event cannot bridge through other rows of the same batch).
        late = None
        if self.late_data == "drop" and self.watermark is not None:
            lp = tsi + self.gap < self.watermark - self.lateness
            if lp.any() and len(self._kc):
                # a candidate merges iff an open session of its key overlaps
                # [ts-gap, ts+gap]; open sessions are gap-separated within a
                # key, so only the last session with start <= ts+gap can
                # (per-unique-key loop: late keys are the exceptional few)
                cand = np.flatnonzero(lp)
                cg, ct = gc[cand], tsi[cand]
                merge_ok = np.zeros(len(cand), dtype=bool)
                for g in np.unique(cg):
                    lo = np.searchsorted(self._kc, g, side="left")
                    hi = np.searchsorted(self._kc, g, side="right")
                    if lo == hi:
                        continue
                    m = cg == g
                    t = ct[m]
                    j = lo + np.searchsorted(
                        self._start[lo:hi], t + self.gap, side="right"
                    ) - 1
                    ok = j >= lo
                    jj = np.where(ok, j, lo)
                    ok &= self._end[jj] + self.gap >= t
                    merge_ok[m] = ok
                lp[cand[merge_ok]] = False
            if lp.any():
                rl = np.flatnonzero(lp)
                late = _late_table(
                    emitted, self.key, self.ts, "sessions", rl,
                    np.ones(len(rl), dtype=np.int64),
                )
                keep = ~lp
                tsi, gc = tsi[keep], gc[keep]
                is_user, is_asst = is_user[keep], is_asst[keep]
                if not len(tsi):
                    return late

        # batch mini-sessions: lexsort by (ts within key) + gap boundaries
        order = np.lexsort((tsi, gc))
        c_s, t_s = gc[order], tsi[order]
        new_sess = np.empty(len(c_s), dtype=bool)
        new_sess[0] = True
        new_sess[1:] = (c_s[1:] != c_s[:-1]) | ((t_s[1:] - t_s[:-1]) > self.gap)
        starts = np.flatnonzero(new_sess)
        ends_idx = np.append(starts[1:], len(c_s)) - 1
        kc = np.concatenate([self._kc, c_s[starts]])
        sv = np.concatenate([self._start, t_s[starts]])
        ev = np.concatenate([self._end, t_s[ends_idx]])
        cnt = np.concatenate([self._cnt, np.diff(np.append(starts, len(c_s)))])
        nu = np.concatenate([self._nu, np.add.reduceat(is_user[order], starts)])
        na = np.concatenate([self._na, np.add.reduceat(is_asst[order], starts)])

        # merge open + batch sessions per key: textbook single-pass interval
        # merge — sorted by (key, start), a session chains onto the group iff
        # its start is within gap of the RUNNING max end of the group so far
        # (per-key cummax via pandas' cython grouped cummax; comparing only
        # against the previous element's end would need one pass per nested
        # session and silently mis-merge under a pass cap)
        import pandas as pd

        m = np.lexsort((sv, kc))
        kc, sv, ev = kc[m], sv[m], ev[m]
        cnt, nu, na = cnt[m], nu[m], na[m]
        cmax = pd.Series(ev).groupby(pd.Series(kc)).cummax().to_numpy()
        b = np.empty(len(kc), dtype=bool)
        b[0] = True
        b[1:] = (kc[1:] != kc[:-1]) | ((sv[1:] - cmax[:-1]) > self.gap)
        if not b.all():
            s2 = np.flatnonzero(b)
            kc, sv = kc[s2], sv[s2]
            ev = np.maximum.reduceat(ev, s2)
            cnt = np.add.reduceat(cnt, s2)
            nu = np.add.reduceat(nu, s2)
            na = np.add.reduceat(na, s2)
        self._kc, self._start, self._end = kc, sv, ev
        self._cnt, self._nu, self._na = cnt, nu, na
        mx = int(tsi.max())
        self.watermark = mx if self.watermark is None else max(self.watermark, mx)
        return late

    def take_closed(self, final: bool = False) -> pa.Table:
        if self.watermark is None or not len(self._kc):
            return self._empty()
        horizon = self.watermark - self.lateness
        closed = (
            np.ones(len(self._kc), dtype=bool)
            if final
            else self._end + self.gap < horizon
        )
        if not closed.any():
            return self._empty()
        keep = ~closed
        kc, sv, ev = self._kc[closed], self._start[closed], self._end[closed]
        cnt, nu, na = self._cnt[closed], self._nu[closed], self._na[closed]
        # per-key session ids continue from the last released session; the
        # closed subset is (kc, start)-sorted, so rank-within-key + offset
        b = np.empty(len(kc), dtype=bool)
        b[0] = True
        b[1:] = kc[1:] != kc[:-1]
        firsts = np.flatnonzero(b)
        key_first = np.repeat(firsts, np.diff(np.append(firsts, len(kc))))
        rank = np.arange(len(kc)) - key_first
        sid = self._next_sid[kc] + rank
        self._next_sid[kc[firsts]] += np.diff(np.append(firsts, len(kc)))
        out = pa.table(
            {
                self.key: pc.take(pa.array(self._names, pa.string()), pa.array(kc)),
                "session_id": pa.array(sid, pa.int64()),
                "session_start": pa.array(sv, pa.int64()).cast(pa.timestamp("us")),
                "session_end": pa.array(ev, pa.int64()).cast(pa.timestamp("us")),
                "turn_count": pa.array(cnt, pa.int64()),
                "n_user": pa.array(nu, pa.int64()),
                "n_assistant": pa.array(na, pa.int64()),
            }
        )
        self._kc, self._start, self._end = self._kc[keep], self._start[keep], self._end[keep]
        self._cnt, self._nu, self._na = self._cnt[keep], self._nu[keep], self._na[keep]
        return out

    def gc(self, ttl_us: int) -> int:
        """Evict keys idle past the event-time TTL and with no open
        session. An evicted key's ``next_sid`` is dropped with it — if the
        key returns after the TTL its session_id restarts at 0 (the
        standard keyed-state-TTL trade-off; Flink state TTL behaves the
        same). Deterministic given (state, watermark) — see
        WindowAccumulator.gc. Returns the number of evicted keys."""
        if self.watermark is None or not len(self._names):
            return 0
        horizon = self.watermark - ttl_us
        keep_mask = self._key_last >= horizon
        keep_mask[self._kc] = True  # open sessions pin their key
        if keep_mask.all():
            return 0
        new_codes = np.cumsum(keep_mask) - 1
        keep_idx = np.flatnonzero(keep_mask)
        self._names = [self._names[i] for i in keep_idx]
        self._intern = {k: i for i, k in enumerate(self._names)}
        self._key_last = self._key_last[keep_idx]
        self._next_sid = self._next_sid[keep_idx]
        self._kc = new_codes[self._kc]
        return int(len(keep_mask) - len(keep_idx))

    def state_size(self) -> dict:
        return {"keys": len(self._names), "open": int(len(self._kc))}

    def _empty(self) -> pa.Table:
        return pa.table(
            {
                self.key: pa.array([], pa.string()),
                "session_id": pa.array([], pa.int64()),
                "session_start": pa.array([], pa.timestamp("us")),
                "session_end": pa.array([], pa.timestamp("us")),
                "turn_count": pa.array([], pa.int64()),
                "n_user": pa.array([], pa.int64()),
                "n_assistant": pa.array([], pa.int64()),
            }
        )

    def snapshot(self) -> dict:
        return {
            "watermark": self.watermark,
            "names": list(self._names),
            "open": [
                [int(k), int(s), int(e), int(c), int(u), int(a)]
                for k, s, e, c, u, a in zip(
                    self._kc, self._start, self._end, self._cnt, self._nu, self._na
                )
            ],
            "next_sid": [int(x) for x in self._next_sid],
            "last": [int(x) for x in self._key_last],
        }

    def restore(self, snap: dict) -> None:
        self.watermark = snap["watermark"]
        self._intern, self._names = {}, []
        for k in snap["names"]:
            self._intern[k] = len(self._names)
            self._names.append(k)
        rows = np.asarray(snap["open"], dtype=np.int64).reshape(-1, 6)
        m = np.lexsort((rows[:, 1], rows[:, 0]))
        rows = rows[m]
        self._kc, self._start, self._end = rows[:, 0], rows[:, 1], rows[:, 2]
        self._cnt, self._nu, self._na = rows[:, 3], rows[:, 4], rows[:, 5]
        self._next_sid = np.asarray(snap["next_sid"], dtype=np.int64)
        last = snap.get("last")
        self._key_last = (
            np.asarray(last, dtype=np.int64)
            if last is not None and len(last) == len(self._names)
            else np.zeros(len(self._names), dtype=np.int64)
        )


class StreamJoiner:
    """Sequence-driven forward as-of join of role streams on the ordered
    emission (left=user pairs with the key's next right=assistant turn).

    The ordered processor guarantees per-key sequences are emitted strictly
    increasing ACROSS calls, so every pending left (carried between calls)
    precedes every sequence of the current batch for its key; within a batch
    a left's match is the first right-row after it in (key, seq) order."""

    def __init__(self, key: str = KEY, seq: str = SEQ,
                 left_role: str = "user", right_role: str = "assistant",
                 within_us: int | None = None):
        self.key = key
        self.seq = seq
        self.left_role = left_role
        self.right_role = right_role
        # event-time bound (parity with join_user_assistant's within_us):
        # a pair whose lag exceeds it is DROPPED, not kept pending — the
        # match is defined as the next right turn, bounded afterwards
        self.within_us = within_us
        # key -> list of (turn_idx, text, ts_us) pending left turns
        self.pending: dict[str, list[tuple[int, str, int]]] = {}
        self.watermark: int | None = None  # max event time seen (for gc)

    def update(self, emitted: pa.Table, codes_kv=None) -> pa.Table:
        """Feed in-sequence emitted rows; returns newly-joined pairs."""
        cols = emitted.column_names
        if emitted.num_rows == 0 or "role" not in cols:
            return self._empty()
        codes, key_values = codes_kv or _dict_codes(emitted[self.key])
        seqs = emitted[self.seq].to_numpy(zero_copy_only=False).astype(np.int64)
        has_text = "text" in cols
        has_ts = "ts" in cols
        tsi = (
            emitted["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            if has_ts
            else np.zeros(len(codes), dtype=np.int64)
        )
        if has_ts and len(tsi):
            mx = int(tsi.max())
            self.watermark = (
                mx if self.watermark is None else max(self.watermark, mx)
            )
        # emission is (key, seq)-grouped in epoch mode; re-sort defensively
        # (cheap integer lexsort) so group logic holds in every mode
        order = np.lexsort((seqs, codes))
        c = codes[order]
        s = seqs[order]
        isL = np.asarray(pc.equal(emitted["role"], self.left_role)).astype(bool)[order]
        isR = np.asarray(pc.equal(emitted["role"], self.right_role)).astype(bool)[order]

        ridx = np.flatnonzero(isR)
        lidx = np.flatnonzero(isL)
        # first right-row strictly after each left-row (positions are unique,
        # so searchsorted lands past the left itself); match only within key
        j = np.searchsorted(ridx, lidx)
        matched = np.zeros(len(lidx), dtype=bool)
        inb = j < len(ridx)
        matched[inb] = c[ridx[j[inb]]] == c[lidx[inb]]
        m_l = lidx[matched]
        m_r = ridx[j[matched]]

        o_l = order[m_l]
        o_r = order[m_r]
        key_col = (
            emitted[self.key].combine_chunks()
            if isinstance(emitted[self.key], pa.ChunkedArray)
            else emitted[self.key]
        )
        text_col = emitted["text"] if has_text else None
        parts = []
        if len(m_l):
            parts.append(
                pa.table(
                    {
                        self.key: key_col.take(pa.array(o_l)),
                        "user_turn_idx": pa.array(s[m_l], pa.int32()),
                        "assistant_turn_idx": pa.array(s[m_r], pa.int32()),
                        "user_text": text_col.take(pa.array(o_l))
                        if has_text
                        else pa.array([""] * len(m_l), pa.string()),
                        "assistant_text": text_col.take(pa.array(o_r))
                        if has_text
                        else pa.array([""] * len(m_l), pa.string()),
                        "lag_us": pa.array(tsi[o_r] - tsi[o_l], pa.int64()),
                    },
                    schema=self._schema(),
                )
            )

        # carried-over pending lefts: every one precedes this batch's
        # sequences, so each pairs with its key's FIRST right in the batch
        if self.pending and len(ridx):
            r_first_mask = np.empty(len(ridx), dtype=bool)
            r_first_mask[0] = True
            r_first_mask[1:] = c[ridx[1:]] != c[ridx[:-1]]
            first_r = ridx[r_first_mask]
            rows = {k: [] for k in (
                self.key, "user_turn_idx", "assistant_turn_idx",
                "user_text", "assistant_text", "lag_us",
            )}
            fr_orig = order[first_r]
            fr_text = (
                text_col.take(pa.array(fr_orig)).to_pylist() if has_text else None
            )
            for gi, rp in enumerate(first_r):
                kv = key_values[c[rp]]
                plist = self.pending.pop(kv, None)
                if not plist:
                    continue
                rseq = int(s[rp])
                rtxt = fr_text[gi] if fr_text is not None else ""
                rts = int(tsi[order[rp]])
                for us, utxt, uts in plist:
                    rows[self.key].append(kv)
                    rows["user_turn_idx"].append(us)
                    rows["assistant_turn_idx"].append(rseq)
                    rows["user_text"].append(utxt)
                    rows["assistant_text"].append(rtxt)
                    rows["lag_us"].append(rts - uts)
            if rows[self.key]:
                parts.append(pa.table(rows, schema=self._schema()))

        # unmatched lefts (no right after them in this batch) wait
        un = lidx[~matched]
        if len(un):
            o_un = order[un]
            un_text = (
                text_col.take(pa.array(o_un)).to_pylist()
                if has_text
                else [""] * len(un)
            )
            pend = self.pending
            for p, txt in zip(un, un_text):
                pend.setdefault(key_values[c[p]], []).append(
                    (int(s[p]), txt, int(tsi[order[p]]))
                )

        if not parts:
            return self._empty()
        out = pa.concat_tables(parts) if len(parts) > 1 else parts[0]
        if self.within_us is not None and out.num_rows:
            out = out.filter(pc.less_equal(out["lag_us"], self.within_us))
        return out

    def _schema(self) -> pa.Schema:
        return pa.schema(
            [
                (self.key, pa.string()),
                ("user_turn_idx", pa.int32()),
                ("assistant_turn_idx", pa.int32()),
                ("user_text", pa.string()),
                ("assistant_text", pa.string()),
                ("lag_us", pa.int64()),
            ]
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

    def gc(self, ttl_us: int) -> int:
        """Drop pending (unmatched) lefts older than the event-time TTL —
        they never join (the same outcome join_within_s would force once a
        right arrived). Keys left with no pending rows are removed
        entirely, so the dict is bounded by the TTL horizon's live
        keyspace. Returns the number of evicted pending rows."""
        if self.watermark is None or not self.pending:
            return 0
        horizon = self.watermark - ttl_us
        evicted = 0
        for k in list(self.pending):
            rows = self.pending[k]
            kept = [p for p in rows if p[2] >= horizon]
            evicted += len(rows) - len(kept)
            if kept:
                self.pending[k] = kept
            else:
                del self.pending[k]
        return evicted

    def state_size(self) -> dict:
        return {
            "keys": len(self.pending),
            "pending": sum(len(v) for v in self.pending.values()),
        }

    def snapshot(self) -> dict:
        return {"pending": {k: list(v) for k, v in self.pending.items()},
                "watermark": self.watermark}

    def restore(self, snap: dict) -> None:
        self.pending = {k: [tuple(p) for p in v] for k, v in snap["pending"].items()}
        self.watermark = snap.get("watermark")
