"""Property-based tests (hypothesis): for ANY arrival permutation with any
duplication pattern, the engine's output equals the serial oracle and the
status accounting is exact. Stronger than the reference's fixed-case tests
(SURVEY.md §5) — same invariants, randomized inputs."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from ray_ordered_stream.fixtures import gen_transcripts, oracle_ordered
from ray_ordered_stream.schema import ARRIVAL, KEY, SEQ
from ray_ordered_stream.state import OrderedConfig, OrderedPartitionState

TS = pd.Timestamp("2025-01-01")


def _permuted(n_convs, turns, perm_seed, dup_idx):
    t = gen_transcripts(n_convs=n_convs, min_turns=turns, max_turns=turns,
                        end_sentinel=False)
    t = t.drop_columns([ARRIVAL])
    rng = np.random.default_rng(perm_seed)
    if dup_idx:
        extra = t.take([i % t.num_rows for i in dup_idx])
        t = pa.concat_tables([t, extra])
    order = rng.permutation(t.num_rows)
    t = t.take(order)
    return t.append_column(ARRIVAL, pa.array(np.arange(t.num_rows), pa.int64()))


@settings(max_examples=25, deadline=None)
@given(
    n_convs=st.integers(1, 5),
    turns=st.integers(1, 12),
    perm_seed=st.integers(0, 10_000),
    dup_idx=st.lists(st.integers(0, 100), max_size=6),
    chunk=st.integers(1, 17),
)
def test_any_permutation_matches_oracle(n_convs, turns, perm_seed, dup_idx, chunk):
    t = _permuted(n_convs, turns, perm_seed, dup_idx)
    stt = OrderedPartitionState(OrderedConfig())
    emitted = []
    for lo in range(0, t.num_rows, chunk):
        e, _ = stt.process(t.slice(lo, min(chunk, t.num_rows - lo)), TS)
        emitted.append(e)
    got = (
        pa.concat_tables(emitted)
        .to_pandas()
        .sort_values([KEY, SEQ], kind="stable")
        .reset_index(drop=True)
    )
    exp = oracle_ordered(t)
    assert list(got["text"]) == list(exp["text"])
    assert list(got[SEQ]) == list(exp[SEQ])
    assert list(got["emit_seq"]) == list(exp["emit_seq"])
    # buffers fully drained; accounting exact
    assert stt.buffer is None or stt.buffer.num_rows == 0
    total = sum(c.results for c in stt.counters.values())
    dups = sum(c.duplicates for c in stt.counters.values())
    recv = sum(c.received for c in stt.counters.values())
    assert total == len(exp)
    assert recv == t.num_rows
    assert dups == t.num_rows - len(exp)


@settings(max_examples=10, deadline=None)
@given(
    perm_seed=st.integers(0, 10_000),
    cap=st.integers(1, 7),
)
def test_emit_cap_never_breaks_contiguity(perm_seed, cap):
    t = _permuted(3, 8, perm_seed, [])
    stt = OrderedPartitionState(OrderedConfig(max_emit_per_round=cap))
    emitted = []
    e, _ = stt.process(t, TS)
    emitted.append(e)
    for _ in range(200):
        e, _ = stt.process(t.slice(0, 0), TS)
        if e.num_rows == 0:
            break
        emitted.append(e)
    assert all(e.num_rows <= cap for e in emitted)
    got = (
        pa.concat_tables(emitted)
        .to_pandas()
        .sort_values([KEY, SEQ], kind="stable")
        .reset_index(drop=True)
    )
    exp = oracle_ordered(t)
    assert list(got["emit_seq"]) == list(exp["emit_seq"])
    assert list(got["text"]) == list(exp["text"])
