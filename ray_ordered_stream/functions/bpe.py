"""Distributed BPE tokenizer training + encoding.

The classic trick (Sennrich et al. 2016; GPT-2's trainer does the same)
makes BPE training tractable at corpus scale: merges depend only on the
WORD VOCABULARY with counts, not on the corpus — so the 100-TB text makes
exactly ONE pass (``textstats.vocab_counts``: per-batch token-count
partials, one vocabulary-sized exchange) and every merge round after that
runs over the vocabulary alone.

Scale design:
- The vocabulary is partitioned into Arrow blocks ONCE (flattened symbol
  representation: one row per symbol occurrence with its word id and word
  count — pure numpy views, no per-word Python after init) and parked in
  the object store; each merge round is plain tasks over those refs, the
  same ref-loop shape as ``similarity.train_centroids_distributed``.
- Per round, only per-block (left, right, count) PARTIALS move: a
  tree-reduce folds them and the driver sees the single winning pair.
  The vocabulary blocks themselves never cross the wire; the merge is
  applied in place by a second task wave that writes new refs.
- The merge application is vectorized: adjacent-pair matches are a mask
  over the flat symbol array, and overlapping matches (``aaa`` under an
  ``a+a`` merge) are resolved leftmost-first by run-parity — keep even
  offsets inside each run of consecutive matches — with no Python loop.

Ties break deterministically by (count DESC, left ASC, right ASC), so
training is reproducible across partitionings; conformance vs a serial
reference implementation is pinned in tests/test_bpe.py.

Complexity note: each merge round recounts pairs over the (shrinking)
vocabulary — O(n_merges x vocab symbols), 2 task waves per round. Right
for the hundreds-of-merges regime this engine targets (subword analyses,
domain tokenizers); a 32k-merge production tokenizer wants the classic
incremental-count trick (update only pairs adjacent to the merge,
Sennrich's learn_bpe) layered on the same partials, which this module
deliberately leaves out.

SQL oracle: the full merge sequence IS expressible — a DuckDB recursive
CTE replays the trainer level by level (each level re-segments the
vocabulary under that level's winner via a list_reduce lambda implementing
the same greedy-leftmost rule); see SQL_BPE_MERGES in pipelines/queries.py.
The serial-conformance property test in tests/test_bpe.py additionally
pins the trainer against a row-at-a-time reference implementation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _explode_symbols(words: list[str]):
    """(sym object array, word_of int64) — one row per character. ASCII
    fast path: join + frombuffer('S1') + vectorized U1 decode (no Python
    per character); non-ASCII falls back to the per-word loop (unicode
    chars are variable-width bytes, so the buffer trick misaligns)."""
    if not words:
        return np.array([], dtype=object), np.array([], dtype=np.int64)
    joined = "".join(words)
    if joined.isascii():
        lens = np.fromiter((len(w) for w in words), dtype=np.int64,
                           count=len(words))
        sym = (
            np.frombuffer(joined.encode(), dtype="S1")
            .astype("U1")
            .astype(object)
        )
        word_of = np.repeat(np.arange(len(words), dtype=np.int64), lens)
        return sym, word_of
    syms: list[str] = []
    word_of_l: list[int] = []
    for i, w in enumerate(words):
        cs = list(w)
        syms.extend(cs)
        word_of_l.extend([i] * len(cs))
    return np.asarray(syms, dtype=object), np.asarray(word_of_l, np.int64)


def _init_block(words: list[str], counts: np.ndarray) -> pa.Table:
    """Flatten a (word, count) slice into the per-symbol representation:
    one row per symbol with the word's index and count."""
    sym, wo = _explode_symbols(words)
    wt = counts[wo] if len(wo) else np.array([], dtype=np.int64)
    return pa.table(
        {
            "sym": pa.array(sym.tolist(), pa.string()),
            "word": pa.array(wo),
            "wt": pa.array(wt, pa.int64()),
        }
    )


def _pair_counts(t: pa.Table) -> pd.DataFrame:
    sym = t["sym"].to_numpy(zero_copy_only=False)
    word = t["word"].to_numpy(zero_copy_only=False)
    wt = t["wt"].to_numpy(zero_copy_only=False)
    if len(sym) < 2:
        return pd.DataFrame({"l": [], "r": [], "n": []})
    same = word[1:] == word[:-1]
    df = pd.DataFrame(
        {"l": sym[:-1][same], "r": sym[1:][same], "n": wt[:-1][same]}
    )
    return df.groupby(["l", "r"], sort=False, as_index=False)["n"].sum()


def _fold_top(parts: list[pd.DataFrame]) -> pd.DataFrame:
    real = [p for p in parts if len(p)]
    if not real:
        return pd.DataFrame({"l": [], "r": [], "n": []})
    df = pd.concat(real, ignore_index=True)
    return df.groupby(["l", "r"], sort=False, as_index=False)["n"].sum()


def _leftmost_matches(
    sym: np.ndarray, word: np.ndarray, left: str, right: str
) -> np.ndarray:
    """Boolean mask over positions i where (sym[i], sym[i+1]) == (left,
    right) in the same word, overlaps resolved leftmost-first (run
    parity). Returned mask has len(sym); mask[i] marks a merge STARTING
    at i."""
    n = len(sym)
    m = np.zeros(n, dtype=bool)
    if n < 2:
        return m
    cand = (sym[:-1] == left) & (sym[1:] == right) & (word[:-1] == word[1:])
    if not cand.any():
        return m
    if left != right:
        # matches can't overlap: (l,r) at i and i+1 needs sym[i+1]==r==l
        m[:-1] = cand
        return m
    # runs of consecutive candidate positions: keep even offsets in run
    idx = np.flatnonzero(cand)
    run_start = np.empty(len(idx), dtype=bool)
    run_start[0] = True
    run_start[1:] = idx[1:] != idx[:-1] + 1
    run_id = np.cumsum(run_start) - 1
    first = idx[run_start][run_id]
    keep = ((idx - first) % 2) == 0
    m[idx[keep]] = True
    return m


def _apply_merge(t: pa.Table, left: str, right: str) -> pa.Table:
    sym = t["sym"].to_numpy(zero_copy_only=False).astype(object)
    word = t["word"].to_numpy(zero_copy_only=False)
    wt = t["wt"].to_numpy(zero_copy_only=False)
    m = _leftmost_matches(sym, word, left, right)
    if not m.any():
        return t
    starts = np.flatnonzero(m)
    sym = sym.copy()
    sym[starts] = left + right
    drop = np.zeros(len(sym), dtype=bool)
    drop[starts + 1] = True
    keep = ~drop
    return pa.table(
        {
            "sym": pa.array(sym[keep].tolist(), pa.string()),
            "word": pa.array(word[keep], pa.int64()),
            "wt": pa.array(wt[keep], pa.int64()),
        }
    )


def train_bpe(
    ds,
    n_merges: int = 32,
    text_col: str = "text",
    min_pair_count: int = 2,
    num_blocks: int | None = None,
    fanin: int = 8,
) -> pa.Table:
    """Learn ``n_merges`` BPE merges from a documents Dataset. Returns an
    Arrow table (rank, left, right, count) in merge order. Stops early
    when the best remaining pair's count drops below ``min_pair_count``.
    """
    import ray

    from .textstats import vocab_counts

    vocab = vocab_counts(ds.select_columns([text_col]))
    vrefs = list(vocab.to_arrow_refs())

    @ray.remote
    def init(*tbls: pa.Table) -> pa.Table:
        real = [t for t in tbls if t.num_rows]
        if not real:
            return _init_block([], np.array([], dtype=np.int64))
        t = (
            pa.concat_tables(real, promote_options="none")
            if len(real) > 1
            else real[0]
        )
        return _init_block(
            t["token"].to_pylist(),
            t["n"].to_numpy(zero_copy_only=False).astype(np.int64),
        )

    cpus = max(2, int(ray.cluster_resources().get("CPU", 4)))
    B = num_blocks or min(max(1, len(vrefs)), 2 * cpus)
    groups = [
        list(g)
        for g in np.array_split(np.array(vrefs, dtype=object), B)
        if len(g)
    ]
    refs = [init.remote(*g) for g in groups]

    @ray.remote
    def counts(t: pa.Table) -> pd.DataFrame:
        return _pair_counts(t)

    @ray.remote
    def fold(*parts: pd.DataFrame) -> pd.DataFrame:
        return _fold_top(list(parts))

    @ray.remote
    def apply(t: pa.Table, left: str, right: str) -> pa.Table:
        return _apply_merge(t, left, right)

    merges: list[tuple[str, str, int]] = []
    for _ in range(int(n_merges)):
        parts = [counts.remote(r) for r in refs]
        while len(parts) > 1:
            parts = [
                fold.remote(*parts[i : i + fanin])
                for i in range(0, len(parts), fanin)
            ]
        agg = ray.get(parts[0])
        if not len(agg):
            break
        agg = agg.sort_values(
            ["n", "l", "r"], ascending=[False, True, True], kind="stable"
        )
        top = agg.iloc[0]
        if int(top["n"]) < min_pair_count:
            break
        left, right = str(top["l"]), str(top["r"])
        merges.append((left, right, int(top["n"])))
        refs = [apply.remote(r, left, right) for r in refs]

    return pa.table(
        {
            "rank": pa.array(range(len(merges)), pa.int64()),
            "left": pa.array([m[0] for m in merges], pa.string()),
            "right": pa.array([m[1] for m in merges], pa.string()),
            "count": pa.array([m[2] for m in merges], pa.int64()),
        }
    )


class _Encoder:
    """Task-pool kernel: re-tokenize each batch's words under a learned
    merge list (applied in rank order, each a vectorized pass over the
    batch's flat symbol array)."""

    def __init__(self, merges: list[tuple[str, str]], id_col: str, text_col: str):
        self.merges = merges
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = pa.table(
            {
                self.id_col: pa.array([], pa.int64()),
                "n_words": pa.array([], pa.int64()),
                "n_bpe_tokens": pa.array([], pa.int64()),
            }
        )
        if not t.num_rows:
            return empty
        arr = t[self.text_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        low = pc.utf8_lower(arr)
        words = pc.utf8_split_whitespace(
            pc.replace_substring_regex(low, r"\W+", " ")
        )
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        wc = (
            pc.list_value_length(words)
            .fill_null(0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        flat = words.flatten()
        nz = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(len(wc)), wc)[nz]
        toks = flat.filter(pa.array(nz)).to_pylist()
        # flatten to symbols with a WORD-INSTANCE id (each occurrence is
        # its own segmentation unit); vectorized char explode
        s, wd = _explode_symbols(toks)
        for left, right in self.merges:
            m = _leftmost_matches(s, wd, left, right)
            if not m.any():
                continue
            starts = np.flatnonzero(m)
            s[starts] = left + right
            drop = np.zeros(len(s), dtype=bool)
            drop[starts + 1] = True
            s, wd = s[~drop], wd[~drop]
        n_words = np.bincount(doc_of, minlength=len(wc)).astype(np.int64)
        if len(wd):
            # wd indexes word instances; doc_of maps instance -> doc row
            n_bpe = np.bincount(doc_of[wd], minlength=len(wc)).astype(np.int64)
        else:
            n_bpe = np.zeros(len(wc), dtype=np.int64)
        return pa.table(
            {
                self.id_col: t[self.id_col].cast(pa.int64()),
                "n_words": pa.array(n_words, pa.int64()),
                "n_bpe_tokens": pa.array(n_bpe, pa.int64()),
            }
        )


def bpe_encode_counts(
    ds, merges: pa.Table, id_col: str = "doc_id", text_col: str = "text"
):
    """Per-document BPE token counts under a learned merge table: the
    batch's words flatten to one symbol array, each merge is one
    vectorized pass, and only (id, n_words, n_bpe_tokens) rows leave the
    batch."""
    pairs = list(
        zip(merges["left"].to_pylist(), merges["right"].to_pylist())
    )
    return ds.map_batches(
        _Encoder(pairs, id_col, text_col), batch_format="pyarrow"
    )
