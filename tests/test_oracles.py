"""Pin the LSH/sketch SQL oracles to their kernels.

The three oracles added late in round 4 (SQL_DOC_SIMHASH,
SQL_DOC_SIMHASH_PAIRS, SQL_DOC_NEAR_DUPS) replay seeded hash machinery —
FNV-1a, the 64-perm MinHash family, polynomial band folds — in DuckDB
HUGEINT arithmetic with the constants inlined as literals. Any drift in
the kernel constants (seed, num_perm, bands, k, max_bucket, the FNV/M61
arithmetic) must break HERE, in the suite, not only in the driver gate.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return con.sql(sql).df()


def _ray_df(name: str) -> pd.DataFrame:
    from ray_ordered_stream.pipelines.queries import QUERIES

    res = QUERIES[name][0](SF)
    return res if isinstance(res, pd.DataFrame) else res.to_pandas()


@pytest.mark.parametrize(
    "name, keys",
    [
        ("doc_simhash", ["doc_id"]),
        ("doc_simhash_pairs", ["id_a", "id_b"]),
        ("doc_near_dups", ["id_a", "id_b"]),
    ],
)
def test_lsh_sql_oracle_matches_kernel(ray_session, name, keys):
    from ray_ordered_stream.pipelines.queries import QUERIES

    sql = QUERIES[name][1]
    assert sql is not None, f"{name} lost its oracle"
    got = _ray_df(name).sort_values(keys).reset_index(drop=True)
    exp = _oracle(sql).sort_values(keys).reset_index(drop=True)
    assert len(got) == len(exp) and len(got) > 0
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, atol=1e-9)


@pytest.mark.parametrize("seed", [11, 12])
def test_lsh_sql_oracle_random_corpus(ray_session, tmp_path, seed):
    """The oracles must mirror the kernels on ARBITRARY corpora meeting
    their documented preconditions (ASCII, normalized length >= 7), not
    just the fixed testdata: random zipf word soup with messy whitespace,
    1-12 char tokens and planted exact + near duplicates."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from ray_ordered_stream.functions.dedup import (
        SimHasher,
        near_dup_pairs,
        simhash_near_dups,
    )
    from ray_ordered_stream.pipelines.queries import (
        SQL_DOC_NEAR_DUPS,
        SQL_DOC_SIMHASH,
        SQL_DOC_SIMHASH_PAIRS,
    )

    rng = np.random.default_rng(seed)
    # word length >= 3 so the shortest doc (3 words) normalizes to >= 11
    # chars — every doc satisfies the oracle's length >= k=7 precondition
    vocab = np.array(
        ["".join(rng.choice(list("abcdefgh"), size=rng.integers(3, 13)))
         for _ in range(60)],
        dtype=object,
    )
    texts = []
    for i in range(120):
        words = rng.choice(vocab, size=rng.integers(3, 25))
        sep = "  " if i % 7 == 0 else " "   # messy whitespace hits _normalize
        t = sep.join(words)
        if i % 11 == 0:
            t = " " + t + "\t"
        texts.append(t)
    for i in range(0, 20, 2):               # planted exact duplicates
        texts[100 + i] = texts[i]
    for i in range(1, 20, 2):               # near duplicates (one-word edit)
        texts[100 + i] = texts[i] + " " + str(vocab[0])
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    path = tmp_path / "documents.parquet"
    pq.write_table(tbl, path)

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')"
    )

    def docs():
        return rd.read_parquet(str(path))

    sims = SimHasher.simhash_batch(tbl["text"].combine_chunks())
    got = pd.DataFrame(
        {"doc_id": range(len(texts)),
         "simhash": sims.astype("int64"),
         "simhash_bucket": (sims >> np.uint64(48)).astype("int64")}
    )
    exp = con.sql(SQL_DOC_SIMHASH).df().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    for ds_fn, sql, kw in (
        (simhash_near_dups, SQL_DOC_SIMHASH_PAIRS, {"max_hamming": 3}),
        (near_dup_pairs, SQL_DOC_NEAR_DUPS, {"threshold": 0.5}),
    ):
        got = ds_fn(docs(), **kw).to_pandas()
        got = got[sorted(got.columns)].sort_values(["id_a", "id_b"]).reset_index(drop=True)
        exp = con.sql(sql).df()
        exp = exp[sorted(exp.columns)].sort_values(["id_a", "id_b"]).reset_index(drop=True)
        assert len(got) > 0  # planted dups guarantee pairs exist
        pd.testing.assert_frame_equal(got, exp, check_dtype=False, atol=1e-9)


def test_simhash_sql_oracle_zero_token_docs(ray_session, tmp_path):
    """Empty / whitespace-only documents get simhash 0 in the kernel (and
    collide in every band); the SQL mirror's LEFT JOIN must keep them
    rather than dropping their rows."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from ray_ordered_stream.functions.dedup import SimHasher, simhash_near_dups
    from ray_ordered_stream.pipelines.queries import (
        SQL_DOC_SIMHASH,
        SQL_DOC_SIMHASH_PAIRS,
    )

    texts = ["", "   \t ", "alpha beta gamma", "delta epsilon", "alpha beta gamma"]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    path = tmp_path / "documents.parquet"
    pq.write_table(tbl, path)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')")

    sims = SimHasher.simhash_batch(tbl["text"].combine_chunks())
    assert sims[0] == 0 and sims[1] == 0  # the zero-token cases
    got = pd.DataFrame(
        {"doc_id": range(len(texts)),
         "simhash": sims.astype("int64"),
         "simhash_bucket": (sims >> np.uint64(48)).astype("int64")}
    )
    exp = con.sql(SQL_DOC_SIMHASH).df().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    got_p = simhash_near_dups(
        rd.read_parquet(str(path)), max_hamming=3
    ).to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    exp_p = con.sql(SQL_DOC_SIMHASH_PAIRS).df().sort_values(
        ["id_a", "id_b"]
    ).reset_index(drop=True)
    # the two zero-token docs and the duplicated text must both pair up
    assert {(0, 1), (2, 4)} <= set(zip(exp_p.id_a, exp_p.id_b))
    pd.testing.assert_frame_equal(
        got_p[sorted(got_p.columns)], exp_p[sorted(exp_p.columns)],
        check_dtype=False,
    )
