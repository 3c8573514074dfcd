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
