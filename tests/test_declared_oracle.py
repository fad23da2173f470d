"""t2-style oracle harness: every declared query, engine vs DuckDB.

This mirrors the driver's correctness gate (CORRECTNESS_r{N}.json): run the
engine side (Spark SQL or DataFrame program) and the oracle side (DuckDB) on
the same parquet tables, normalize per SURVEY.md Appendix B, compare.
"""

from __future__ import annotations

import pytest

from nyuki_spark.oracle import compare, fetch_duckdb, fetch_spark
from nyuki_spark.queries import REGISTRY

ORACLE_IDS = sorted(qid for qid, q in REGISTRY.items() if q.oracle_sql is not None)
ROWS_ONLY_IDS = sorted(qid for qid, q in REGISTRY.items() if q.oracle_sql is None)


@pytest.mark.parametrize("qid", ORACLE_IDS)
def test_oracle_match(qid, spark, duck, sf_dir):
    q = REGISTRY[qid]
    ecols, erows = fetch_spark(q.run(spark, sf_dir))
    ocols, orows = fetch_duckdb(duck, q.oracle_sql)
    res = compare(ecols, erows, ocols, orows, ordered=True)
    assert res.ok, f"{qid}: {res.detail}"


@pytest.mark.parametrize("qid", ROWS_ONLY_IDS)
def test_rows_only_runs(qid, spark, sf_dir):
    q = REGISTRY[qid]
    df = q.run(spark, sf_dir)
    assert df.count() >= 0
