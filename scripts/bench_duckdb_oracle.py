"""Time the DuckDB oracle side of a suite at a given SF — baseline budgets.

BASELINE.md's declared-suite budgets came from a naive-PySpark run; the
TPC-H suite never had oracle timings (r3 gap: a perf regression in any
tpch_* query was invisible). This prints one JSON line of per-query DuckDB
median wall times so BENCH_r{N} numbers have a same-data reference point.

Usage: python scripts/bench_duckdb_oracle.py [suite=tpch] [sf_dir=/root/testdata/sf0.1]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyuki_spark.catalog import TABLES
from nyuki_spark.queries import REGISTRY

N_REPS = int(os.environ.get("NYUKI_BENCH_REPS", "5"))


def main() -> None:
    suite = sys.argv[1] if len(sys.argv) > 1 else "tpch"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    con = duckdb.connect()
    con.execute(f"PRAGMA threads={os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t in TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    per_query = {}
    for qid, q in sorted(REGISTRY.items()):
        # TPC-H registers as suite="extension", category="tpch" — match the
        # bench.py grouping so budgets line up with BENCH_r{N} suites.
        group = "tpch" if q.category == "tpch" else q.suite
        if group != suite or not q.oracle_sql:
            continue
        times = []
        for _ in range(N_REPS):
            t0 = time.perf_counter()
            con.execute(q.oracle_sql).fetchall()
            times.append(time.perf_counter() - t0)
        per_query[qid] = round(statistics.median(times), 4)
    print(json.dumps({
        "metric": f"duckdb_{suite}_oracle_total",
        "value": round(sum(per_query.values()), 3),
        "unit": "sec",
        "queries": per_query,
        "sf_dir": sf_dir,
    }))


if __name__ == "__main__":
    main()
