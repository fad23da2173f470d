"""Median-of-N wall-time for a subset of registry queries at sf0.1.

Development companion to bench.py — same methodology (warm session,
tables registered once, toArrow materialisation, median of N), but only
for the ids on the command line, so a perf iteration loop is seconds,
not the full 220-query sweep.

Usage: python scripts/bench_subset.py tpch_q11 tpch_q21 [...]
       NYUKI_BENCH_REPS / SPARK_GRAFT_SF_DIR as in bench.py.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_REPS = int(os.environ.get("NYUKI_BENCH_REPS", "5"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("NYUKI_SHUFFLE_PARTITIONS", "8")
    from nyuki_spark.catalog import register_tables
    from nyuki_spark.queries import REGISTRY
    from nyuki_spark.session import get_session

    ids = sys.argv[1:]
    load_start = os.getloadavg()
    spark = get_session("nyuki-bench-subset", master="local[32]")
    register_tables(spark, sf_dir)
    spark.sql("SELECT COUNT(*) AS n FROM lineitem").toArrow()

    results: dict[str, dict] = {}
    for qid in ids:
        q = REGISTRY[qid]
        times = []
        for _ in range(N_REPS):
            t0 = time.perf_counter()
            df = q.engine_fn(spark, sf_dir) if q.engine_fn else spark.sql(q.engine_sql)
            df.toArrow()
            times.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
        med = statistics.median(times)
        results[qid] = {"median": round(med, 3), "min": round(min(times), 3),
                        "max": round(max(times), 3), "reps": N_REPS}
        print(f"{qid:24s} median={med:.3f}s "
              f"min={min(times):.3f} max={max(times):.3f}")
    # Contention evidence travels WITH every measurement (r6 verdict #1/#4):
    # a budget claim is only admissible at loadavg_start[0] < 1.
    payload = {
        "sf_dir": sf_dir,
        "reps": N_REPS,
        "queries": results,
        "loadavg_start": [round(x, 2) for x in load_start],
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "timestamp_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    print(json.dumps(payload))
    out = os.environ.get("NYUKI_BENCH_SUBSET_OUT")
    if out:
        with open(out, "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
