"""Executed hot-key skew probe (r5 VERDICT ask #5).

Builds an adversarially skewed events replica at sf0.1 volume — ONE user
(user_id=7, inside every probed query's user filter) owns 50% of all
events — and times the window/fold/join-heavy operators on it vs the
uniform fixture. The point is to demonstrate, not assert-by-contract,
that the per-key collect_list folds (ts_ewma, ts_holt_trend), the
partitioned windows (win_* family), and the sessionizers stay bounded
when a key is pathologically hot: their per-key state is either capped
by construction (resample/filter first) or the window partition is the
user, whose one hot partition is half the table — the worst single-task
case a 100 TB shuffle sees.

The replica is written by DuckDB (preserves the timestamp column type;
other tables are symlinked from the uniform sf dir), so every query runs
unmodified through the registry.

Usage: python scripts/skew_probe.py [uniform_sf_dir]
Emits a BASELINE.md-ready markdown table; exits 1 if any operator runs
> 3x its uniform-key time (the r5 verdict gate) — a slower-but-bounded
hot partition is expected, a super-linear blowup is a bug.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBES = [
    "win_analytic_dist",
    "win_first_last",
    "win_lag_lead",
    "win_moving_avg",
    "win_rank",
    "win_running_frame",
    "win_topk_per_group",
    "ts_ewma",
    "ts_holt_trend",
    "ts_session_maxlen",
    "stream_session_gaps",
    "join_inner_equi",
    "agg_salted_skew",
]

N_REPS = int(os.environ.get("NYUKI_BENCH_REPS", "3"))


def build_skew_dir(uniform: str, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    duckdb.execute(
        "COPY (SELECT event_id, ts,"
        " CASE WHEN event_id % 2 = 0 THEN 7 ELSE user_id END AS user_id,"
        " event_type, value, props"
        f" FROM '{uniform}/events.parquet')"
        f" TO '{out_dir}/events.parquet' (FORMAT PARQUET)"
    )
    for t in (
        "region nation customer supplier part orders lineitem "
        "documents embeddings"
    ).split():
        dst = f"{out_dir}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{uniform}/{t}.parquet", dst)


def main() -> int:
    uniform = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    skew_dir = "/tmp/nyuki-skew-sf0.1"
    build_skew_dir(uniform, skew_dir)
    hot = duckdb.sql(
        f"SELECT COUNT(*) FILTER (user_id = 7) * 1.0 / COUNT(*)"
        f" FROM '{skew_dir}/events.parquet'"
    ).fetchone()[0]

    os.environ.setdefault("NYUKI_SHUFFLE_PARTITIONS", "8")
    from nyuki_spark.queries import REGISTRY
    from nyuki_spark.session import get_session

    spark = get_session("nyuki-skew-probe", master="local[32]")

    def timed(qid: str, sf_dir: str) -> tuple[float, bool]:
        q = REGISTRY[qid]
        times, skewed_plan = [], False
        for _ in range(N_REPS):
            t0 = time.perf_counter()
            df = q.run(spark, sf_dir)
            df.toArrow()
            times.append(time.perf_counter() - t0)
            # AQE marks split hot partitions as "skew=true" / coalesced
            # skewed reads in the executed plan string.
            plan = df._jdf.queryExecution().executedPlan().toString()
            skewed_plan = skewed_plan or ("skew=true" in plan)
        spark.catalog.clearCache()
        return statistics.median(times), skewed_plan

    print(f"# hot-key probe: user_id=7 owns {hot:.0%} of events, sf0.1 volume")
    print("| query | uniform s | skewed s | ratio | AQE skew split |")
    print("|---|---|---|---|---|")
    bad = []
    for qid in PROBES:
        if qid not in REGISTRY:
            continue
        tu, _ = timed(qid, uniform)
        tskew, aqe = timed(qid, skew_dir)
        ratio = tskew / tu if tu else float("inf")
        flag = " **>3x**" if ratio > 3 and tskew - tu > 0.15 else ""
        if flag:
            bad.append((qid, round(ratio, 2)))
        print(
            f"| {qid} | {tu:.2f} | {tskew:.2f} | {ratio:.2f}x{flag} |"
            f" {'yes' if aqe else 'no'} |"
        )
    if bad:
        print(f"SKEW GATE MISS (>3x and >0.15s absolute): {bad}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
