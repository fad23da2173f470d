"""Registry-wide scale-killer sweep: every registered query's physical plan
is scanned for the three patterns that kill a plan at 100 TB —
``CartesianProduct``, ``BroadcastNestedLoopJoin``, and ``Exchange
SinglePartition`` (the single-partition sort/agg/window funnel).

Exceptions are explicit and documented: an allowlist entry must name the
reason the pattern is legitimate for that query (bounded build side,
partial-aggregate scalar collect, deliberately-scoped verification pass).
The allowlist is checked for staleness — an entry whose query no longer
trips the sweep must be removed, so the list can only shrink.
"""

from __future__ import annotations

import pytest

from nyuki_spark.queries import REGISTRY

_PATTERNS = ("CartesianProduct", "BroadcastNestedLoopJoin", "Exchange SinglePartition")

# qid -> (patterns allowed, reason). Every reason must describe why the
# pattern is bounded (moves k rows / joins a constant-size side), not why
# it is convenient.
ALLOWLIST: dict[str, tuple[tuple[str, ...], str]] = {
    "agg_percentile": (
        ("Exchange SinglePartition",),
        "exact global MEDIAN: SinglePartition consumes partial_percentile "
        "buffers (one compressed buffer per partition, not raw rows); the "
        "100 TB path is approx_percentile, kept as the declared exact form",
    ),
    "join_cross": (
        ("BroadcastNestedLoopJoin",),
        "declared CROSS JOIN semantics with a 5-row broadcast side (region); "
        "BNLJ with a constant-size build IS the right plan",
    ),
    "llm_fuzzy_levenshtein": (
        ("BroadcastNestedLoopJoin",),
        "deliberately id-bounded verification pass (<150 keys per side, "
        "docstring-scoped); the scale path gates on simhash candidates",
    ),
    "scan_count": (
        ("Exchange SinglePartition",),
        "global COUNT(*): SinglePartition consumes partial_count rows "
        "(one per partition)",
    ),
    "skew_report": (
        ("BroadcastNestedLoopJoin", "Exchange SinglePartition"),
        "scalar total via partial_sum (asserted in test_plan_quality) and a "
        "10-row vs 1-row broadcast cross join",
    ),
    "subq_not_in_null": (
        ("Exchange SinglePartition",),
        "two scalar COUNT(1) branches: SinglePartition consumes "
        "partial_count; the NOT IN itself plans as BroadcastHashJoin LeftAnti",
    ),
    "subq_scalar": (
        ("Exchange SinglePartition",),
        "scalar subquery = global aggregate over partial_avg rows",
    ),
    "win_rank": (
        ("Exchange SinglePartition",),
        "two-phase range-bucketed rank: SinglePartition consumes the "
        "per-bucket count table (n_buckets rows) to compute offsets, never "
        "the data rows (operators/rank.py)",
    ),
}


@pytest.mark.parametrize("qid", sorted(REGISTRY))
def test_no_scale_killers(qid, spark, sf_dir):
    df = REGISTRY[qid].run(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    allowed, _reason = ALLOWLIST.get(qid, ((), ""))
    hits = [p for p in _PATTERNS if p in plan and p not in allowed]
    assert not hits, f"{qid}: scale-killer pattern(s) {hits} in plan:\n{plan[:800]}"
    stale = [p for p in allowed if p not in plan]
    assert not stale, (
        f"{qid}: allowlist entries {stale} no longer appear in the plan — "
        f"remove them so the allowlist only shrinks"
    )
