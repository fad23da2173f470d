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

import re

import pytest

from nyuki_spark.queries import REGISTRY

_PATTERNS = ("CartesianProduct", "BroadcastNestedLoopJoin", "Exchange SinglePartition")

# Pass-through physical nodes that sit between an Exchange and its logical
# producer in the plan string without changing what data moves through it.
_WRAPPER_NODES = ("WholeStageCodegen", "InputAdapter", "ShuffleQueryStage", "AQEShuffleRead")


def _tree_depth(line: str) -> int:
    """Depth of a plan-string line, from its tree-drawing prefix length
    (``+- `` / ``:- `` / ``:  `` runs, 3 chars per level)."""
    return len(re.match(r"^[\s:+|-]*", line).group(0))


def _single_partition_is_scalar_collect(plan: str) -> bool:
    """True iff EVERY ``Exchange SinglePartition`` in the plan consumes a
    ``partial_`` aggregate — the legal scalar-aggregate shape where one
    pre-aggregated row per partition moves, never data rows.
    (tpch_q06/q14/q15/q17/q19/q22, agg_percentile, scan_count, subq_*.)

    The child is located by tree indentation depth, not by taking the
    literal next line (ADVICE r3): plan layout varies across Spark
    versions / AQE re-planning, and wrapper nodes (WholeStageCodegen,
    InputAdapter, ShuffleQueryStage) can sit between the Exchange and the
    aggregate without changing what flows through it.
    """
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        depth = _tree_depth(line)
        child = None
        for j in range(i + 1, len(lines)):
            d = _tree_depth(lines[j])
            if d <= depth:
                break  # sibling or ancestor: Exchange has no printed child
            if any(w in lines[j] for w in _WRAPPER_NODES):
                continue  # descend through pass-through wrappers
            child = lines[j]
            break
        if child is None or "partial_" not in child:
            return False
    return True

# qid -> (patterns allowed, reason). Every reason must describe why the
# pattern is bounded (moves k rows / joins a constant-size side), not why
# it is convenient.
ALLOWLIST: dict[str, tuple[tuple[str, ...], str]] = {
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
    "profile_histogram": (
        ("BroadcastNestedLoopJoin",),
        "1-row broadcast of the scalar min/max bounds (partial-"
        "aggregated) onto the scan — the explicit-broadcast "
        "scalar-subquery shape",
    ),
    "stat_psi_drift": (
        ("BroadcastNestedLoopJoin",),
        "two 1-row broadcasts (global min/max bounds; period totals), "
        "both partial-aggregated scalars — the explicit-broadcast "
        "scalar-subquery shape",
    ),
    "skew_report": (
        ("BroadcastNestedLoopJoin",),
        "10-row vs 1-row broadcast cross join joining the top-k table to "
        "the scalar total (partial-aggregated, auto-allowed)",
    ),
    "llm_pq_adc": (
        ("BroadcastNestedLoopJoin",),
        "four kmeans_fit subspace runs (k=4 broadcast centroid crossJoin) "
        "feeding k-row distance-table broadcasts; lookups are code-id "
        "equi-joins",
    ),
    "llm_pq_codes": (
        ("BroadcastNestedLoopJoin",),
        "four kmeans_assign subspace runs, each crossJoining vectors with "
        "its broadcast k-row centroid table (k=4, compile-time constant)",
    ),
    "llm_semantic_prune": (
        ("BroadcastNestedLoopJoin",),
        "inherits kmeans_assign's assignment crossJoin with the broadcast "
        "k-row centroid table (k=8, compile-time constant); the pair "
        "stage itself is an equi-join on cluster_id",
    ),
    "tpch_q11": (
        ("BroadcastNestedLoopJoin",),
        "1-row broadcast of the grand-total threshold onto the "
        "checkpointed per-part aggregate (queries/tpch.py:_q11_engine) — "
        "the scalar-HAVING-subquery shape as an explicit broadcast; the "
        "N-row side never shuffles for it",
    ),
    "llm_tfidf_topterms": (
        ("BroadcastNestedLoopJoin",),
        "1-row broadcast of the scalar corpus doc count (partial-"
        "aggregated) onto the tf/df join — the scalar-subquery shape as "
        "an explicit broadcast",
    ),
    "llm_kmeans_assign": (
        ("BroadcastNestedLoopJoin",),
        "assignment step crossJoins each vector with the broadcast k-row "
        "centroid table (k=8, compile-time constant); BNLJ with a "
        "constant-size build IS the right plan — the N-row side never "
        "shuffles",
    ),
    "llm_shuffle_order": (
        ("Exchange SinglePartition",),
        "global_row_number's offset merge: SinglePartition only ever "
        "consumes the num_buckets-row bucket-size table (operators/"
        "rank.py), never data rows — same bounded shape as win_rank",
    ),
    "win_rank": (
        ("Exchange SinglePartition",),
        "size-adaptive rank (queries/declared.py): below one 32 MB bucket "
        "the plain windowed plan runs (SinglePartition over a bounded "
        "input — the sweep sees this branch at sf0.001); at scale the "
        "two-phase range-bucketed plan runs and SinglePartition only ever "
        "consumes the n_buckets-row offset table (operators/rank.py)",
    ),
}


@pytest.mark.parametrize("qid", sorted(REGISTRY))
def test_no_scale_killers(qid, spark, sf_dir):
    df = REGISTRY[qid].run(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    allowed, _reason = ALLOWLIST.get(qid, ((), ""))
    hits = [p for p in _PATTERNS if p in plan and p not in allowed]
    if "Exchange SinglePartition" in hits and _single_partition_is_scalar_collect(plan):
        hits.remove("Exchange SinglePartition")
    assert not hits, f"{qid}: scale-killer pattern(s) {hits} in plan:\n{plan[:800]}"
    stale = [p for p in allowed if p not in plan]
    assert not stale, (
        f"{qid}: allowlist entries {stale} no longer appear in the plan — "
        f"remove them so the allowlist only shrinks"
    )
