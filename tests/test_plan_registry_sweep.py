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
from nyuki_spark.queries.registry import SWEEP_INTERMEDIATES

_PATTERNS = (
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "Exchange SinglePartition",
    "Window EmptyPartitionSpec",
    "Exchange OneGroupConstant",
)

# Physical node classes that wrap another plan without changing what data
# moves through them — descended through when locating an Exchange's
# logical producer.
_WRAPPER_CLASSES = ("WholeStageCodegenExec", "InputAdapter", "AQEShuffleReadExec")

# Expression classes that embed a physical subquery plan (reachable via
# ``.plan()``); the pretty-printed string used to surface these as extra
# "Subquery" sections, so the walk must traverse them too.
_SUBQUERY_EXPRS = ("ScalarSubquery", "InSubqueryExec", "DynamicPruningSubquery")


def _iter_plan_nodes(jplan):
    """Yield (node, class-simple-name) over the WHOLE physical plan tree
    via the JVM objects, not the pretty-printed string (r4 VERDICT ask:
    the string format changes across Spark versions; class names and the
    TreeNode children API are the stable surface). Descends through AQE
    wrappers (current plan of AdaptiveSparkPlanExec, materialized plan of
    QueryStageExec), reused exchanges, and subquery expression plans.
    """
    stack = [jplan]
    while stack:
        n = stack.pop()
        cls = n.getClass().getSimpleName()
        yield n, cls
        if cls == "AdaptiveSparkPlanExec":
            stack.append(n.executedPlan())
            continue
        if cls.endswith("QueryStageExec"):
            stack.append(n.plan())
            continue
        if cls == "ReusedExchangeExec":
            stack.append(n.child())
            continue
        if cls == "InMemoryTableScanExec":
            # A persist() marks the subtree as an InMemoryRelation whose
            # plan is NOT a child of the scan node — descend explicitly,
            # or every cached stage (minhash signatures, dup-collapse
            # groups, pagerank edge lists) becomes a sweep blind spot
            # (r5 advice: no pinned stage may dodge the sweep).
            stack.append(n.relation().cachedPlan())
            continue
        ch = n.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
        exprs = n.expressions()
        estack = [exprs.apply(i) for i in range(exprs.size())]
        while estack:
            e = estack.pop()
            if e.getClass().getSimpleName() in _SUBQUERY_EXPRS:
                stack.append(e.plan())
            ech = e.children()
            for i in range(ech.size()):
                estack.append(ech.apply(i))


def _producer(node):
    """The node whose rows an Exchange moves: its child, descended through
    pass-through wrappers and query stages."""
    n = node.child()
    while True:
        cls = n.getClass().getSimpleName()
        if cls in _WRAPPER_CLASSES:
            n = n.child()
        elif cls.endswith("QueryStageExec"):
            n = n.plan()
        elif cls == "ReusedExchangeExec":
            n = n.child()
        else:
            return n


def _is_partial_aggregate(node) -> bool:
    """True iff ``node`` is a hash/sort/object aggregate running in
    Partial mode — one pre-aggregated row per partition moves through the
    Exchange above it, never data rows (the legal scalar-collect shape:
    tpch_q06/q14/q15/q17/q19/q22, agg_percentile, scan_count, subq_*)."""
    if "Aggregate" not in node.getClass().getSimpleName():
        return False
    aggs = node.aggregateExpressions()
    if aggs.size() == 0:
        return False
    return all(
        aggs.apply(i).mode().toString() == "Partial" for i in range(aggs.size())
    )


def _is_one_group_shaped(expr) -> bool:
    """True iff ``expr`` is pmod(<anything>, 1) — the one_group()
    constant (operators/rank.py). Constant for every row, so a hash
    Exchange keyed ONLY by such expressions routes all rows to a single
    partition exactly like Exchange SinglePartition, while printing as an
    innocent hashpartitioning (r7 advice: when one_group replaced
    lit(0) windows, six SinglePartition allowlist entries vanished and
    the funnel went invisible to this sweep)."""
    if expr.getClass().getSimpleName() != "Pmod":
        return False
    ch = expr.children()
    return (
        ch.size() == 2
        and ch.apply(1).getClass().getSimpleName() == "Literal"
        and ch.apply(1).toString() == "1"
    )


def _one_group_alias_ids(subtree) -> set:
    """exprIds that ProjectExec nodes in ``subtree`` define as
    pmod(x, 1) aliases. Window planning projects one_group(col) into a
    ``_w0`` attribute BELOW the exchange, so the exchange's partitioning
    key is a plain AttributeReference — the constant shape is only
    visible at its defining Alias."""
    ids = set()
    for n, cls in _iter_plan_nodes(subtree):
        if cls != "ProjectExec":
            continue
        pl = n.projectList()
        for i in range(pl.size()):
            a = pl.apply(i)
            if a.getClass().getSimpleName() == "Alias" and _is_one_group_shaped(
                a.child()
            ):
                ids.add(a.exprId().id())
    return ids


def _found_patterns(jplan) -> set[str]:
    """The scale-killer patterns present in a plan tree, with the
    scalar-collect exemption applied per Exchange (a SinglePartition
    Exchange whose producer is a Partial aggregate is auto-legal)."""
    found: set[str] = set()
    for n, cls in _iter_plan_nodes(jplan):
        if cls == "CartesianProductExec":
            found.add("CartesianProduct")
        elif cls == "BroadcastNestedLoopJoinExec":
            found.add("BroadcastNestedLoopJoin")
        elif cls == "ShuffleExchangeExec" and n.outputPartitioning().toString().startswith(
            "SinglePartition"
        ):
            if not _is_partial_aggregate(_producer(n)):
                found.add("Exchange SinglePartition")
        elif cls == "ShuffleExchangeExec":
            part = n.outputPartitioning()
            if part.getClass().getSimpleName() == "HashPartitioning":
                exprs = part.expressions()
                alias_ids = None
                one_group_keys = 0
                for i in range(exprs.size()):
                    e = exprs.apply(i)
                    if _is_one_group_shaped(e):
                        one_group_keys += 1
                    elif e.getClass().getSimpleName() == "AttributeReference":
                        if alias_ids is None:
                            alias_ids = _one_group_alias_ids(n.child())
                        if e.exprId().id() in alias_ids:
                            one_group_keys += 1
                if exprs.size() > 0 and one_group_keys == exprs.size():
                    if not _is_partial_aggregate(_producer(n)):
                        found.add("Exchange OneGroupConstant")
        elif cls in ("WindowExec", "WindowInPandasExec", "WindowGroupLimitExec"):
            # An EMPTY partition spec makes WindowExec demand AllTuples
            # (move-all-rows-to-one-partition + the runtime warning). Every
            # deliberate single-group window in the engine partitions by
            # one_group(...) (operators/rank.py) — constant 0, but a
            # NON-EMPTY spec — so any empty spec here is an accident.
            # This is the static form of the r6 "zero-warning sweep" ask.
            if n.partitionSpec().isEmpty():
                found.add("Window EmptyPartitionSpec")
    return found

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
    "llm_sq8_error": (
        ("BroadcastNestedLoopJoin",),
        "1-row broadcast of the per-dim min/max bounds (partial-"
        "aggregated) onto the vectors — the scalar-bounds shape "
        "(profile_histogram precedent)",
    ),
    "llm_knn_multi": (
        ("BroadcastNestedLoopJoin",),
        "10-row broadcast of the query vectors onto the pool (constant-"
        "size build); top-k is salted two-phase, never a 10-partition "
        "funnel over the full score table",
    ),
    "llm_hard_negatives": (
        ("BroadcastNestedLoopJoin",),
        "10-row broadcast of the query vectors with the label-mismatch "
        "predicate onto the pool (constant-size build, llm_knn_multi "
        "precedent); top-k is salted two-phase",
    ),
    "net_assortativity": (
        ("BroadcastNestedLoopJoin",),
        "the backbone threshold: 1-row broadcast of the exact-percentile "
        "cutoff (partial-aggregated scalar) onto the pair-count table — "
        "the scalar-bounds shape (_supplier_backbone)",
    ),
    "net_degree_dist": (
        ("BroadcastNestedLoopJoin",),
        "the backbone threshold 1-row broadcast (_supplier_backbone, "
        "net_triangles precedent) — the only BNLJ build side is exactly "
        "one row (the 95th-percentile scalar)",
    ),
    "net_triangles": (
        ("BroadcastNestedLoopJoin",),
        "the backbone threshold 1-row broadcast (_supplier_backbone, "
        "net_assortativity precedent) plus the final merge of four 1-row "
        "partial-aggregated scalars (node/edge/wedge/triangle counts) by "
        "1-row broadcast crossJoins — every build side is exactly one row",
    ),
    "llm_embedding_drift": (
        ("BroadcastNestedLoopJoin",),
        "final merge of four 1-row sides (two half counts, two packed "
        "64-dim centroid vectors) by 1-row broadcast crossJoins — every "
        "build side is exactly one row; the only data-sized stage is the "
        "(half, dim) partial aggregate",
    ),
    "net_kcore": (
        ("BroadcastNestedLoopJoin",),
        "two 1-row broadcasts: the backbone's exact-percentile cutoff "
        "(_supplier_backbone) and the median-degree peel threshold — "
        "both partial-aggregated scalars crossJoined onto key tables "
        "(the scalar-bounds shape); peel joins themselves are semi "
        "equi-joins",
    ),
    "net_common_neighbors": (
        ("BroadcastNestedLoopJoin",),
        "the backbone threshold: 1-row broadcast of the exact-percentile "
        "cutoff onto the pair-count table (_supplier_backbone, "
        "net_assortativity precedent); all graph joins are key equi-joins "
        "and the top-20 is TakeOrderedAndProject",
    ),
    "llm_rank_bm25": (
        ("BroadcastNestedLoopJoin",),
        "1-row broadcast of the corpus model (N, avgdl, per-term df — "
        "partial-aggregated) onto the per-doc stats table — the "
        "scalar-bounds shape (profile_histogram precedent)",
    ),
    "llm_mmr_rerank": (
        ("BroadcastNestedLoopJoin",),
        "every non-equi join runs on the localCheckpoint-pinned top-20 "
        "candidate set or the 1-row broadcast query vector; the only "
        "corpus-sized stage is the TakeOrdered relevance cut",
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
    "stat_quantile_sketch": (
        ("BroadcastNestedLoopJoin",),
        "two 1-row broadcasts of the global value bounds (partial-"
        "aggregated MIN/MAX scalars) — the scalar-bounds shape "
        "(profile_histogram precedent); the sketch itself is one "
        "(type, 128)-cell aggregate",
    ),
    "stat_k_anonymity": (
        ("BroadcastNestedLoopJoin",),
        "3-row compile-time k-grid (2/5/10) cross-joined onto the "
        "QI-group table (bounded by the quasi-identifier domain, "
        "nation x segment) — constant-size build",
    ),
    "stat_cramers_v": (
        ("BroadcastNestedLoopJoin",),
        "CROSS JOIN of the 1-row grand total (partial-aggregated scalar) "
        "onto the category-bounded contingency-cell table — the "
        "scalar-subquery shape as an explicit broadcast",
    ),
    "stat_ks_test": (
        ("BroadcastNestedLoopJoin",),
        "BNLJ = two 1-row broadcasts (value bounds; sample totals — both "
        "partial-aggregated scalars); the bucket-offset prefix window now "
        "partitions by one_group (r7), so no SinglePartition exchange",
    ),
    "stat_mann_whitney": (
        ("BroadcastNestedLoopJoin",),
        "BNLJ = the 1-row value-bounds broadcast; the bucket-offset "
        "prefix window now partitions by one_group (r7), so no "
        "SinglePartition exchange",
    ),
    "stat_wilcoxon_signed": (
        ("BroadcastNestedLoopJoin",),
        "1-row broadcasts (tie-correction scalar; the |d| rank self-join "
        "runs over the daily rollup, one row per day — resample-first "
        "contract like stat_spearman)",
    ),
    "llm_dataset_card": (
        ("BroadcastNestedLoopJoin",),
        "1-row broadcasts (language-total scalar, entropy row onto the "
        "1-row base aggregate) — every joined side is a "
        "partial-aggregated scalar",
    ),
    "stat_benford_digits": (
        ("BroadcastNestedLoopJoin",),
        "one 1-row broadcast (the partial-aggregated grand total) onto "
        "the <=9-row first-digit table — both sides bounded by "
        "construction, the stat_jensen_shannon shape",
    ),
    "stat_jensen_shannon": (
        ("BroadcastNestedLoopJoin",),
        "two 1-row broadcasts (global value bounds; period totals — both "
        "partial-aggregated scalars), the stat_psi_drift shape",
    ),
    "stat_spearman": (
        ("BroadcastNestedLoopJoin",),
        "the rank self-join runs over the DAILY rollup (one row per day "
        "of time range, ~60 rows — resample-first contract like ts_acf), "
        "never data rows; ranks need all-pairs comparisons by definition",
    ),
    "llm_ngram_kneser_ney": (
        ("BroadcastNestedLoopJoin",),
        "1-row broadcast of the distinct-bigram-type count (a "
        "partial-aggregated scalar) onto the vocabulary-sized model table",
    ),
    "net_adamic_adar": (
        ("BroadcastNestedLoopJoin",),
        "the backbone threshold: 1-row broadcast of the exact-percentile "
        "cutoff onto the pair-count table (_supplier_backbone, "
        "net_common_neighbors precedent); wedge/degree/anti joins are all "
        "key equi-joins",
    ),
    "net_modularity": (
        ("BroadcastNestedLoopJoin",),
        "the backbone threshold 1-row broadcast plus the 1-row edge-total "
        "scalar onto the 25-community table — every BNLJ side is a "
        "partial-aggregated scalar or the nation-domain rollup",
    ),
    "llm_lsh_tuning_curve": (
        ("BroadcastNestedLoopJoin",),
        "a 3-row config VALUES table crossed with a 19-point grid — the "
        "whole query is a 57-row design-table expression, no data scan "
        "at all",
    ),
    "net_local_clustering": (
        ("BroadcastNestedLoopJoin",),
        "the backbone threshold 1-row broadcast (_supplier_backbone, "
        "net_common_neighbors precedent); wedge/closure/degree joins are "
        "key equi-joins",
    ),
    "win_rank": (
        ("Exchange OneGroupConstant",),
        "two-phase range-bucketed rank: the one_group window consumes "
        "the per-bucket count table (n_buckets rows) to compute offsets, "
        "never the data rows (operators/rank.py)",
    ),
    "llm_seq_pack": (
        ("Exchange OneGroupConstant",),
        "two-phase range-bucketed global prefix sum "
        "(operators/rank.py:global_running_sum, the win_rank shape): at "
        "scale the one_group window merges the n_buckets-row offsets "
        "table only; at fixture SF the cost-based 1-bucket branch runs "
        "the plain one_group window over an input that fits one task",
    ),
    "ts_rolling_corr": (
        ("Exchange OneGroupConstant",),
        "the trailing-24h frame runs over the HOURLY ROLLUP of the joint "
        "click/purchase series — one row per hour of time range "
        "(resample-first contract, like ts_acf), never data rows; the "
        "series is global by definition so it cannot partition by key",
    ),
    "ts_sax_motifs": (
        ("Exchange OneGroupConstant", "BroadcastNestedLoopJoin"),
        "the LEAD chain runs over the DAY-bounded rollup under the "
        "one_group constant partition (global series by definition — "
        "the ts_rolling_corr precedent); the BNLJ is the 1-row "
        "mean/stddev broadcast (stat_psi_drift shape)",
    ),
    "ts_sax_symbols": (
        ("BroadcastNestedLoopJoin",),
        "1-row broadcast of the series' partial-aggregated mean/stddev "
        "onto the day-bounded rollup — the explicit-broadcast "
        "scalar-subquery shape (stat_psi_drift precedent)",
    ),
    "stat_kendall_tau": (
        ("BroadcastNestedLoopJoin",),
        "the concordance pair join (a.d < b.d) runs over the DAY-bounded "
        "click/purchase rollup — time-range^2 pairs, never data rows "
        "(stat_spearman / ts_theilsen_trend contract)",
    ),
    "stat_levene": (
        ("BroadcastNestedLoopJoin",),
        "1-row broadcast of the partial-aggregated grand totals (zbar, "
        "N, k) crossJoined onto the k-row group table — the explicit-"
        "broadcast scalar-subquery shape (stat_psi_drift precedent)",
    ),
    "stat_runs_test": (
        ("Exchange OneGroupConstant", "BroadcastNestedLoopJoin"),
        "the LAG sign-change chain runs over the DAY-bounded rollup "
        "under the one_group constant partition (global series by "
        "definition — ts_sax_motifs precedent); the BNLJ is the 1-row "
        "median broadcast (stat_psi_drift shape)",
    ),
    "ts_drawdown": (
        ("Exchange OneGroupConstant",),
        "running sum / running peak over the DAY-bounded daily rollup "
        "under the one_group constant partition (global cumulative "
        "series by definition — ts_sax_motifs precedent)",
    ),
    "stat_bh_fdr": (
        ("Exchange OneGroupConstant", "BroadcastNestedLoopJoin"),
        "the BH step-up running minimum ranks the k-row FAMILY census "
        "(one p-value per event type) under the one_group constant "
        "partition; the BNLJ is the 1-row partial-aggregated pooled "
        "moments broadcast onto the k-row type table (stat_psi_drift "
        "shape)",
    ),
    "llm_roc_auc": (
        ("Exchange OneGroupConstant", "BroadcastNestedLoopJoin"),
        "the cum_neg one_group window folds over the 4-dp-quantized "
        "score CENSUS (<= 10,001 rows by construction, never data rows "
        "— the distributed-AUC quantization trick); the BNLJ is the "
        "1-row partial-aggregated totals broadcast onto 9 threshold "
        "rows (explicit-broadcast scalar shape, stat_psi_drift "
        "precedent)",
    ),
    "llm_vocab_coverage": (
        ("Exchange OneGroupConstant", "BroadcastNestedLoopJoin"),
        "two global_running_sum prefix sums over the frequency-of-"
        "frequencies census (O(sqrt(tokens)) rows by the count-of-"
        "counts law — the llm_seq_pack two-phase shape, 1-bucket "
        "branch at fixture SF); the BNLJ is the 1-row total-tokens "
        "broadcast (explicit-broadcast scalar shape)",
    ),
}


@pytest.mark.parametrize("qid", sorted(REGISTRY))
def test_no_scale_killers(qid, spark, sf_dir):
    df = REGISTRY[qid].run(spark, sf_dir)
    jplan = df._jdf.queryExecution().executedPlan()
    found = _found_patterns(jplan)
    # Stages a query pins behind a localCheckpoint (an RDD scan in the
    # final plan) are swept via their registered pre-barrier builder —
    # the barrier must not create a blind spot (r5 advice), and the
    # owning query's allowlist covers both plans.
    inter_fn = SWEEP_INTERMEDIATES.get(qid)
    if inter_fn is not None:
        inter_plan = inter_fn(spark, sf_dir)._jdf.queryExecution().executedPlan()
        found |= _found_patterns(inter_plan)
    allowed, _reason = ALLOWLIST.get(qid, ((), ""))
    hits = [p for p in _PATTERNS if p in found and p not in allowed]
    assert not hits, (
        f"{qid}: scale-killer pattern(s) {hits} in plan:\n"
        f"{jplan.toString()[:800]}"
    )
    stale = [p for p in allowed if p not in found]
    assert not stale, (
        f"{qid}: allowlist entries {stale} no longer appear in the plan — "
        f"remove them so the allowlist only shrinks"
    )


def test_allowlist_and_intermediates_reference_live_ids():
    """Hygiene: every ALLOWLIST key and every SWEEP_INTERMEDIATES key must
    name a registered query — a renamed/removed id would otherwise leave a
    dead exemption (or a dead barrier-sweep) behind silently."""
    dead_allow = [q for q in ALLOWLIST if q not in REGISTRY]
    dead_inter = [q for q in SWEEP_INTERMEDIATES if q not in REGISTRY]
    assert not dead_allow, f"ALLOWLIST entries for unknown ids: {dead_allow}"
    assert not dead_inter, (
        f"SWEEP_INTERMEDIATES entries for unknown ids: {dead_inter}"
    )
