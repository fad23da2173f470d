"""Reference-semantics queries: factory rules, condition DSL, pipeline spec.

These check the nyuki semantics layer against the oracle: the rule chain /
condition DSL / spec compiler produce Column programs whose results must
equal hand-written DuckDB SQL with the same semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyuki_spark.catalog import load_table
from nyuki_spark.functions.evaluate import compile_condition
from nyuki_spark.functions.transform import Extract, Lookup, RuleChain, Set, Sub
from nyuki_spark.plans.spec import compile_pipeline
from nyuki_spark.queries.registry import register


# -- factory rule chain ------------------------------------------------------

_CHAIN = RuleChain(
    (
        Extract("k", r'"k":\s*([0-9]+)', group=1, src="props"),
        Sub("event_type", "error", "err"),
        Set("origin", "bus"),
        Lookup("event_type", (("purchase", "buy"), ("click", "tap"))),
    )
)


def _rule_chain_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        _CHAIN(events)
        .select("event_id", "k", "event_type", "origin")
        .orderBy("event_id")
        .limit(50)
    )


register(
    "sem_rule_chain",
    engine_fn=_rule_chain_fn,
    oracle=(
        "SELECT event_id,\n"
        "REGEXP_EXTRACT(props, '\"k\":\\s*([0-9]+)', 1) AS k,\n"
        "CASE REGEXP_REPLACE(event_type, 'error', 'err')\n"
        "  WHEN 'purchase' THEN 'buy' WHEN 'click' THEN 'tap'\n"
        "  ELSE REGEXP_REPLACE(event_type, 'error', 'err') END AS event_type,\n"
        "'bus' AS origin\n"
        "FROM events ORDER BY event_id LIMIT 50"
    ),
    category="semantics",
    suite="extension",
    doc="extract/sub/set/lookup rule chain == hand-written SQL",
)


# -- condition DSL -----------------------------------------------------------

_COND = "value > 100.0 and event_type in ['purchase', 'click'] and not (user_id % 2 == 0)"


def _cond_dsl_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.where(compile_condition(_COND))
        .select("event_id", "user_id")
        .orderBy("event_id")
    )


register(
    "sem_cond_dsl",
    engine_fn=_cond_dsl_fn,
    oracle=(
        "SELECT event_id, user_id FROM events\n"
        "WHERE value > 100.0 AND event_type IN ('purchase', 'click')\n"
        "AND NOT (user_id % 2 = 0) ORDER BY event_id"
    ),
    category="semantics",
    suite="extension",
    doc="safe condition DSL compiled to a pushed-down predicate",
)


# -- pipeline spec (workflow template equivalent) ----------------------------

_SPEC = {
    "name": "enrich-purchases",
    "version": 1,
    "steps": [
        {"op": "filter", "condition": "event_type == 'purchase'"},
        {"op": "extract", "field": "k", "src": "props", "pattern": '"k":\\s*([0-9]+)'},
        {
            "op": "branch",
            "field": "size",
            "cases": [
                {"condition": "value > 400", "value": "big"},
                {"condition": "value > 150", "value": "mid"},
            ],
            "default": "small",
        },
        {"op": "set", "field": "route", "value": "billing"},
        {"op": "select", "fields": ["event_id", "k", "size", "route"]},
    ],
}


def _spec_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return compile_pipeline(_SPEC)(events).orderBy("event_id")


register(
    "sem_pipeline_spec",
    engine_fn=_spec_fn,
    oracle=(
        "SELECT event_id, REGEXP_EXTRACT(props, '\"k\":\\s*([0-9]+)', 1) AS k,\n"
        "CASE WHEN value > 400 THEN 'big' WHEN value > 150 THEN 'mid'\n"
        "ELSE 'small' END AS size, 'billing' AS route\n"
        "FROM events WHERE event_type = 'purchase' ORDER BY event_id"
    ),
    category="semantics",
    suite="extension",
    doc="JSON workflow-template spec compiled to one fused DataFrame program",
)


# -- sub-workflow invocation (round 8) ----------------------------------------

_SUB_TEMPLATES = {
    "enrich": {
        "steps": [
            {"op": "set", "field": "route", "value": "billing"},
            {
                "op": "branch",
                "field": "vtier",
                "cases": [{"condition": "value >= 50", "value": "high"}],
                "default": "low",
            },
        ]
    },
    "main": {
        "steps": [
            {"op": "filter", "condition": "event_type == 'purchase'"},
            {"op": "apply", "template": "enrich"},
            {"op": "select", "fields": ["event_id", "route", "vtier"]},
        ]
    },
}


def _subflow_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-workflow invocation (the reference chains workflows by name:
    a parent template's step instantiates a child template): the parent
    spec's ``apply`` step splices the stored 'enrich' template's
    compiled steps in place, so the WHOLE chain fuses into one
    DataFrame program — no per-sub-workflow materialization, which is
    the Spark-side win over the reference's per-instance execution.
    Upgrades the sub-workflow surface from behavioral-smoke to oracle
    tier; cycle specs are a compile-time SpecError
    (tests/test_template_api.py)."""
    events = load_table(spark, sf_dir, "events")
    pipe = compile_pipeline(_SUB_TEMPLATES["main"], templates=_SUB_TEMPLATES)
    return pipe(events).orderBy("event_id")


register(
    "sem_subflow",
    engine_fn=_subflow_fn,
    oracle=(
        "SELECT event_id, 'billing' AS route,\n"
        "  CASE WHEN value >= 50 THEN 'high' ELSE 'low' END AS vtier\n"
        "FROM events WHERE event_type = 'purchase' ORDER BY event_id"
    ),
    category="semantics",
    suite="extension",
    doc=(
        "sub-workflow invocation: parent spec's apply step splices a "
        "named child template at compile time — one fused DataFrame "
        "program, cycle-guarded"
    ),
)


# -- declarative CEP pattern spec (round 12) ----------------------------------

_CEP_SPEC = {
    "name": "engage-funnel",
    "version": 1,
    "key": "user_id",
    "ts": "ts",
    "type": "event_type",
    "within_us": 3 * 86_400_000_000,
    "steps": [
        {"types": ["signup"]},
        {"types": ["view", "click"], "min": 2, "max": 6},
        {"types": ["purchase"]},
    ],
    "absent": "error",
}


def _cep_spec_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative CEP (r11 verdict Next #3 — the nyuki workflow-template
    shape for the one surface that still required Python): the pattern
    ``signup -> (view|click){2,6} -> purchase, NO error, 3-day window``
    is a JSON document (plans/cep.py), validated like a workflow
    template and compiled HERE to the batch execution form — anchor +
    order-statistic chain + count veto + absence anti-join as one
    DataFrame program (k key-partitioned joins + ranks; the 100 TB
    backfill shape). The SAME spec object compiles to the live
    funnel_match operator via ``.stream()`` — spec-vs-direct-call and
    batch-vs-stream parity are asserted in tests/test_cep_spec.py, and
    a hypothesis property test drives random specs through both the
    compiler and a pure-Python reference fold."""
    from nyuki_spark.plans.cep import compile_cep_pattern

    events = load_table(spark, sf_dir, "events")
    pat = compile_cep_pattern(_CEP_SPEC)
    return (
        pat.batch(events)
        .select(
            "user_id",
            F.col("step1_ts").alias("signup_ts"),
            F.col("step2_ts").alias("engage2_ts"),
            F.col("step3_ts").alias("purchase_ts"),
        )
        .orderBy("user_id")
    )


register(
    "sem_cep_spec",
    engine_fn=_cep_spec_fn,
    oracle=(
        "WITH a AS (SELECT user_id, MIN(ts) AS anchor FROM events\n"
        "  WHERE event_type = 'signup' GROUP BY 1),\n"
        "m AS (SELECT user_id, ts FROM (\n"
        "  SELECT e.user_id, e.ts,\n"
        "    ROW_NUMBER() OVER (PARTITION BY e.user_id ORDER BY e.ts)"
        " AS rn,\n"
        "    COUNT(*) OVER (PARTITION BY e.user_id) AS cnt\n"
        "  FROM events e JOIN a ON a.user_id = e.user_id\n"
        "  WHERE e.event_type IN ('view', 'click') AND e.ts > a.anchor\n"
        "    AND e.ts <= a.anchor + INTERVAL 3 DAY) t\n"
        "  WHERE rn = 2 AND cnt <= 6),\n"
        "p AS (SELECT e.user_id, MIN(e.ts) AS p FROM events e\n"
        "  JOIN m ON m.user_id = e.user_id\n"
        "  JOIN a ON a.user_id = e.user_id\n"
        "  WHERE e.event_type = 'purchase' AND e.ts > m.ts\n"
        "    AND e.ts <= a.anchor + INTERVAL 3 DAY GROUP BY 1)\n"
        "SELECT a.user_id, CAST(a.anchor AS TIMESTAMP) AS signup_ts,\n"
        "  CAST(m.ts AS TIMESTAMP) AS engage2_ts,\n"
        "  CAST(p.p AS TIMESTAMP) AS purchase_ts\n"
        "FROM a JOIN m ON m.user_id = a.user_id\n"
        "JOIN p ON p.user_id = a.user_id\n"
        "WHERE NOT EXISTS (SELECT 1 FROM events x\n"
        "  WHERE x.user_id = a.user_id AND x.event_type = 'error'\n"
        "    AND x.ts > a.anchor AND x.ts <= a.anchor + INTERVAL 3 DAY)\n"
        "ORDER BY a.user_id"
    ),
    category="semantics",
    suite="extension",
    doc=(
        "declarative CEP pattern spec (JSON: signup -> (view|click){2,6} "
        "-> purchase, no error, 3-day window) compiled to the BATCH "
        "DataFrame form — anchor + order-statistic chain + count veto + "
        "absence anti-join; same spec compiles to the live funnel_match "
        "via .stream() (parity in tests/test_cep_spec.py)"
    ),
)
