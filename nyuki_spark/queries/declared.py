"""The 61 declared queries (SURVEY.md §2 / Appendix A) — the t2 contract.

Transcribed verbatim from SURVEY.md Appendix A. Where one SQL body is given,
the identical text runs on both engines; ``engine=``/``oracle=`` pairs are
semantic twins in the two dialects (interval literals, array indexing,
explode, JSON access, STRING vs VARCHAR — see FIXTURES.md determinism rules).

Three queries run as DataFrame programs on the engine side:

- ``join_asof_emulated`` — the declared correlated form is the *semantic*
  contract (and the oracle), but Catalyst plans it as a nested-loop join
  (209 s at sf0.1); the engine executes the running-window rewrite
  (row-identical, 0.63 s — BASELINE.md note 1) via
  :mod:`nyuki_spark.operators.asof`.
- ``llm_knn_cosine`` / ``llm_label_centroids`` — Arrow pandas-UDF / JVM
  column programs (:mod:`nyuki_spark.operators.similarity`); their oracles
  are DuckDB list functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyuki_spark.catalog import load_table
from nyuki_spark.operators.asof import last_event_asof
from nyuki_spark.operators.similarity import knn_cosine, label_centroids
from nyuki_spark.queries.registry import register

# --------------------------------------------------------------------------
# 2.1 scans
# --------------------------------------------------------------------------

register(
    "scan_project",
    "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    category="scan",
)

register("scan_count", "SELECT COUNT(*) AS n FROM lineitem", category="scan")

# --------------------------------------------------------------------------
# 2.2 projection / filter / row transforms
# --------------------------------------------------------------------------

register(
    "project_expr",
    "SELECT o_orderkey, CAST(ROUND(o_totalprice * 1.1, 3) AS DOUBLE) AS gross\n"
    "FROM orders ORDER BY o_orderkey LIMIT 20",
    category="projection",
)

register(
    "filter_pred",
    "SELECT o_orderkey FROM orders\n"
    "WHERE o_totalprice > 150000 AND o_orderstatus = 'O' ORDER BY o_orderkey",
    category="filter",
)

register(
    "filter_in_between_like",
    "SELECT p_partkey FROM part WHERE p_type IN ('PROMO','ECONOMY')\n"
    "AND p_size BETWEEN 10 AND 40 AND p_name LIKE '%widget%' ORDER BY p_partkey",
    category="filter",
)

register(
    "filter_null_handling",
    "SELECT c_custkey, COALESCE(NULLIF(c_mktsegment,'BUILDING'),'N/A') AS seg\n"
    "FROM customer ORDER BY c_custkey LIMIT 25",
    category="filter",
)

# --------------------------------------------------------------------------
# 2.3 joins
# --------------------------------------------------------------------------

register(
    "join_inner_equi",
    "SELECT c.c_custkey, c.c_name, o.o_orderkey FROM customer c\n"
    "JOIN orders o ON c.c_custkey = o.o_custkey\n"
    "WHERE o.o_totalprice > 180000 ORDER BY c.c_custkey, o.o_orderkey",
    category="join",
)

register(
    "join_multiway",
    "SELECT r.r_name, n.n_name, COUNT(*) AS cnt,\n"
    "CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total\n"
    "FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey\n"
    "JOIN customer c ON c.c_nationkey = n.n_nationkey\n"
    "JOIN orders o ON o.o_custkey = c.c_custkey\n"
    "GROUP BY r.r_name, n.n_name ORDER BY r.r_name, n.n_name",
    category="join",
)

register(
    "join_left_outer",
    "SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders FROM customer c\n"
    "LEFT JOIN orders o ON o.o_custkey = c.c_custkey\n"
    "GROUP BY c.c_custkey ORDER BY c.c_custkey",
    category="join",
)

register(
    "join_full_outer",
    "SELECT COALESCE(a.k, b.k) AS k, a.na, b.nb FROM\n"
    "(SELECT c_nationkey AS k, COUNT(*) AS na FROM customer GROUP BY c_nationkey) a\n"
    "FULL OUTER JOIN\n"
    "(SELECT s_nationkey AS k, COUNT(*) AS nb FROM supplier GROUP BY s_nationkey) b\n"
    "ON a.k = b.k ORDER BY k",
    category="join",
)

register(
    "join_semi_exists",
    "SELECT p.p_partkey FROM part p WHERE EXISTS\n"
    "(SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 49)\n"
    "ORDER BY p.p_partkey",
    category="join",
)

register(
    "join_anti_not_exists",
    "SELECT c.c_custkey FROM customer c WHERE NOT EXISTS\n"
    "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) ORDER BY c.c_custkey",
    category="join",
)

register(
    "join_cross",
    "SELECT r.r_name, s.s_suppkey FROM region r CROSS JOIN supplier s\n"
    "ORDER BY r.r_name, s.s_suppkey",
    category="join",
)

register(
    "join_theta_range",
    "SELECT l.l_orderkey, l.l_linenumber, p.p_partkey\n"
    "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey\n"
    "AND l.l_extendedprice < p.p_retailprice * 0.5\n"
    "ORDER BY l.l_orderkey, l.l_linenumber, p.p_partkey",
    category="join",
)


def _asof_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    out = last_event_asof(
        events,
        key="user_id",
        ts="ts",
        ref_predicate=F.col("event_type") == "signup",
        probe_predicate=F.col("event_type") == "purchase",
        out_col="last_signup_ts",
    )
    return out.select("event_id", "last_signup_ts").orderBy("event_id")


register(
    "join_asof_emulated",
    engine_fn=_asof_fn,
    # Declared semantic contract; DuckDB runs it fine (44.8 ms at sf0.1).
    oracle=(
        "SELECT e.event_id,\n"
        "(SELECT MAX(s.ts) FROM events s WHERE s.user_id = e.user_id\n"
        " AND s.event_type = 'signup' AND s.ts <= e.ts) AS last_signup_ts\n"
        "FROM events e WHERE e.event_type = 'purchase' ORDER BY e.event_id"
    ),
    category="join",
    doc="engine side = running-window rewrite (operators/asof.py), 330x faster",
)

register(
    "join_interval_overlap",
    engine=(
        "SELECT a.event_id AS e1, b.event_id AS e2 FROM events a JOIN events b\n"
        "ON a.user_id = b.user_id AND b.ts > a.ts\n"
        "AND b.ts <= a.ts + INTERVAL '10' MINUTE AND a.event_id <> b.event_id\n"
        "WHERE a.event_type = 'click' ORDER BY e1, e2"
    ),
    oracle=(
        "SELECT a.event_id AS e1, b.event_id AS e2 FROM events a JOIN events b\n"
        "ON a.user_id = b.user_id AND b.ts > a.ts\n"
        "AND b.ts <= a.ts + INTERVAL 10 MINUTE AND a.event_id <> b.event_id\n"
        "WHERE a.event_type = 'click' ORDER BY e1, e2"
    ),
    category="join",
)

# --------------------------------------------------------------------------
# 2.4 aggregation
# --------------------------------------------------------------------------

register(
    "agg_basic",
    "SELECT l_returnflag, l_linestatus, COUNT(*) AS n,\n"
    "CAST(ROUND(SUM(l_quantity), 2) AS DOUBLE) AS sum_qty,\n"
    "CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS DOUBLE) AS revenue,\n"
    "CAST(ROUND(MIN(l_extendedprice), 2) AS DOUBLE) AS min_p,\n"
    "CAST(ROUND(MAX(l_extendedprice), 2) AS DOUBLE) AS max_p\n"
    "FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus",
    category="aggregate",
)

register(
    "agg_avg_decimal",
    "SELECT o_orderpriority, CAST(CAST(AVG(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS avg_price\n"
    "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority",
    category="aggregate",
)

register(
    "agg_count_distinct",
    "SELECT event_type, COUNT(DISTINCT user_id) AS users FROM events\n"
    "GROUP BY event_type ORDER BY event_type",
    category="aggregate",
)

register(
    "agg_having",
    "SELECT l_partkey, COUNT(*) AS n FROM lineitem GROUP BY l_partkey\n"
    "HAVING COUNT(*) >= 40 ORDER BY l_partkey",
    category="aggregate",
)

register(
    "agg_distinct_rows",
    "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders\n"
    "ORDER BY o_orderstatus, o_orderpriority",
    category="aggregate",
)

register(
    "agg_rollup",
    "SELECT c_mktsegment, o_orderstatus, COUNT(*) AS n FROM orders o\n"
    "JOIN customer c ON c.c_custkey = o.o_custkey\n"
    "GROUP BY ROLLUP (c_mktsegment, o_orderstatus)\n"
    "ORDER BY c_mktsegment NULLS FIRST, o_orderstatus NULLS FIRST",
    category="aggregate",
)

register(
    "agg_cube",
    "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n FROM orders\n"
    "GROUP BY CUBE (o_orderstatus, o_orderpriority)\n"
    "ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST",
    category="aggregate",
)

register(
    "agg_grouping_sets",
    "SELECT c_mktsegment, c_nationkey, COUNT(*) AS n FROM customer\n"
    "GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))\n"
    "ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST",
    category="aggregate",
)

register(
    "agg_filter_case",
    "SELECT user_id, CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,\n"
    "CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors\n"
    "FROM events GROUP BY user_id ORDER BY user_id",
    category="aggregate",
)

register(
    "agg_stats",
    "SELECT event_type, CAST(ROUND(STDDEV_SAMP(value), 4) AS DOUBLE) AS sd,\n"
    "CAST(ROUND(VAR_SAMP(value), 4) AS DOUBLE) AS var\n"
    "FROM events GROUP BY event_type ORDER BY event_type",
    category="aggregate",
)

register(
    "agg_percentile",
    "SELECT CAST(ROUND(MEDIAN(l_quantity), 2) AS DOUBLE) AS med FROM lineitem",
    category="aggregate",
)

# --------------------------------------------------------------------------
# 2.5 window functions
# --------------------------------------------------------------------------

def _win_rank_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-adaptive execution of the declared global-window SQL (the oracle).

    Two plans, chosen by Catalyst's input-size estimate (no job runs):

    - **small input** (fits one 32 MB rank bucket): the plain windowed
      plan. One WindowExec over a broadcast-sized input is the FASTEST
      plan there — the r3 bench showed the decomposition paying 2.3x pure
      stage-latency overhead at sf0.1 for rows that trivially fit one task.
    - **at scale**: the naive plan moves ALL rows into one WindowExec
      partition and dies; ROW_NUMBER instead runs via range-bucket + local
      rank + offset merge, RANK/DENSE_RANK over the low-cardinality
      segment via a broadcast distinct-key table, and NTILE as arithmetic
      on (rn, count) — every stage balanced, nothing single-partition over
      data rows.

    Both plans compute identical values (the oracle checks whichever ran);
    the switch is the engine making the cost-based choice a warehouse
    optimizer would.
    """
    from nyuki_spark.operators.rank import (
        _auto_buckets,
        global_row_number,
        key_rank,
        ntile_from_rn,
        one_group,
    )

    cust = load_table(spark, sf_dir, "customer")
    if _auto_buckets(cust) == 1:
        from pyspark.sql import Window

        # one_group partition = deliberate single-group window on a bounded
        # input (house style: declares the smallness is intentional; a
        # foldable lit(0) would be stripped and WindowExec would warn).
        w0 = Window.partitionBy(one_group("c_custkey"))
        bal = w0.orderBy(F.desc("c_acctbal"), "c_custkey")
        seg = w0.orderBy("c_mktsegment")
        return (
            cust.select(
                "c_custkey",
                "c_acctbal",
                F.row_number().over(bal).alias("rn"),
                F.rank().over(seg).alias("rk"),
                F.dense_rank().over(seg).alias("drk"),
                F.ntile(4).over(bal).alias("quartile"),
            )
            .orderBy("c_custkey")
        )
    out = global_row_number(
        cust,
        "c_acctbal",
        tiebreak_cols=["c_custkey"],
        ascending=False,
        out="rn",
        attach_total="_tot",  # rides the k-row bucket table: no count() job
    )
    out = key_rank(
        out, "c_mktsegment", rank_out="rk", dense_out="drk", stats_df=cust
    )
    out = out.withColumn("quartile", ntile_from_rn(F.col("rn"), F.col("_tot"), 4))
    return out.select("c_custkey", "c_acctbal", "rn", "rk", "drk", "quartile").orderBy(
        "c_custkey"
    )


register(
    "win_rank",
    engine_fn=_win_rank_fn,
    oracle=(
        "SELECT c_custkey, c_acctbal,\n"
        "ROW_NUMBER() OVER (ORDER BY c_acctbal DESC, c_custkey) AS rn,\n"
        "RANK() OVER (ORDER BY c_mktsegment) AS rk,\n"
        "DENSE_RANK() OVER (ORDER BY c_mktsegment) AS drk,\n"
        "NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS quartile\n"
        "FROM customer ORDER BY c_custkey"
    ),
    category="window",
)

register(
    "win_lag_lead",
    "SELECT event_id, user_id,\n"
    "LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,\n"
    "LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type\n"
    "FROM events ORDER BY event_id",
    category="window",
)

register(
    "win_running_frame",
    "SELECT o_orderkey, o_custkey,\n"
    "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER\n"
    "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey\n"
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total\n"
    "FROM orders ORDER BY o_orderkey",
    category="window",
)

register(
    "win_first_last",
    "SELECT event_id, user_id,\n"
    "FIRST_VALUE(event_type) OVER w AS first_type,\n"
    "LAST_VALUE(event_type) OVER w AS last_type\n"
    "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id\n"
    "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) ORDER BY event_id",
    category="window",
)

register(
    "win_topk_per_group",
    "SELECT * FROM (SELECT o_custkey, o_orderkey,\n"
    "ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn\n"
    "FROM orders) t WHERE rn <= 2 ORDER BY o_custkey, rn",
    category="window",
)

# --------------------------------------------------------------------------
# 2.6 sort / limit / set ops
# --------------------------------------------------------------------------

register(
    "sort_multikey_nulls",
    "SELECT o_orderkey, o_orderstatus FROM orders\n"
    "ORDER BY o_orderstatus DESC, o_totalprice ASC, o_orderkey LIMIT 50",
    category="sort",
)

register(
    "topk_global",
    "SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS p FROM orders\n"
    "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    category="sort",
)

register(
    "offset_limit",
    "SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 10 OFFSET 20",
    category="sort",
)

register(
    "set_union_all",
    "SELECT c_nationkey AS k FROM customer UNION ALL SELECT s_nationkey FROM supplier\n"
    "ORDER BY k LIMIT 40",
    category="setop",
)

register(
    "set_union_distinct",
    "SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey FROM supplier ORDER BY k",
    category="setop",
)

register(
    "set_intersect",
    "SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier ORDER BY k",
    category="setop",
)

register(
    "set_except",
    "SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier ORDER BY k",
    category="setop",
)

# --------------------------------------------------------------------------
# 2.7 scalar functions
# --------------------------------------------------------------------------

_STR_FUNCS = (
    "SELECT c_custkey, UPPER(c_name) AS u, LOWER(c_mktsegment) AS l,\n"
    "LENGTH(c_name) AS len, SUBSTR(c_name, 1, 8) AS pre,\n"
    "TRIM(CONCAT('  ', c_name, '  ')) AS t, REPLACE(c_name, 'Customer', 'Cust') AS rep,\n"
    "LPAD(CAST(c_custkey AS {str_t}), 6, '0') AS padded\n"
    "FROM customer ORDER BY c_custkey LIMIT 20"
)

register(
    "str_funcs",
    engine=_STR_FUNCS.format(str_t="STRING"),
    oracle=_STR_FUNCS.format(str_t="VARCHAR"),
    category="scalar-string",
)

register(
    "str_regexp",
    "SELECT c_custkey, REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS num,\n"
    "REGEXP_REPLACE(c_name, '0+', '0') AS squashed\n"
    "FROM customer ORDER BY c_custkey LIMIT 20",
    category="scalar-string",
)

register(
    "str_split_part",
    "SELECT p_partkey, SPLIT_PART(p_name, ' ', 1) AS adj, SPLIT_PART(p_name, ' ', 2) AS noun\n"
    "FROM part ORDER BY p_partkey LIMIT 20",
    category="scalar-string",
)

register(
    "date_funcs",
    "SELECT o_orderkey, EXTRACT(YEAR FROM o_orderdate) AS y,\n"
    "EXTRACT(MONTH FROM o_orderdate) AS m, EXTRACT(DAY FROM o_orderdate) AS d,\n"
    "CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS mstart\n"
    "FROM orders ORDER BY o_orderkey LIMIT 20",
    category="scalar-date",
)

_DATE_ARITH = (
    "SELECT event_id, CAST(ts + INTERVAL {day} AS DATE) AS next_day,\n"
    "CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS hr\n"
    "FROM events ORDER BY event_id LIMIT 20"
)

register(
    "date_arith",
    engine=_DATE_ARITH.format(day="'1' DAY"),
    oracle=_DATE_ARITH.format(day="1 DAY"),
    category="scalar-date",
)

register(
    "math_funcs",
    "SELECT p_partkey, ABS(p_size - 25) AS a, CAST(ROUND(SQRT(p_size), 4) AS DOUBLE) AS sq,\n"
    "CAST(FLOOR(p_retailprice) AS BIGINT) AS fl, CAST(CEIL(p_retailprice) AS BIGINT) AS ce,\n"
    "MOD(p_partkey, 7) AS m, CAST(POWER(p_size, 2) AS BIGINT) AS p2,\n"
    "CAST(ROUND(LN(p_size + 1), 4) AS DOUBLE) AS lg\n"
    "FROM part ORDER BY p_partkey LIMIT 20",
    category="scalar-math",
)

register(
    "cond_funcs",
    "SELECT o_orderkey, CASE WHEN o_totalprice > 150000 THEN 'big'\n"
    "WHEN o_totalprice > 50000 THEN 'mid' ELSE 'small' END AS bucket,\n"
    "GREATEST(o_totalprice, 100000) > 100000 AS gt, LEAST(o_orderkey, 10) AS lt\n"
    "FROM orders ORDER BY o_orderkey LIMIT 20",
    category="scalar-cond",
)

register(
    "array_len_elem",
    # Spark arrays are 0-indexed with SIZE(); DuckDB 1-indexed with LEN().
    engine=(
        "SELECT vec_id, SIZE(embedding) AS dim,\n"
        "CAST(ROUND(embedding[0], 4) AS DOUBLE) AS e0\n"
        "FROM embeddings ORDER BY vec_id LIMIT 20"
    ),
    oracle=(
        "SELECT vec_id, LEN(embedding) AS dim,\n"
        "CAST(ROUND(embedding[1], 4) AS DOUBLE) AS e0\n"
        "FROM embeddings ORDER BY vec_id LIMIT 20"
    ),
    category="scalar-array",
)

register(
    "array_explode",
    engine=(
        "SELECT t.word, COUNT(*) AS n FROM documents\n"
        "LATERAL VIEW EXPLODE(SPLIT(text, ' ')) t AS word\n"
        "GROUP BY t.word ORDER BY n DESC, t.word LIMIT 15"
    ),
    oracle=(
        "SELECT u.word, COUNT(*) AS n FROM documents,\n"
        "UNNEST(STRING_SPLIT(text, ' ')) AS u(word)\n"
        "GROUP BY u.word ORDER BY n DESC, u.word LIMIT 15"
    ),
    category="scalar-array",
)

register(
    "json_extract",
    engine=(
        "SELECT event_id, CAST(GET_JSON_OBJECT(props, '$.k') AS INT) AS k\n"
        "FROM events ORDER BY event_id LIMIT 25"
    ),
    oracle=(
        "SELECT event_id, CAST(props->>'$.k' AS INT) AS k\n"
        "FROM events ORDER BY event_id LIMIT 25"
    ),
    category="scalar-json",
)

# --------------------------------------------------------------------------
# 2.8 subqueries / CTE
# --------------------------------------------------------------------------

register(
    "subq_scalar",
    "SELECT o_orderkey FROM orders\n"
    "WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.8 FROM orders) ORDER BY o_orderkey",
    category="subquery",
)

register(
    "subq_correlated",
    "SELECT c.c_custkey FROM customer c WHERE c.c_acctbal >\n"
    "(SELECT AVG(c2.c_acctbal) FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)\n"
    "ORDER BY c.c_custkey",
    category="subquery",
)

register(
    "subq_in",
    "SELECT p_partkey FROM part WHERE p_partkey IN\n"
    "(SELECT l_partkey FROM lineitem WHERE l_discount >= 0.09) ORDER BY p_partkey",
    category="subquery",
)

register(
    "cte_basic",
    "WITH big AS (SELECT o_custkey, COUNT(*) AS n FROM orders\n"
    "WHERE o_totalprice > 100000 GROUP BY o_custkey)\n"
    "SELECT c.c_name, b.n FROM big b JOIN customer c ON c.c_custkey = b.o_custkey\n"
    "ORDER BY c.c_name",
    category="subquery",
)

# --------------------------------------------------------------------------
# 2.9 streaming semantics, batch-checkable form
# (live Structured Streaming counterparts live in nyuki_spark.streaming and
#  are registered as *_live in queries/extensions.py)
# --------------------------------------------------------------------------

register(
    "stream_tumbling",
    "SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS win_start, event_type, COUNT(*) AS n,\n"
    "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total\n"
    "FROM events GROUP BY 1, 2 ORDER BY 1, 2",
    category="streaming",
)

_SLIDING = (
    "SELECT event_id, COUNT(*) OVER\n"
    "(PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)\n"
    "RANGE BETWEEN INTERVAL {m30} PRECEDING AND CURRENT ROW) AS cnt_30m\n"
    "FROM events ORDER BY event_id"
)

register(
    "stream_sliding_emulated",
    engine=_SLIDING.format(m30="'30' MINUTE"),
    oracle=_SLIDING.format(m30="30 MINUTE"),
    category="streaming",
)

_SESSION = (
    "WITH marked AS (SELECT user_id, ts, event_id, CASE WHEN ts >\n"
    "LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) + INTERVAL {m30}\n"
    "OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1 ELSE 0 END AS new_sess\n"
    "FROM events),\n"
    "sess AS (SELECT user_id, ts, event_id, SUM(new_sess) OVER\n"
    "(PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess_id_raw FROM marked)\n"
    "SELECT user_id, CAST(sess_id_raw AS BIGINT) AS sess_id, COUNT(*) AS n_events, MIN(ts) AS sess_start\n"
    "FROM sess GROUP BY user_id, sess_id_raw ORDER BY user_id, sess_id"
)

register(
    "stream_session_gaps",
    engine=_SESSION.format(m30="'30' MINUTE"),
    oracle=_SESSION.format(m30="30 MINUTE"),
    category="streaming",
)

register(
    "stream_dedup_exact",
    "SELECT user_id, event_type, MIN(event_id) AS first_event FROM events\n"
    "GROUP BY user_id, event_type ORDER BY user_id, event_type",
    category="streaming",
)

# --------------------------------------------------------------------------
# 2.10 LLM-data-pipeline operators
# --------------------------------------------------------------------------

register(
    "llm_exact_dedup",
    "SELECT MIN(doc_id) AS keep_id, COUNT(*) AS dupes FROM documents\n"
    "GROUP BY text HAVING COUNT(*) > 1 ORDER BY keep_id",
    category="llm-pipeline",
)

register(
    "llm_text_stats",
    "SELECT lang, COUNT(*) AS docs, CAST(SUM(n_chars) AS BIGINT) AS chars,\n"
    "CAST(ROUND(AVG(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1), 4) AS DOUBLE) AS avg_words\n"
    "FROM documents GROUP BY lang ORDER BY lang",
    category="llm-pipeline",
)


def _knn_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    return knn_cosine(emb.where(F.col("vec_id") != 0), list(qvec), k=10)


register(
    "llm_knn_cosine",
    engine_fn=_knn_fn,
    oracle=(
        "WITH qv AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0)\n"
        "SELECT e.vec_id, CAST(ROUND(LIST_COSINE_SIMILARITY(CAST(e.embedding AS DOUBLE[]), qv.v), 4) AS DOUBLE) AS sim\n"
        "FROM embeddings e, qv WHERE e.vec_id <> 0 ORDER BY sim DESC, e.vec_id LIMIT 10"
    ),
    category="llm-pipeline",
    doc="engine side = Arrow pandas-UDF brute-force kNN (operators/similarity.py)",
)


def _centroids_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = label_centroids(emb, dims=[0])
    return out.select("label", "n", F.col("c0"))


register(
    "llm_label_centroids",
    engine_fn=_centroids_fn,
    oracle=(
        "SELECT label, COUNT(*) AS n, CAST(ROUND(AVG(embedding[1]), 4) AS DOUBLE) AS c0\n"
        "FROM embeddings GROUP BY label ORDER BY label"
    ),
    category="llm-pipeline",
    doc="engine side = JVM column program (operators/similarity.py label_centroids)",
)
