"""Round-5 analytics extensions: distributed linear algebra, graph
structure, and event attribution.

Same contract as every other registry module: each query has a Spark
engine side built for the 100 TB plan shape and a DuckDB oracle twin
that computes the identical values, so the driver's hash comparison is
the correctness gate. FP-order-dependent sums are pinned with explicit
rounds on BOTH sides (the operators/kmeans.py discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyuki_spark.catalog import load_table
from nyuki_spark.operators.graph import triangle_stats
from nyuki_spark.operators.linalg import gram_upper
from nyuki_spark.queries.registry import register


# -- distributed Gram / covariance matrix ------------------------------------


def _gram_covariance_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space second-moment (Gram) matrix — the input to PCA
    whitening, covariance drift checks, and ZCA decorrelation in
    training-data pipelines.

    Plan: the treeAggregate shape. Each Arrow batch computes its partial
    64x64 Gram with one BLAS matmul (``V.T @ V``) inside ``mapInPandas``
    and emits it as 4096 narrow (i, j, partial) rows; the only shuffle
    is the 4096-key partial-sum aggregate, whose volume is
    O(partitions x d^2), INDEPENDENT of row count. At 100 TB the model
    side stays a constant few-MB reduce while the scan stays map-only —
    the same reason count-style aggregates scale. A per-row explode
    (rows x d^2) would shuffle 4096x the data volume; a driver-side
    collect would not be distributed at all.

    FP: partials are float64 BLAS sums; cross-engine order differences
    are ~1e-13 relative, pinned by the 6-dp round on both sides. The
    mechanics live in operators/linalg.py (gram_upper), where the
    partitioning-invariance property test drives them directly.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("v")
    )
    return gram_upper(emb, dims=64)


register(
    "llm_gram_covariance",
    engine_fn=_gram_covariance_fn,
    oracle=(
        "SELECT i.i AS i, j.j AS j,\n"
        "  CAST(ROUND(SUM(v[i.i] * v[j.j]), 6) AS DOUBLE) AS gram\n"
        "FROM (SELECT embedding::DOUBLE[] AS v FROM embeddings),\n"
        "  UNNEST(GENERATE_SERIES(1, 64)) i(i),\n"
        "  UNNEST(GENERATE_SERIES(1, 64)) j(j)\n"
        "WHERE i.i <= j.j GROUP BY i.i, j.j ORDER BY i, j"
    ),
    category="llm-similarity",
    suite="extension",
    doc=(
        "distributed 64x64 Gram matrix for PCA/whitening: per-batch BLAS "
        "partial via mapInPandas, one O(d^2)-key shuffle independent of "
        "row count (the treeAggregate shape)"
    ),
)


# -- degree-ordered triangle counting ----------------------------------------


def _triangles_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global graph-structure statistics — node/edge/wedge/triangle
    counts and the global clustering coefficient — over the strong-tie
    supplier backbone (supplier pairs sharing >= the 95th-percentile
    number of orders).

    Two classic scale techniques, both visible in the plan:

    - **Backbone thresholding**: raw co-order pair counts are ONE
      partial-agg shuffle; the exact-percentile threshold is a 1-row
      broadcast. Co-occurrence graphs densify with data volume (at
      sf0.01 the raw supplier graph is already complete), so counting
      triangles on the raw graph is O(n^3); thresholding first keeps
      the triangle join proportional to strong edges only.
    - **Degree-ordered orientation** (the MapReduce triangle-counting
      trick, Suri & Vassilvitskii WWW'11): each undirected edge is
      oriented from the lower-(deg, node) endpoint to the higher, so
      every triangle is counted exactly once AND the wedge join fans
      out from each node in at most out-degree pairs — bounded by
      O(sqrt(|E|)) per node regardless of hub skew, where orienting by
      raw id would square the hub degree.

    Wedges join on the shared source; the closing edge is a semi-join
    back to the oriented edge set. All joins are key-partitioned
    equi-joins over narrow (int, int) rows.
    """
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    a = lineitem.alias("a")
    b = lineitem.alias("b")
    pair_cnt = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .groupBy(
            F.col("a.l_suppkey").alias("u"), F.col("b.l_suppkey").alias("v")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    thresh = pair_cnt.agg(
        F.expr("percentile(cnt, 0.95)").alias("t")
    )  # 1-row exact percentile, broadcast below
    backbone = (
        pair_cnt.crossJoin(F.broadcast(thresh))
        .where(F.col("cnt") >= F.col("t"))
        .select("u", "v")
    )
    n_nodes, n_edges, n_wedges, n_tri = triangle_stats(backbone)
    cc = round(3.0 * n_tri / n_wedges, 6) if n_wedges else 0.0
    return spark.createDataFrame(
        [(n_nodes, n_edges, n_wedges, n_tri, cc)],
        "n_nodes long, n_edges long, n_wedges long, n_triangles long, "
        "clustering double",
    )


register(
    "net_triangles",
    engine_fn=_triangles_fn,
    oracle=(
        "WITH pc AS (\n"
        "  SELECT a.l_suppkey AS u, b.l_suppkey AS v, COUNT(*) AS cnt\n"
        "  FROM lineitem a JOIN lineitem b\n"
        "    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey\n"
        "  GROUP BY 1, 2),\n"
        "t AS (SELECT QUANTILE_CONT(cnt, 0.95) AS t FROM pc),\n"
        "bb AS (SELECT u, v FROM pc CROSS JOIN t WHERE cnt >= t.t),\n"
        "und AS (SELECT u, v FROM bb UNION ALL SELECT v, u FROM bb),\n"
        "d AS (SELECT u, COUNT(*) AS deg FROM und GROUP BY u),\n"
        "r AS (SELECT u, ROW_NUMBER() OVER (ORDER BY deg, u) AS ord FROM d),\n"
        "o AS (SELECT ru.ord AS lo, rv.ord AS hi FROM und\n"
        "  JOIN r ru ON und.u = ru.u JOIN r rv ON und.v = rv.u\n"
        "  WHERE ru.ord < rv.ord),\n"
        "w AS (SELECT e1.hi AS lo, e2.hi AS hi FROM o e1 JOIN o e2\n"
        "  ON e1.lo = e2.lo AND e1.hi < e2.hi),\n"
        "tri AS (SELECT * FROM w WHERE EXISTS\n"
        "  (SELECT 1 FROM o WHERE o.lo = w.lo AND o.hi = w.hi))\n"
        "SELECT (SELECT COUNT(*) FROM d) AS n_nodes,\n"
        "  (SELECT COUNT(*) FROM bb) AS n_edges,\n"
        "  (SELECT COUNT(*) FROM w) AS n_wedges,\n"
        "  (SELECT COUNT(*) FROM tri) AS n_triangles,\n"
        "  CAST(CASE WHEN (SELECT COUNT(*) FROM w) = 0 THEN 0\n"
        "    ELSE ROUND(3.0 * (SELECT COUNT(*) FROM tri)\n"
        "      / (SELECT COUNT(*) FROM w), 6) END AS DOUBLE) AS clustering"
    ),
    category="graph",
    suite="extension",
    doc=(
        "strong-tie backbone (95th-pct co-order count) + degree-ordered "
        "triangle counting (Suri-Vassilvitskii orientation bounds wedge "
        "fanout under hub skew); global clustering coefficient"
    ),
)


# -- grouped OLS regression ---------------------------------------------------

register(
    "stat_regression",
    engine=(
        "SELECT event_type,\n"
        "  CAST(COUNT(*) AS BIGINT) AS n,\n"
        "  CAST(ROUND(REGR_SLOPE(value, HOUR(ts)), 6) AS DOUBLE)"
        " AS slope,\n"
        "  CAST(ROUND(REGR_INTERCEPT(value, HOUR(ts)), 6) AS DOUBLE)"
        " AS intercept,\n"
        "  CAST(ROUND(REGR_R2(value, HOUR(ts)), 6) AS DOUBLE) AS r2\n"
        "FROM events WHERE value IS NOT NULL\n"
        "GROUP BY event_type ORDER BY event_type"
    ),
    oracle=(
        "SELECT event_type,\n"
        "  COUNT(*) AS n,\n"
        "  CAST(ROUND(REGR_SLOPE(value, HOUR(ts)), 6) AS DOUBLE)"
        " AS slope,\n"
        "  CAST(ROUND(REGR_INTERCEPT(value, HOUR(ts)), 6) AS DOUBLE)"
        " AS intercept,\n"
        "  CAST(ROUND(REGR_R2(value, HOUR(ts)), 6) AS DOUBLE) AS r2\n"
        "FROM events WHERE value IS NOT NULL\n"
        "GROUP BY event_type ORDER BY event_type"
    ),
    category="statistics",
    suite="extension",
    doc=(
        "per-group closed-form OLS (value ~ hour-of-day): REGR_SLOPE/"
        "INTERCEPT/R2 are single-pass partial-aggregable moments — one "
        "key-partitioned shuffle, no iterative solver"
    ),
)


# -- last-touch attribution ---------------------------------------------------


def _attr_last_touch_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-style last-touch attribution: each purchase is credited
    to the user's most recent preceding click/view within 7 days, else
    'direct'.

    Plan: ONE shuffle. Touches and purchases stay in the same scan;
    a single user-partitioned window ordered by (ts, kind, event_id)
    carries the last non-null touch forward (``F.last(ignorenulls)``),
    so the as-of lookup costs a sort within each user partition instead
    of a range join. Ties at identical timestamps order touches before
    purchases, then by event_id — deterministic on both engines. The
    channel rollup is a 3-key partial aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.where(
        F.col("event_type").isin("click", "view", "purchase")
    ).select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.when(F.col("event_type") != "purchase", F.col("event_type")).alias(
            "touch_type"
        ),
        F.when(F.col("event_type") != "purchase", F.col("ts")).alias(
            "touch_ts"
        ),
        (F.col("event_type") == "purchase").cast("int").alias("is_purchase"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    attributed = (
        tagged.withColumn(
            "last_touch", F.last("touch_type", ignorenulls=True).over(w)
        )
        .withColumn("last_ts", F.last("touch_ts", ignorenulls=True).over(w))
        .where(F.col("event_type") == "purchase")
        .select(
            F.when(
                F.col("last_ts")
                >= F.col("ts") - F.expr("INTERVAL 7 DAYS"),
                F.col("last_touch"),
            )
            .otherwise(F.lit("direct"))
            .alias("channel"),
            "value",
        )
    )
    return (
        attributed.groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 2).cast("double").alias("revenue"),
        )
        .orderBy("channel")
    )


register(
    "ts_attr_last_touch",
    engine_fn=_attr_last_touch_fn,
    oracle=(
        "WITH tagged AS (\n"
        "  SELECT user_id, ts, event_id, event_type, value,\n"
        "    CASE WHEN event_type <> 'purchase' THEN event_type END"
        " AS touch_type,\n"
        "    CASE WHEN event_type <> 'purchase' THEN ts END AS touch_ts,\n"
        "    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"
        " AS is_purchase\n"
        "  FROM events WHERE event_type IN ('click', 'view', 'purchase')),\n"
        "attr AS (\n"
        "  SELECT event_type, ts, value,\n"
        "    LAST_VALUE(touch_type IGNORE NULLS) OVER w AS last_touch,\n"
        "    LAST_VALUE(touch_ts IGNORE NULLS) OVER w AS last_ts\n"
        "  FROM tagged\n"
        "  WINDOW w AS (PARTITION BY user_id"
        " ORDER BY ts, is_purchase, event_id\n"
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))\n"
        "SELECT COALESCE(CASE WHEN last_ts >= ts - INTERVAL 7 DAY\n"
        "    THEN last_touch END, 'direct') AS channel,\n"
        "  COUNT(*) AS n_purchases,\n"
        "  CAST(ROUND(SUM(value), 2) AS DOUBLE) AS revenue\n"
        "FROM attr WHERE event_type = 'purchase'\n"
        "GROUP BY 1 ORDER BY 1"
    ),
    category="timeseries",
    suite="extension",
    doc=(
        "last-touch attribution (7-day lookback, else 'direct'): one "
        "user-partitioned carry-forward window instead of a purchase x "
        "touch range join; deterministic tie order (ts, kind, event_id)"
    ),
)


# -- winnowing document fingerprints -----------------------------------------


def _winnowing_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD'03 —
    the MOSS plagiarism-detection selector): hash every k-gram, slide a
    w-hash window, keep each window's minimum hash; the distinct kept
    hashes are the document's fingerprint set. Guarantees any shared
    substring of length >= k+w-1 contributes at least one common
    fingerprint, at ~2/(w+1) the density of full k-gram shingling.

    Plan: NO higher-order functions anywhere — Spark evaluates HOF
    lambdas with interpreted per-element expressions (outside
    whole-stage codegen), and slicing a computed array inside a
    transform re-evaluates the whole upstream array per element (the
    first draft was O(n^3) per doc that way; the HOF-fold rewrite was
    still 12 s at sf0.1). Instead: explode character positions in the
    scan stage (codegen, text column dropped in the same stage), then
    ONE doc-partitioned sort serves both window passes — the k-gram
    hash as a dot product of LEADs (c*B^4 + lead(c,1)*B^3 + ... — the
    un-modded polynomial peaks at 255 * sum(B^t) ~ 7.6e10, safely
    inside int64, and mod-at-end equals DuckDB's stepwise-mod fold
    because mod distributes), and the w-window minimum as a ROWS frame.
    The rollup (count/sum/min/max over distinct minima) is a partial
    aggregate. At 100 TB this is the map-side sketch stage of the dedup
    funnel: one narrow digest row per document, the natural join key
    for candidate pairing.
    """
    k, w, big_b, big_m = 5, 4, 131, 2147483647
    docs = load_table(spark, sf_dir, "documents").where(
        F.length("text") >= k + w - 1
    )
    chars = docs.select(
        "doc_id",
        (F.length("text") - k + 1).alias("n_h"),
        F.explode(F.sequence(F.lit(1), F.length("text"))).alias("pos"),
        F.col("text"),
    ).select(
        "doc_id",
        "n_h",
        "pos",
        F.ascii(F.col("text").substr(F.col("pos"), F.lit(1)))
        .cast("long")
        .alias("c"),
    )
    wo = Window.partitionBy("doc_id").orderBy("pos")
    poly = sum(
        F.lead("c", t).over(wo) * (big_b ** (k - 1 - t)) for t in range(1, k)
    ) + F.col("c") * (big_b ** (k - 1))
    hashed = chars.withColumn("h", poly % big_m).where(
        F.col("pos") <= F.col("n_h")
    )
    wmin = wo.rowsBetween(Window.currentRow, w - 1)
    selected = hashed.withColumn("m", F.min("h").over(wmin)).where(
        F.col("pos") <= F.col("n_h") - w + 1  # pos is 1-based here
    )
    return (
        selected.groupBy("doc_id")
        .agg(
            F.countDistinct("m").cast("int").alias("n_fp"),
            (F.sum_distinct("m") % big_m).alias("fp_digest"),
            F.min("m").alias("min_fp"),
            F.max("m").alias("max_fp"),
        )
        .orderBy("doc_id")
    )


register(
    "llm_winnowing",
    engine_fn=_winnowing_fn,
    oracle=(
        "WITH base AS (\n"
        "  SELECT doc_id, text,\n"
        "    LIST_TRANSFORM(GENERATE_SERIES(1, LEN(text)),\n"
        "      i -> CAST(ASCII(SUBSTR(text, i, 1)) AS BIGINT)) AS codes\n"
        "  FROM documents WHERE LEN(text) >= 8),\n"
        "h AS (\n"
        "  SELECT doc_id,\n"
        "    LIST_TRANSFORM(GENERATE_SERIES(1, LEN(text) - 4),\n"
        "      i -> LIST_REDUCE(LIST_SLICE(codes, i, i + 4),\n"
        "        (a, c) -> (a * 131 + c) % 2147483647)) AS hashes\n"
        "  FROM base),\n"
        "m AS (\n"
        "  SELECT doc_id,\n"
        "    LIST_DISTINCT(LIST_TRANSFORM(\n"
        "      GENERATE_SERIES(1, LEN(hashes) - 3),\n"
        "      j -> LIST_AGGREGATE(LIST_SLICE(hashes, j, j + 3), 'min')))"
        " AS fp\n"
        "  FROM h)\n"
        "SELECT doc_id, CAST(LEN(fp) AS INT) AS n_fp,\n"
        "  LIST_REDUCE(fp, (a, x) -> a + x) % 2147483647 AS fp_digest,\n"
        "  LIST_AGGREGATE(fp, 'min') AS min_fp,\n"
        "  LIST_AGGREGATE(fp, 'max') AS max_fp\n"
        "FROM m ORDER BY doc_id"
    ),
    category="llm-dedup",
    suite="extension",
    doc=(
        "winnowing fingerprints (MOSS selector, k=5 w=4): rolling "
        "polynomial k-gram hashes + window minima, all per-row JVM array "
        "expressions — map-only sketch stage of the dedup funnel"
    ),
)


# -- CUSUM changepoint detection ---------------------------------------------


def _cusum_changepoint_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection (Page 1954): per event_type, the
    running sum of deviations from the series mean; the |CUSUM| maximum
    marks the most likely level-shift point. The monitoring primitive
    behind drift alarms on metric streams.

    Plan: the group mean is a key-partitioned aggregate broadcast back
    onto the rows (small: one row per event_type); the running sum is a
    group-partitioned ROWS window ordered by (ts, event_id) —
    deterministic under timestamp ties; the argmax is a partial
    max_by-style aggregate over (|cusum|, ts, event_id) structs, so ties
    break identically on both engines. Two shuffles total, both on
    event_type; nothing global.
    """
    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    means = ev.groupBy("event_type").agg(F.avg("value").alias("mu"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cusum = (
        ev.join(F.broadcast(means), "event_type")
        .withColumn(
            "cusum", F.round(F.sum(F.col("value") - F.col("mu")).over(w), 6)
        )
        .select("event_type", "ts", "event_id", "cusum")
    )
    return (
        cusum.groupBy("event_type")
        .agg(
            F.max(
                F.struct(
                    F.abs(F.col("cusum")).alias("a"),
                    F.col("ts").alias("ts"),
                    F.col("event_id").alias("eid"),
                    F.col("cusum").alias("c"),
                )
            ).alias("m")
        )
        .select(
            "event_type",
            F.col("m.ts").alias("change_ts"),
            F.round(F.col("m.a"), 6).cast("double").alias("max_abs_cusum"),
            F.round(F.col("m.c"), 6).cast("double").alias("cusum_at_max"),
        )
        .orderBy("event_type")
    )


register(
    "ts_cusum_changepoint",
    engine_fn=_cusum_changepoint_fn,
    oracle=(
        "WITH base AS (\n"
        "  SELECT event_type, ts, event_id, value,\n"
        "    AVG(value) OVER (PARTITION BY event_type) AS mu\n"
        "  FROM events WHERE value IS NOT NULL),\n"
        "c AS (\n"
        "  SELECT event_type, ts, event_id,\n"
        "    ROUND(SUM(value - mu) OVER (PARTITION BY event_type\n"
        "      ORDER BY ts, event_id\n"
        "      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)"
        " AS cusum\n"
        "  FROM base)\n"
        "SELECT event_type, ts AS change_ts,\n"
        "  CAST(ROUND(ABS(cusum), 6) AS DOUBLE) AS max_abs_cusum,\n"
        "  CAST(ROUND(cusum, 6) AS DOUBLE) AS cusum_at_max\n"
        "FROM c\n"
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type\n"
        "  ORDER BY ABS(cusum) DESC, ts DESC, event_id DESC) = 1\n"
        "ORDER BY event_type"
    ),
    category="timeseries",
    suite="extension",
    doc=(
        "CUSUM changepoint per metric group: broadcast group mean, one "
        "group-partitioned running-sum window, struct-argmax rollup with "
        "deterministic (ts, event_id) tie order"
    ),
)
