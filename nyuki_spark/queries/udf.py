"""UDF / UDAF / UDTF surface (SURVEY.md §2.11) — oracle-checked.

Each user-defined surface is exercised with a function whose semantics a
plain SQL expression can replicate, so the DuckDB oracle checks the whole
path: Arrow serialization, batch shapes, null handling, grouping. The UDFs
are deliberately simple — the *surface* is under test, not the math.

All Python UDFs here are Arrow-vectorized (pandas_udf / applyInPandas /
UDTF) — the only acceptable Python hot path at scale. NB: pandas_udf/udtf
decorators parse their DDL return type eagerly and need an active
SparkSession, so every definition lives inside its query function.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyuki_spark.catalog import load_table
from nyuki_spark.queries.registry import register


# -- scalar pandas UDF -------------------------------------------------------


def _scalar_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def affine(v: pd.Series) -> pd.Series:
        return v * 2.0 + 1.0

    events = load_table(spark, sf_dir, "events")
    return (
        events.select("event_id", affine("value").alias("y"))
        .orderBy("event_id")
        .limit(100)
    )


register(
    "udf_scalar_pandas",
    engine_fn=_scalar_fn,
    oracle=(
        "SELECT event_id, value * 2.0 + 1.0 AS y FROM events ORDER BY event_id LIMIT 100"
    ),
    category="udf",
    suite="extension",
    doc="Arrow-vectorized scalar UDF == native expression",
)


# -- grouped-agg pandas UDF (UDAF) -------------------------------------------


def _udaf_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def mean_udaf(v: pd.Series) -> float:
        return float(v.mean())

    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(F.round(mean_udaf("value"), 6).alias("avg_value"))
        .orderBy("event_type")
    )


register(
    "udf_grouped_agg",
    engine_fn=_udaf_fn,
    oracle=(
        "SELECT event_type, ROUND(AVG(value), 6) AS avg_value FROM events\n"
        "GROUP BY event_type ORDER BY event_type"
    ),
    category="udf",
    suite="extension",
    doc="pandas GROUPED_AGG UDAF == SQL AVG",
)


# -- grouped map (applyInPandas) ---------------------------------------------


def _grouped_map_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Defined inside the function so cloudpickle ships it BY VALUE: a
    # module-level function would be pickled by reference and the driver's
    # Python workers (whose sys.path lacks this repo) couldn't import it.
    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf["value"].std()  # ddof=1 == STDDEV_SAMP
        mean = pdf["value"].mean()
        z = np.round((pdf["value"] - mean) / std, 4)
        out = pd.DataFrame({"event_id": pdf["event_id"], "z": z})
        # Single-row / constant groups: sample std is NaN/0 -> SQL NULL.
        if not np.isfinite(std) or std == 0:
            out["z"] = None
        return out

    events = load_table(spark, sf_dir, "events")
    # r12 (guide §2.6/§4): the per-group z-score is PYTHON-side work —
    # ~1.5k pandas group calls — but the grouping shuffle is only a few
    # MB, so AQE's partition coalescing folds it to ~1 post-shuffle
    # partition and every group runs through ONE Python worker serially.
    # An explicit keyed repartition at the cluster's parallelism (AQE
    # honours user-specified partition counts) keeps the JVM shuffle
    # identical in bytes while fanning the Python stage across all
    # cores; scale-adaptive (defaultParallelism), not a local constant.
    n = events.sparkSession.sparkContext.defaultParallelism
    return (
        events.repartition(n, "user_id")
        .groupBy("user_id")
        .applyInPandas(zscore, schema="event_id long, z double")
        .orderBy("event_id")
    )


register(
    "udf_grouped_map",
    engine_fn=_grouped_map_fn,
    oracle=(
        "SELECT event_id,\n"
        "ROUND((value - AVG(value) OVER w) / NULLIF(STDDEV_SAMP(value) OVER w, 0), 4) AS z\n"
        "FROM events WINDOW w AS (PARTITION BY user_id)\n"
        "ORDER BY event_id"
    ),
    category="udf",
    suite="extension",
    doc="applyInPandas per-group z-score == SQL window formulation",
)


# -- UDTF --------------------------------------------------------------------


def _udtf_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    # useArrow: Spark 4's Arrow-optimized UDTF path batches rows through
    # Arrow instead of pickling one row at a time — the r5 drift pin-down
    # (udf_udtf_split 0.74 -> 1.81 s was dominated by the row-at-a-time
    # lateral-join serialization, not the split itself).
    @udtf(returnType="pos int, word string", useArrow=True)
    class SplitWords:
        """One row per word with its 1-based position."""

        def eval(self, text: str):
            for i, w in enumerate(text.split(" ")):
                yield i + 1, w

    load_table(spark, sf_dir, "documents")
    spark.udtf.register("nyuki_split_words", SplitWords)
    # Filter BEFORE the lateral join: Catalyst does not push predicates
    # through a Python UDTF Generate (the function is a black box), so
    # the WHERE-after-LATERAL form split every document and discarded
    # 99.9% of the output — the other half of the r5 drift (1.8 s ->
    # ~0.15 s at sf0.1).
    return spark.sql(
        "SELECT d.doc_id, w.pos, w.word\n"
        "FROM (SELECT doc_id, text FROM documents WHERE doc_id < 5) d,\n"
        "     LATERAL nyuki_split_words(d.text) w\n"
        "ORDER BY d.doc_id, w.pos"
    )


register(
    "udf_udtf_split",
    engine_fn=_udtf_fn,
    oracle=(
        "SELECT doc_id, i AS pos, arr[i] AS word\n"
        "FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS arr FROM documents),\n"
        "     UNNEST(RANGE(1, LEN(arr) + 1)) AS t(i)\n"
        "WHERE doc_id < 5 ORDER BY doc_id, pos"
    ),
    category="udf",
    suite="extension",
    doc="Python UDTF (lateral table function) == UNNEST with ordinality",
)
