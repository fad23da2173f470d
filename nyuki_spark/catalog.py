"""Fixture-table catalog: parquet -> temp views with type normalisation.

The reference's data model is schema-less JSON events on bus topics
(SURVEY.md §1.1); the engine's is typed DataFrames. This module is the
boundary: it loads the driver's parquet tables and fixes the one type the
raw files cannot express portably — ``events.ts`` is parquet
TIMESTAMP(NANOS,false), which Spark reads (only) as a long under
``spark.sql.legacy.parquet.nanosAsLong=true``. We convert with **integer**
``ts DIV 1000`` -> ``timestamp_micros`` so the truncation matches DuckDB's
native ns->us truncation bit-for-bit (float division rounds up on some rows
and diverges by 1 us — verified, FIXTURES.md).

At scale: the tables here are plain parquet directories; on a real cluster
the same ``register_tables`` points at object-store URIs, and Spark's
vectorized parquet reader + partition/rowgroup pruning apply unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

__all__ = ["TABLES", "load_table", "register_tables", "DEFAULT_SF_DIR"]

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, applying type normalisation where needed."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # ns-as-long -> microsecond timestamp; integer DIV (see module doc).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def register_tables(
    spark: SparkSession,
    sf_dir: str = DEFAULT_SF_DIR,
    tables: tuple[str, ...] = TABLES,
) -> dict[str, DataFrame]:
    """Register fixture tables as temp views; returns the DataFrames.

    Temp-view registration is metadata-only (no scan happens here); calling
    it per-query is cheap and keeps the callables in ``__spark_entry__``
    self-contained as the driver requires.
    """
    out: dict[str, DataFrame] = {}
    for name in tables:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
