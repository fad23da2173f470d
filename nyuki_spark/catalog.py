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

__all__ = [
    "TABLES",
    "configure_session",
    "load_table",
    "register_tables",
    "DEFAULT_SF_DIR",
]

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


def configure_session(spark: SparkSession) -> None:
    """Apply the engine's runtime-settable confs to *any* SparkSession.

    The driver harness (and any real embedding application) passes its OWN
    session into the query callables — one built without our
    ``get_session()`` factory. Every conf the engine depends on for
    correctness is a SQL conf, hence settable on a live session:

    - ``nanosAsLong`` — without it, reading ``events.parquet``
      (TIMESTAMP NANOS) throws [PARQUET_TYPE_ILLEGAL];
    - ``timeZone=UTC`` — without it, DATE_TRUNC/EXTRACT silently shift
      away from the UTC-written fixtures (wrong answers, not errors);
    - Arrow + AQE + broadcast threshold — performance posture.

    Static confs (``spark.ui.*``) are deliberately excluded: they cannot be
    set on a running session and are not correctness-relevant. Idempotent
    and cheap (a handful of py4j conf.set calls), so every entry point calls
    it unconditionally.
    """
    from nyuki_spark.session import ENGINE_CONF

    for key, value in ENGINE_CONF.items():
        if not key.startswith("spark.sql."):
            continue  # static conf — builder-time only
        try:
            spark.conf.set(key, value)
        except Exception:
            # A session may pin some conf as static/modifiable=false in
            # exotic deployments; one unsettable knob must not take down
            # queries that don't depend on it.
            pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, applying type normalisation where needed."""
    configure_session(spark)
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

    ``spark.read.parquet`` reads footers eagerly, so registration is cheap
    but NOT free — and a corrupt/unreadable table fails here, at
    registration. Callers therefore pass only the ``tables`` their query
    actually references (``Query.run`` infers them), so one bad table
    cannot poison unrelated queries.
    """
    configure_session(spark)
    out: dict[str, DataFrame] = {}
    for name in tables:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
