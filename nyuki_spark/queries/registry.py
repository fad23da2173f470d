"""Query registry plumbing (see ``nyuki_spark.queries``)."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from nyuki_spark.catalog import register_tables

__all__ = ["Query", "REGISTRY", "register"]


@dataclass(frozen=True)
class Query:
    """One declared query.

    - ``engine_sql``: Spark SQL text (runs through Catalyst unchanged).
    - ``engine_fn``: DataFrame program; takes (spark, sf_dir) *after* the
      catalog is registered. Preferred over ``engine_sql`` when set — used
      where the idiomatic Spark execution differs from the declared SQL
      (as-of rewrite) or where the operator is not SQL (pandas-UDF kNN).
    - ``oracle_sql``: DuckDB twin. None -> driver records rows-only check.
    - ``category``: SURVEY.md §2 bucket, for reporting.
    - ``suite``: "declared" (the 61 in SURVEY.md Appendix A — the set
      BASELINE.md's numbers cover, and what bench.py times) or "extension".
    """

    id: str
    engine_sql: str | None = None
    oracle_sql: str | None = None
    engine_fn: Callable[[SparkSession, str], DataFrame] | None = field(
        default=None, repr=False
    )
    category: str = ""
    doc: str = ""
    suite: str = "declared"

    def run(self, spark: SparkSession, sf_dir: str) -> DataFrame:
        register_tables(spark, sf_dir)
        if self.engine_fn is not None:
            return self.engine_fn(spark, sf_dir)
        assert self.engine_sql is not None, f"{self.id}: no engine side"
        return spark.sql(self.engine_sql)

    def runner(self) -> Callable[[SparkSession, str], DataFrame]:
        """A self-contained (spark, sf_dir) callable for __spark_entry__."""
        return lambda spark, sf_dir: self.run(spark, sf_dir)


REGISTRY: dict[str, Query] = {}


def register(
    id: str,
    sql: str | None = None,
    *,
    engine: str | None = None,
    oracle: str | None = None,
    engine_fn: Callable[[SparkSession, str], DataFrame] | None = None,
    category: str = "",
    doc: str = "",
    suite: str = "declared",
) -> Query:
    """Register a query. ``sql`` sets both sides (portable text); ``engine``/
    ``oracle`` set dialect-specific twins."""
    if sql is not None:
        engine = engine if engine is not None else sql
        oracle = oracle if oracle is not None else sql
    q = Query(
        id=id,
        engine_sql=engine,
        oracle_sql=oracle,
        engine_fn=engine_fn,
        category=category,
        doc=doc,
        suite=suite,
    )
    assert id not in REGISTRY, f"duplicate query id {id}"
    REGISTRY[id] = q
    return q
