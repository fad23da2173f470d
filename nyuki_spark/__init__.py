"""nyuki_spark — a PySpark-native analytics engine.

A ground-up rebuild of the capabilities of the reference system
(optiflows/nyuki, an asyncio event-bus + workflow framework; see SURVEY.md)
as an idiomatic Apache Spark engine:

- Batch/relational surface  -> DataFrame + Spark SQL (Catalyst/Tungsten).
- Event/streaming surface   -> Structured Streaming (watermarks, windows,
  stateful ops), mirroring the reference's event-triggered workflow DAGs.
- Transform-rule surface    -> Column combinators (nyuki "factory rules":
  extract / sub / set / unset / lookup) and a safe condition-DSL compiler
  (nyuki `nyuki/utils/evaluate.py` semantics; reference mount was empty,
  upstream paths per SURVEY.md §0).
- LLM-data-pipeline surface -> dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard / embedding-cosine), similarity search, text analysis,
  multimodal column plumbing.

The package is organised as:

- ``nyuki_spark.session``   — SparkSession factory with the verified config.
- ``nyuki_spark.catalog``   — fixture-table registration (ns-timestamp shim).
- ``nyuki_spark.queries``   — the declared-query registry (SURVEY.md §2/App A).
- ``nyuki_spark.operators`` — relational/LLM operators not native to Spark.
- ``nyuki_spark.functions`` — row-transform rules + condition DSL.
- ``nyuki_spark.plans``     — JSON pipeline-spec -> DataFrame compiler.
- ``nyuki_spark.sources``   — custom Python data sources (bus source/sink).
- ``nyuki_spark.streaming`` — Structured Streaming pipelines and helpers.
"""

__version__ = "0.1.0"

from nyuki_spark.session import get_session  # noqa: F401
from nyuki_spark.catalog import register_tables, TABLES  # noqa: F401
