"""Declared-query registry: the engine's correctness contract.

``REGISTRY`` maps query id -> :class:`Query`. Each query has an engine side
(Spark SQL text or a DataFrame program) and, where a batch oracle exists, a
DuckDB SQL twin. The driver runs both at sf0.01 and hash-compares
(CORRECTNESS_r{N}.json); tests/test_declared_oracle.py does the same at
sf0.001 on every pytest run.
"""

from nyuki_spark.queries.registry import Query, REGISTRY, register  # noqa: F401
from nyuki_spark.queries import analytics  # noqa: F401  (populates REGISTRY)
from nyuki_spark.queries import corpus  # noqa: F401  (populates REGISTRY)
from nyuki_spark.queries import declared  # noqa: F401  (populates REGISTRY)
from nyuki_spark.queries import extensions  # noqa: F401  (populates REGISTRY)
from nyuki_spark.queries import llm  # noqa: F401  (populates REGISTRY)
from nyuki_spark.queries import multimodal  # noqa: F401  (populates REGISTRY)
from nyuki_spark.queries import semantics  # noqa: F401  (populates REGISTRY)
from nyuki_spark.queries import tpch  # noqa: F401  (populates REGISTRY)
from nyuki_spark.queries import udf  # noqa: F401  (populates REGISTRY)
