"""Operators the engine adds on top of Spark's built-in surface.

Each module implements one family from SURVEY.md §2 as a composition of
DataFrame operations (preferred — stays inside Catalyst/whole-stage codegen),
falling back to Arrow-batched pandas UDFs only where built-ins genuinely
cannot express the semantics (embedding math, MinHash at scale).
"""

from nyuki_spark.operators.asof import asof_join, last_event_asof  # noqa: F401
from nyuki_spark.operators.interval import interval_join  # noqa: F401
