"""Pipeline specs: the engine's equivalent of the reference's versioned
workflow templates (JSON documents compiled to dataflow DAGs).

:mod:`spec` — JSON spec -> DataFrame program compiler + validation.
"""

from nyuki_spark.plans.spec import PipelineSpec, compile_pipeline  # noqa: F401
