"""JSON pipeline spec -> DataFrame program.

The reference stores versioned workflow templates as JSON documents — a
DAG of task configs, validated before publish, instantiated per triggering
event (upstream `nyuki/workflow/` template storage + `validate.py` — mount
empty, SURVEY.md §0). The engine keeps the same artifact shape (a JSON
document users can store, version, diff) but compiles it ONCE into a
DataFrame transformation instead of interpreting tasks per event.

Spec format::

    {"name": "route-errors", "version": 2,
     "steps": [
       {"op": "filter",  "condition": "value > 100 and status == 'err'"},
       {"op": "extract", "field": "k", "src": "props", "pattern": "(\\d+)"},
       {"op": "sub",     "field": "name", "pattern": "0+", "repl": "0"},
       {"op": "set",     "field": "route", "value": "alerts"},
       {"op": "unset",   "field": "props"},
       {"op": "lookup",  "field": "kind", "table": {"a": "x"}, "icase": true},
       {"op": "select",  "fields": ["event_id", "k", "route"]},
       {"op": "branch",  "field": "sev",
        "cases": [{"condition": "value > 500", "value": "crit"}],
        "default": "info"}
     ]}

Every ``condition`` uses the safe DSL (:mod:`nyuki_spark.functions.evaluate`)
— same whitelist as the reference's branch conditions. The compiled result
is a plain ``DataFrame -> DataFrame`` function: chain it onto a batch table
or a streaming source, Catalyst sees one fused projection/filter pipeline.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyuki_spark.functions.evaluate import compile_condition
from nyuki_spark.functions.transform import Extract, Lookup, Rule, Set, Sub, Unset

__all__ = ["PipelineSpec", "compile_pipeline", "SpecError"]

PipelineFn = Callable[[DataFrame], DataFrame]


class SpecError(ValueError):
    """Malformed pipeline spec (unknown op / missing key / bad condition)."""


def _rule_for(step: dict) -> Rule:
    op = step["op"]
    if op == "extract":
        return Extract(
            step["field"],
            step["pattern"],
            group=step.get("group", 1),
            src=step.get("src"),
        )
    if op == "sub":
        return Sub(step["field"], step["pattern"], step["repl"])
    if op == "set":
        return Set(step["field"], step.get("value"))
    if op == "unset":
        return Unset(step["field"])
    if op == "lookup":
        return Lookup(
            step["field"],
            tuple(step["table"].items()),
            icase=step.get("icase", False),
        )
    raise SpecError(f"unknown rule op: {op}")


def _compile_step(step: dict) -> PipelineFn:
    op = step.get("op")
    if op is None:
        raise SpecError(f"step missing 'op': {step}")
    if op == "filter":
        pred = compile_condition(step["condition"])
        return lambda df: df.where(pred)
    if op == "select":
        fields = list(step["fields"])
        return lambda df: df.select(*fields)
    if op == "branch":
        # Condition routing (the reference's task_selector): first matching
        # case labels the row; CASE WHEN in the plan, no per-branch scan.
        col = None
        for case in step.get("cases", []):
            pred = compile_condition(case["condition"])
            col = (
                F.when(pred, F.lit(case["value"]))
                if col is None
                else col.when(pred, F.lit(case["value"]))
            )
        if col is None:
            raise SpecError("branch step needs at least one case")
        col = col.otherwise(F.lit(step.get("default")))
        field = step["field"]
        return lambda df: df.withColumn(field, col)
    rule = _rule_for(step)  # raises SpecError on unknown op
    return rule.apply


@dataclass(frozen=True)
class PipelineSpec:
    """A validated, compiled pipeline."""

    name: str
    version: int
    fn: PipelineFn
    n_steps: int

    def __call__(self, df: DataFrame) -> DataFrame:
        return self.fn(df)


def compile_pipeline(spec: dict | str) -> PipelineSpec:
    """Validate + compile a JSON pipeline spec.

    Compilation IS validation (the reference validates templates before
    publish): every op name, key, and condition is checked here, so a spec
    that compiles cannot fail structurally at run time.
    """
    if isinstance(spec, str):
        spec = json.loads(spec)
    if not isinstance(spec, dict) or "steps" not in spec:
        raise SpecError("spec must be an object with a 'steps' list")
    try:
        step_fns = [_compile_step(s) for s in spec["steps"]]
    except KeyError as e:
        raise SpecError(f"step missing key: {e}") from e

    def fn(df: DataFrame) -> DataFrame:
        for f in step_fns:
            df = f(df)
        return df

    return PipelineSpec(
        name=spec.get("name", "<anonymous>"),
        version=int(spec.get("version", 1)),
        fn=fn,
        n_steps=len(step_fns),
    )
