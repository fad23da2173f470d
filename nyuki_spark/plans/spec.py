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

__all__ = ["PipelineSpec", "compile_pipeline", "validate_spec", "SpecError"]

PipelineFn = Callable[[DataFrame], DataFrame]


class SpecError(ValueError):
    """Malformed pipeline spec (unknown op / missing key / bad condition).

    ``errors`` carries the full jsonschema-shaped listing — one
    ``{"path", "message", "validator"}`` dict per violation (the
    reference validates workflow templates by jsonschema before publish
    and returns the whole listing, not just the first failure)."""

    def __init__(self, message: str, errors: list[dict] | None = None):
        super().__init__(message)
        self.errors = errors if errors is not None else []


# Per-op step schema: required/optional properties with their JSON types.
# ``object`` means any type. This is the engine's equivalent of the
# reference's jsonschema template documents — kept as data so the
# validator below reports EVERY violation with a JSON-pointer path.
_STEP_SCHEMAS: dict[str, dict[str, dict[str, type]]] = {
    "filter": {"required": {"condition": str}, "optional": {}},
    "extract": {
        "required": {"field": str, "pattern": str},
        "optional": {"group": int, "src": str},
    },
    "sub": {"required": {"field": str, "pattern": str, "repl": str}, "optional": {}},
    "set": {"required": {"field": str}, "optional": {"value": object}},
    "unset": {"required": {"field": str}, "optional": {}},
    "lookup": {
        "required": {"field": str, "table": dict},
        "optional": {"icase": bool},
    },
    "select": {"required": {"fields": list}, "optional": {}},
    "branch": {
        "required": {"field": str, "cases": list},
        "optional": {"default": object},
    },
    # Sub-workflow invocation (r8 — the reference chains workflows by
    # name [K]): splices the named template's compiled steps in place.
    "apply": {"required": {"template": str}, "optional": {}},
}

_TYPE_NAMES = {str: "string", int: "integer", bool: "boolean", dict: "object", list: "array"}


def _err(path: str, message: str, validator: str) -> dict:
    return {"path": path, "message": message, "validator": validator}


def _check_type(val, typ: type) -> bool:
    if typ is object:
        return True
    if typ is int:
        return isinstance(val, int) and not isinstance(val, bool)
    return isinstance(val, typ)


def _validate_condition(path: str, cond, errors: list[dict]) -> None:
    if not isinstance(cond, str):
        return  # the type error is already recorded
    try:
        compile_condition(cond)
    except Exception as e:  # noqa: BLE001 — any compile failure is a spec error
        errors.append(_err(path, f"invalid condition: {e}", "format"))


def validate_spec(
    spec: dict | str, templates: dict | None = None
) -> list[dict]:
    """Jsonschema-shaped validation: the COMPLETE error listing for a
    pipeline-spec document, each entry ``{"path": <json-pointer>,
    "message": str, "validator": <jsonschema keyword>}`` — empty when the
    spec is publishable. Unlike :func:`compile_pipeline` (which stops at
    the first problem by construction), this walks the whole document, so
    an API client gets every violation in one round trip — the
    reference's validate-before-publish contract.

    ``templates`` (optional ``{name: spec}`` registry) additionally
    resolves ``apply`` steps: an unknown template name is reported.
    Without it, ``apply`` is checked structurally only (the name binds at
    compile time).
    """
    import re as _re

    errors: list[dict] = []
    if isinstance(spec, str):
        try:
            spec = json.loads(spec)
        except json.JSONDecodeError as e:
            return [_err("", f"invalid JSON: {e}", "format")]
    if not isinstance(spec, dict):
        return [_err("", "spec must be an object", "type")]
    if "steps" not in spec:
        return [_err("", "'steps' is a required property", "required")]
    steps = spec["steps"]
    if not isinstance(steps, list):
        return [_err("/steps", "expected array", "type")]
    for i, step in enumerate(steps):
        p = f"/steps/{i}"
        if not isinstance(step, dict):
            errors.append(_err(p, "expected object", "type"))
            continue
        op = step.get("op")
        if op is None:
            errors.append(_err(p, "'op' is a required property", "required"))
            continue
        schema = _STEP_SCHEMAS.get(op)
        if schema is None:
            errors.append(
                _err(f"{p}/op", f"'{op}' is not one of {sorted(_STEP_SCHEMAS)}", "enum")
            )
            continue
        for key, typ in schema["required"].items():
            if key not in step:
                errors.append(
                    _err(p, f"'{key}' is a required property for op '{op}'", "required")
                )
            elif not _check_type(step[key], typ):
                errors.append(
                    _err(f"{p}/{key}", f"expected {_TYPE_NAMES.get(typ, 'value')}", "type")
                )
        for key, typ in schema["optional"].items():
            if key in step and not _check_type(step[key], typ):
                errors.append(
                    _err(f"{p}/{key}", f"expected {_TYPE_NAMES.get(typ, 'value')}", "type")
                )
        known = {"op", *schema["required"], *schema["optional"]}
        for key in step:
            # "x-" is the reserved annotation prefix (r7 advice: the old
            # compiler silently ignored unknown keys, so stored specs may
            # carry vendor/tooling annotations; rejecting them outright is
            # a breaking change). Keys like "x-owner" / "x-comment" are
            # accepted and ignored by the compiler — same convention as
            # OpenAPI extension fields.
            if key not in known and not key.startswith("x-"):
                errors.append(
                    _err(
                        f"{p}/{key}",
                        f"unexpected property for op '{op}'",
                        "additionalProperties",
                    )
                )
        if op == "filter":
            _validate_condition(f"{p}/condition", step.get("condition"), errors)
        if (
            op == "apply"
            and templates is not None
            and isinstance(step.get("template"), str)
            and step["template"] not in templates
        ):
            errors.append(
                _err(
                    f"{p}/template",
                    f"'{step['template']}' is not one of {sorted(templates)}",
                    "enum",
                )
            )
        if op in ("extract", "sub") and isinstance(step.get("pattern"), str):
            try:
                _re.compile(step["pattern"])
            except _re.error as e:
                errors.append(_err(f"{p}/pattern", f"invalid regex: {e}", "format"))
        if op == "select" and isinstance(step.get("fields"), list):
            for j, fld in enumerate(step["fields"]):
                if not isinstance(fld, str):
                    errors.append(_err(f"{p}/fields/{j}", "expected string", "type"))
        if op == "lookup" and isinstance(step.get("table"), dict):
            for kk, vv in step["table"].items():
                if not isinstance(vv, str):
                    errors.append(
                        _err(f"{p}/table/{kk}", "expected string value", "type")
                    )
        if op == "branch" and isinstance(step.get("cases"), list):
            if not step["cases"]:
                errors.append(
                    _err(f"{p}/cases", "at least one case is required", "minItems")
                )
            for j, case in enumerate(step["cases"]):
                cp = f"{p}/cases/{j}"
                if not isinstance(case, dict):
                    errors.append(_err(cp, "expected object", "type"))
                    continue
                for k2 in ("condition", "value"):
                    if k2 not in case:
                        errors.append(
                            _err(cp, f"'{k2}' is a required property", "required")
                        )
                _validate_condition(f"{cp}/condition", case.get("condition"), errors)
    return errors


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


def _compile_step(
    step: dict,
    templates: dict | None = None,
    _stack: frozenset = frozenset(),
) -> PipelineFn:
    op = step.get("op")
    if op is None:
        raise SpecError(f"step missing 'op': {step}")
    if op == "apply":
        # Sub-workflow invocation: splice the named template's compiled
        # pipeline in place (the reference chains workflows by name).
        # Cycles are a compile error, not a runtime hang.
        name = step["template"]
        if templates is None or name not in templates:
            raise SpecError(f"apply: unknown template {name!r}")
        if name in _stack:
            raise SpecError(
                f"apply: template cycle at {name!r} (stack: {sorted(_stack)})"
            )
        sub = compile_pipeline(
            templates[name], templates=templates, _stack=_stack | {name}
        )
        return sub.fn
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


def compile_pipeline(
    spec: dict | str,
    templates: dict | None = None,
    _stack: frozenset = frozenset(),
) -> PipelineSpec:
    """Validate + compile a JSON pipeline spec.

    Compilation IS validation (the reference validates templates before
    publish): every op name, key, and condition is checked here, so a spec
    that compiles cannot fail structurally at run time.

    ``templates`` is the ``{name: spec}`` registry ``apply`` steps
    resolve against (sub-workflow invocation); sub-templates compile
    recursively with cycle detection.
    """
    if isinstance(spec, str):
        spec = json.loads(spec)
    listing = validate_spec(spec, templates=templates)
    if listing:
        raise SpecError(
            f"invalid spec: {len(listing)} error(s): "
            + "; ".join(f"{e['path'] or '<root>'}: {e['message']}" for e in listing),
            errors=listing,
        )
    try:
        step_fns = [
            _compile_step(s, templates=templates, _stack=_stack)
            for s in spec["steps"]
        ]
    except KeyError as e:  # backstop — validate_spec should have caught it
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
