"""Declarative CEP pattern specs: JSON -> streaming operator OR batch plan.

The reference's whole user surface is versioned JSON workflow templates
(upstream `nyuki/workflow/` — mount empty, SURVEY.md §0); round 11 left CEP
as the one engine capability that still required calling a Python API
(:func:`~nyuki_spark.streaming.stateful.funnel_match`). This module closes
that gap (r11 verdict Next #3): a pattern — steps with alternation and
``{m,n}`` quantifiers, one negated type, the anchor window, the tombstone
TTL — is DATA, validated like a workflow template (complete
jsonschema-shaped error listing) and compiled to either execution form:

- ``.stream(sdf)``: the live operator — exactly the funnel_match call a
  user would have written by hand (the compiler passes the derived kwargs
  through; parity with a direct call is an identity, asserted in
  tests/test_cep_spec.py anyway).
- ``.batch(df)``: the same semantics as a PURE DataFrame program over a
  batch table — anchor = per-key MIN of the first step's types, then per
  step the ``min``-th order statistic of its types inside its eligibility
  interval (window-bounded), the ``max``-count veto, and a final anti-join
  for the negated type. This is the window-bounded min-chain shape every
  stream_cep_* oracle writes in SQL, generated from the spec instead of by
  hand — and it is how a 100 TB BACKFILL of a CEP pattern should run:
  k hash-joins + k windowed ranks, all partitioned by key, no state store.

Spec format::

    {"name": "buy-funnel", "version": 1,
     "key": "user_id", "ts": "ts", "type": "event_type",
     "within_us": 604800000000,
     "steps": [
       {"types": ["signup"]},
       {"types": ["view", "click"], "min": 2, "max": 4},
       {"types": ["purchase"]}
     ],
     "absent": "error",
     "tombstone_ttl_us": null}

``types`` may be a string or a non-empty list (alternation); ``min``
defaults to 1, ``max`` to unbounded. ``batch()`` compiles the single-epoch
(no-TTL) semantics; a TTL pattern's batch twin is an epoch unroll whose
depth depends on the data span, so it stays streaming-only (ValueError).

Cross-step value predicates (r12) are data too::

    {"value": "value",
     "predicates": [{"left": 2, "op": ">", "right": 1},
                    {"left": 3, "op": ">", "right": 2}], ...}

read "value of step ``left``'s event OP value of step ``right``'s event".
With predicates the reported chain is the lexicographically earliest
satisfying (t1, .., tk) — ``.stream()`` compiles to funnel_match's
window-bounded backtracking DFS, ``.batch()`` to the relational rendering
of the same search: a k-way self-join over the window with the predicates
applied, ranked by (t1, .., tk), rn = 1. Predicates require every step at
the default quantifier (min 1, no max) — validated.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyuki_spark.plans.spec import SpecError, _err

__all__ = ["CepPattern", "compile_cep_pattern", "validate_cep_spec"]


def validate_cep_spec(spec: dict | str) -> list[dict]:
    """Jsonschema-shaped validation (same contract as
    :func:`~nyuki_spark.plans.spec.validate_spec`): the COMPLETE error
    listing for a CEP pattern document — empty when publishable."""
    errors: list[dict] = []
    if isinstance(spec, str):
        try:
            spec = json.loads(spec)
        except json.JSONDecodeError as e:
            return [_err("", f"invalid JSON: {e}", "format")]
    if not isinstance(spec, dict):
        return [_err("", "spec must be an object", "type")]
    for key in ("key", "ts", "type"):
        if key in spec and not isinstance(spec[key], str):
            errors.append(_err(f"/{key}", "expected string", "type"))
    for key in ("within_us", "tombstone_ttl_us"):
        val = spec.get(key)
        if val is not None and key in spec:
            if not isinstance(val, int) or isinstance(val, bool):
                errors.append(_err(f"/{key}", "expected integer", "type"))
            elif val <= 0:
                errors.append(_err(f"/{key}", "must be positive", "minimum"))
    if "absent" in spec and spec["absent"] is not None:
        if not isinstance(spec["absent"], str):
            errors.append(_err("/absent", "expected string", "type"))
    if "value" in spec and not isinstance(spec["value"], str):
        errors.append(_err("/value", "expected string", "type"))
    steps = spec.get("steps")
    if steps is None:
        errors.append(_err("", "'steps' is a required property", "required"))
        return errors
    if not isinstance(steps, list) or not steps:
        errors.append(_err("/steps", "expected non-empty array", "minItems"))
        return errors
    all_types: set[str] = set()
    for i, st in enumerate(steps):
        p = f"/steps/{i}"
        if not isinstance(st, dict):
            errors.append(_err(p, "expected object", "type"))
            continue
        types = st.get("types")
        if types is None:
            errors.append(_err(p, "'types' is a required property", "required"))
        elif isinstance(types, str):
            all_types.add(types)
        elif isinstance(types, list):
            if not types:
                errors.append(
                    _err(f"{p}/types", "at least one type is required", "minItems")
                )
            for j, t in enumerate(types):
                if not isinstance(t, str):
                    errors.append(_err(f"{p}/types/{j}", "expected string", "type"))
                else:
                    all_types.add(t)
        else:
            errors.append(_err(f"{p}/types", "expected string or array", "type"))
        mn = st.get("min", 1)
        mx = st.get("max")
        if not isinstance(mn, int) or isinstance(mn, bool):
            errors.append(_err(f"{p}/min", "expected integer", "type"))
        elif mn < 1:
            errors.append(_err(f"{p}/min", "must be >= 1", "minimum"))
        if mx is not None:
            if not isinstance(mx, int) or isinstance(mx, bool):
                errors.append(_err(f"{p}/max", "expected integer or null", "type"))
            elif isinstance(mn, int) and not isinstance(mn, bool) and mx < mn:
                errors.append(_err(f"{p}/max", "must be >= min", "minimum"))
        known = {"types", "min", "max"}
        for kk in st:
            if kk not in known and not kk.startswith("x-"):
                errors.append(
                    _err(f"{p}/{kk}", "unexpected property", "additionalProperties")
                )
        absent = spec.get("absent")
        if isinstance(absent, str) and isinstance(types, (str, list)):
            tlist = [types] if isinstance(types, str) else types
            if absent in tlist:
                errors.append(
                    _err(
                        f"{p}/types",
                        f"absent type '{absent}' cannot also be a chain step",
                        "enum",
                    )
                )
    preds = spec.get("predicates")
    if preds is not None:
        if not isinstance(preds, list):
            errors.append(_err("/predicates", "expected array", "type"))
        else:
            n = len(steps) if isinstance(steps, list) else 0
            if preds and "value" not in spec:
                errors.append(
                    _err("/predicates", "'value' column is required", "required")
                )
            if preds and any(
                isinstance(st, dict)
                and (st.get("min", 1) != 1 or st.get("max") is not None)
                for st in (steps if isinstance(steps, list) else [])
            ):
                errors.append(
                    _err(
                        "/predicates",
                        "predicates require every step at min 1 / no max",
                        "enum",
                    )
                )
            for i, pr in enumerate(preds):
                pp = f"/predicates/{i}"
                if not isinstance(pr, dict):
                    errors.append(_err(pp, "expected object", "type"))
                    continue
                for side in ("left", "right"):
                    v = pr.get(side)
                    if not isinstance(v, int) or isinstance(v, bool):
                        errors.append(
                            _err(f"{pp}/{side}", "expected integer step index", "type")
                        )
                    elif not 1 <= v <= max(n, 1):
                        errors.append(
                            _err(f"{pp}/{side}", f"step index out of range 1..{n}", "maximum")
                        )
                if pr.get("left") == pr.get("right"):
                    errors.append(
                        _err(pp, "left and right must be distinct steps", "enum")
                    )
                if pr.get("op") not in ("<", "<=", ">", ">=", "==", "!="):
                    errors.append(
                        _err(f"{pp}/op", "expected one of < <= > >= == !=", "enum")
                    )
    return errors


@dataclass(frozen=True)
class CepPattern:
    """A validated, compiled CEP pattern — one spec, two execution forms."""

    name: str
    version: int
    funnel_kwargs: dict
    batch: Callable[[DataFrame], DataFrame]

    def stream(self, sdf: DataFrame) -> DataFrame:
        """The live operator: exactly the funnel_match call the spec
        describes (the caller owns watermarking and replay/source)."""
        from nyuki_spark.streaming.stateful import funnel_match

        return funnel_match(sdf, **self.funnel_kwargs)


def compile_cep_pattern(spec: dict | str) -> CepPattern:
    """Validate + compile a CEP pattern spec (compilation IS validation,
    like :func:`~nyuki_spark.plans.spec.compile_pipeline`)."""
    if isinstance(spec, str):
        spec = json.loads(spec)
    listing = validate_cep_spec(spec)
    if listing:
        raise SpecError(
            f"invalid CEP spec: {len(listing)} error(s): "
            + "; ".join(f"{e['path'] or '<root>'}: {e['message']}" for e in listing),
            errors=listing,
        )
    key_col = spec.get("key", "user_id")
    ts_col = spec.get("ts", "ts")
    type_col = spec.get("type", "event_type")
    within_us = int(spec.get("within_us", 7 * 86_400_000_000))
    absent = spec.get("absent")
    ttl = spec.get("tombstone_ttl_us")
    steps_spec = spec["steps"]
    step_types: list[tuple[str, ...]] = [
        (st["types"],) if isinstance(st["types"], str) else tuple(st["types"])
        for st in steps_spec
    ]
    min_counts = tuple(int(st.get("min", 1)) for st in steps_spec)
    max_counts = tuple(
        int(st["max"]) if st.get("max") is not None else None for st in steps_spec
    )
    value_name = spec.get("value")
    preds = tuple(
        (int(p["left"]), p["op"], int(p["right"]))
        for p in spec.get("predicates", [])
    )
    funnel_kwargs = {
        "steps": tuple(
            ts[0] if len(ts) == 1 else ts for ts in step_types
        ),
        "key_col": key_col,
        "ts_col": ts_col,
        "type_col": type_col,
        "within_us": within_us,
        "absent": absent,
        "tombstone_ttl_us": ttl,
        "min_counts": min_counts,
        "max_counts": max_counts,
        "value_col": value_name,
        "cross_predicates": preds or None,
    }
    k = len(step_types)

    def batch(df: DataFrame) -> DataFrame:
        """Single-epoch batch compilation — see module docstring. All
        comparisons run on microsecond epoch longs (the exact arithmetic
        funnel_match buffers), converted back to timestamps at the end."""
        if ttl is not None:
            raise ValueError(
                "batch() compiles the single-epoch semantics; a "
                "tombstone-TTL pattern's batch twin is a data-span-"
                "dependent epoch unroll — run it streaming, or unroll "
                "epochs by hand (see stream_cep_ttl_live's oracle)"
            )
        from pyspark.sql.window import Window

        ev = df.select(
            F.col(key_col).alias("_k"),
            # ts may be TIMESTAMP_NTZ (the catalog conversion);
            # unix_micros needs TIMESTAMP — sessions are pinned UTC, so
            # the cast is the identity epoch.
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
            F.col(type_col).alias("_ty"),
            *(
                [F.col(value_name).cast("double").alias("_v")]
                if value_name is not None
                else []
            ),
        )
        cur = (
            ev.where(F.col("_ty").isin(list(step_types[0])))
            .groupBy("_k")
            .agg(F.min("_us").alias("_anchor"))
            .withColumn("_hi", F.col("_anchor") + F.lit(within_us))
        )
        if preds:
            # Backtracking search, rendered relationally: k-way
            # self-join over the window with the predicates applied,
            # then the lexicographically earliest (t1, .., tk) per key
            # — exactly funnel_match's DFS outcome. Join blowup is
            # bounded by the per-key window population (the same n the
            # DFS walks), and every join is key-partitioned.
            joined = cur
            for i, types in enumerate(step_types):
                ei = ev.where(F.col("_ty").isin(list(types))).select(
                    "_k",
                    F.col("_us").alias(f"_t{i}"),
                    F.col("_v").alias(f"_v{i}"),
                )
                lo = (
                    F.col(f"_t{i}") >= F.col("_anchor")
                    if i == 0
                    else F.col(f"_t{i}") > F.col(f"_t{i - 1}")
                )
                joined = joined.join(ei, "_k").where(
                    lo & (F.col(f"_t{i}") <= F.col("_hi"))
                )
            _OPCOL = {
                "<": "__lt__", "<=": "__le__", ">": "__gt__",
                ">=": "__ge__", "==": "__eq__", "!=": "__ne__",
            }
            for left, op, right in preds:
                joined = joined.where(
                    getattr(F.col(f"_v{left - 1}"), _OPCOL[op])(
                        F.col(f"_v{right - 1}")
                    )
                )
            if absent is not None:
                bad = (
                    ev.where(F.col("_ty") == absent)
                    .join(cur.select("_k", "_anchor", "_hi"), "_k")
                    .where(
                        (F.col("_us") > F.col("_anchor"))
                        & (F.col("_us") <= F.col("_hi"))
                    )
                    .select("_k")
                    .distinct()
                )
                joined = joined.join(bad, "_k", "left_anti")
            w = Window.partitionBy("_k").orderBy(
                *[F.col(f"_t{i}") for i in range(k)]
            )
            best = joined.withColumn(
                "_rn", F.row_number().over(w)
            ).where(F.col("_rn") == 1)
            return best.select(
                F.col("_k").alias(key_col),
                *[
                    F.timestamp_micros(F.col(f"_t{i}")).alias(f"step{i + 1}_ts")
                    for i in range(k)
                ],
            )
        for i, types in enumerate(step_types):
            lo = F.col("_anchor") if i == 0 else F.col(f"_sat{i - 1}")
            in_interval = (
                (F.col("_us") >= lo) if i == 0 else (F.col("_us") > lo)
            ) & (F.col("_us") <= F.col("_hi"))
            cand = (
                ev.where(F.col("_ty").isin(list(types)))
                .join(cur, "_k")
                .where(in_interval)
            )
            w = Window.partitionBy("_k").orderBy("_us")
            wc = Window.partitionBy("_k")
            ranked = cand.select(
                "_k",
                "_us",
                F.row_number().over(w).alias("_rn"),
                F.count(F.lit(1)).over(wc).alias("_cnt"),
            )
            sat = ranked.where(F.col("_rn") == min_counts[i])
            if max_counts[i] is not None:
                sat = sat.where(F.col("_cnt") <= max_counts[i])
            cur = cur.join(
                sat.select("_k", F.col("_us").alias(f"_sat{i}")), "_k"
            )
        if absent is not None:
            bad = (
                ev.where(F.col("_ty") == absent)
                .join(cur.select("_k", "_anchor", "_hi"), "_k")
                .where(
                    (F.col("_us") > F.col("_anchor"))
                    & (F.col("_us") <= F.col("_hi"))
                )
                .select("_k")
                .distinct()
            )
            cur = cur.join(bad, "_k", "left_anti")
        return cur.select(
            F.col("_k").alias(key_col),
            *[
                F.timestamp_micros(F.col(f"_sat{i}")).alias(f"step{i + 1}_ts")
                for i in range(k)
            ],
        )

    return CepPattern(
        name=spec.get("name", "<anonymous>"),
        version=int(spec.get("version", 1)),
        funnel_kwargs=funnel_kwargs,
        batch=batch,
    )
