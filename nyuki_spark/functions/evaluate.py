"""Safe condition DSL -> Column compiler.

The reference evaluates workflow branch conditions with a whitelisted-AST
safe eval over payload fields (upstream `nyuki/utils/evaluate.py` — mount
empty, SURVEY.md §0): a condition string like ``"status == 'ok' and
retries < 3"`` runs against each event dict, with only boolean/comparison/
arithmetic nodes allowed.

This compiler keeps the exact same surface — Python expression syntax,
same operator set, same whitelist discipline — but compiles ONCE to a
Column predicate instead of interpreting per event. The predicate
participates in Catalyst optimization like any built-in expression:
pushed into parquet scans, folded, reordered. A condition that gates a
trigger on a 100 TB stream costs the same as a hand-written filter.

Whitelisted syntax: and/or/not, == != < <= > >=, in / not in (against a
literal list/tuple/set), + - * / %, unary -, literals (int, float, str,
bool, None), bare names = payload fields.
"""

from __future__ import annotations

import ast

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["compile_condition", "ConditionError"]


class ConditionError(ValueError):
    """Condition uses syntax outside the whitelist."""


_CMP = {
    ast.Eq: lambda a, b: a == b,
    ast.NotEq: lambda a, b: a != b,
    ast.Lt: lambda a, b: a < b,
    ast.LtE: lambda a, b: a <= b,
    ast.Gt: lambda a, b: a > b,
    ast.GtE: lambda a, b: a >= b,
}

_ARITH = {
    ast.Add: lambda a, b: a + b,
    ast.Sub: lambda a, b: a - b,
    ast.Mult: lambda a, b: a * b,
    ast.Div: lambda a, b: a / b,
    # Python-style modulo (sign of divisor), not Java-style: the condition
    # surface is Python-eval semantics, so -3 % 5 must be 2. pmod matches
    # for positive divisors (the practical case).
    ast.Mod: lambda a, b: F.pmod(a, b),
}


def _literal(node: ast.expr) -> object:
    if isinstance(node, ast.Constant) and (
        node.value is None or isinstance(node.value, (bool, int, float, str))
    ):
        return node.value
    raise ConditionError(f"literal expected, got {ast.dump(node)[:50]}")


def _compile(node: ast.expr) -> Column:
    if isinstance(node, ast.BoolOp):
        parts = [_compile(v) for v in node.values]
        out = parts[0]
        for p in parts[1:]:
            out = (out & p) if isinstance(node.op, ast.And) else (out | p)
        return out
    if isinstance(node, ast.UnaryOp):
        if isinstance(node.op, ast.Not):
            return ~_compile(node.operand)
        if isinstance(node.op, ast.USub):
            return -_compile(node.operand)
        raise ConditionError(f"operator not allowed: {type(node.op).__name__}")
    if isinstance(node, ast.Compare):
        left = _compile(node.left)
        out: Column | None = None
        for op, comparator in zip(node.ops, node.comparators):
            if isinstance(op, (ast.In, ast.NotIn)):
                if not isinstance(comparator, (ast.List, ast.Tuple, ast.Set)):
                    raise ConditionError("in/not in requires a literal collection")
                values = [_literal(e) for e in comparator.elts]
                term = left.isin(values)
                if isinstance(op, ast.NotIn):
                    term = ~term
            elif type(op) in _CMP:
                term = _CMP[type(op)](left, _compile(comparator))
                left = _compile(comparator)  # chained a < b < c
            else:
                raise ConditionError(f"comparison not allowed: {type(op).__name__}")
            out = term if out is None else (out & term)
        return out
    if isinstance(node, ast.BinOp):
        if type(node.op) not in _ARITH:
            raise ConditionError(f"operator not allowed: {type(node.op).__name__}")
        return _ARITH[type(node.op)](_compile(node.left), _compile(node.right))
    if isinstance(node, ast.Name):
        return F.col(node.id)
    if isinstance(node, ast.Constant):
        return F.lit(_literal(node))
    raise ConditionError(f"syntax not allowed: {type(node).__name__}")


def compile_condition(text: str) -> Column:
    """Compile a condition string to a boolean Column predicate.

    Raises :class:`ConditionError` for anything outside the whitelist —
    attribute access, calls, subscripts, comprehensions all rejected, same
    defensive posture as the reference's safe eval.
    """
    try:
        tree = ast.parse(text.strip(), mode="eval")
    except SyntaxError as e:
        raise ConditionError(f"unparseable condition: {e}") from e
    return _compile(tree.body)
