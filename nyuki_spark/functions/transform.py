"""Factory transform rules — the reference's per-event payload transforms.

The reference applies ordered rule lists to JSON payloads (upstream
`nyuki/utils/transform.py` rule classes applied by
`nyuki/workflow/tasks/factory.py` — mount empty, SURVEY.md §0): *extract* a
regex group into a field, regex-*sub* within a field, *set*/*unset* fields,
*lookup* a value through a stored table. There, each rule is an imperative
dict mutation on one event at a time.

Here each rule compiles to a Column expression and a rule chain composes
into ONE projection: Catalyst collapses consecutive withColumns, so a
50-rule chain is still a single codegen'd map stage over the scan — no
per-rule pass, no Python in the loop, works identically on batch and
streaming DataFrames. Lookup tables small enough to inline become MapType
literals (pure expression); larger ones become broadcast joins.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["Extract", "Sub", "Set", "Unset", "Lookup", "RuleChain"]


class Rule:
    """A payload transform rule; subclasses compile to DataFrame ops."""

    def apply(self, df: DataFrame) -> DataFrame:  # pragma: no cover
        raise NotImplementedError


@dataclass(frozen=True)
class Extract(Rule):
    """Set ``fieldname`` to the first match group of ``pattern`` in ``src``
    (src defaults to the field itself — in-place extract)."""

    fieldname: str
    pattern: str
    group: int = 1
    src: str | None = None

    def apply(self, df: DataFrame) -> DataFrame:
        src = self.src if self.src is not None else self.fieldname
        return df.withColumn(
            self.fieldname, F.regexp_extract(F.col(src), self.pattern, self.group)
        )


@dataclass(frozen=True)
class Sub(Rule):
    """Regex-substitute within ``fieldname`` (all occurrences, like the
    reference's re.sub default count=0)."""

    fieldname: str
    pattern: str
    repl: str

    def apply(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            self.fieldname, F.regexp_replace(F.col(self.fieldname), self.pattern, self.repl)
        )


@dataclass(frozen=True)
class Set(Rule):
    """Set ``fieldname`` to a literal value (overwrites or creates)."""

    fieldname: str
    value: object = None

    def apply(self, df: DataFrame) -> DataFrame:
        return df.withColumn(self.fieldname, F.lit(self.value))


@dataclass(frozen=True)
class Unset(Rule):
    """Drop ``fieldname`` from the payload."""

    fieldname: str

    def apply(self, df: DataFrame) -> DataFrame:
        return df.drop(self.fieldname)


@dataclass(frozen=True)
class Lookup(Rule):
    """Map ``fieldname`` through a value->value table; unmatched values
    pass through unchanged (the reference's lookup semantics: mutate only
    on hit).

    Inlined as a MapType literal — a pure expression, no join, no shuffle.
    For tables too big to inline, build a broadcast-join rule instead (the
    chain composes either way).
    """

    fieldname: str
    table: tuple[tuple[object, object], ...]
    icase: bool = False

    def apply(self, df: DataFrame) -> DataFrame:
        items = list(self.table)
        if self.icase:
            items = [(str(k).lower(), v) for k, v in items]
        m = F.create_map(*[F.lit(x) for x in chain.from_iterable(items)])
        key = F.lower(F.col(self.fieldname)) if self.icase else F.col(self.fieldname)
        return df.withColumn(
            self.fieldname, F.coalesce(m[key], F.col(self.fieldname))
        )


@dataclass(frozen=True)
class RuleChain:
    """Ordered rule list, applied as one composed projection."""

    rules: tuple[Rule, ...] = dc_field(default_factory=tuple)

    def apply(self, df: DataFrame) -> DataFrame:
        for rule in self.rules:
            df = rule.apply(df)
        return df

    def __call__(self, df: DataFrame) -> DataFrame:
        return self.apply(df)
