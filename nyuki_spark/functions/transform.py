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

__all__ = ["Extract", "Sub", "Set", "Unset", "Lookup", "BroadcastLookup", "RuleChain"]


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


class BroadcastLookup(Rule):
    """Lookup through a DataFrame table too large to inline as a literal.

    ``table`` must have columns (key_col, value_col). Executes as a
    broadcast left-outer join + coalesce: the table ships once per
    executor (no shuffle of the event stream), unmatched values pass
    through unchanged — identical semantics to :class:`Lookup`, different
    physical strategy. The streaming side works unchanged: broadcast
    joins against static DataFrames are supported in micro-batch plans.
    """

    def __init__(self, fieldname: str, table: DataFrame, key_col: str = "key", value_col: str = "value"):
        self.fieldname = fieldname
        self.table = table
        self.key_col = key_col
        self.value_col = value_col

    def apply(self, df: DataFrame) -> DataFrame:
        lut = F.broadcast(
            self.table.select(
                F.col(self.key_col).alias("__lk"),
                F.col(self.value_col).alias("__lv"),
            ).dropDuplicates(["__lk"])
        )
        joined = df.join(lut, df[self.fieldname] == lut["__lk"], "left")
        return joined.withColumn(
            self.fieldname, F.coalesce(F.col("__lv"), F.col(self.fieldname))
        ).drop("__lk", "__lv")
