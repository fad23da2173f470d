"""Cross-engine result comparison (engine vs DuckDB oracle).

Normalisation contract (SURVEY.md Appendix B, validated 59/59 at two scale
factors):

- Decimal -> ``f"{v:.6f}"`` with trailing zeros stripped
- float   -> round(v, 6), fixed 6-dec format, trailing zeros stripped; NaN -> "NaN"
- datetime -> ``%Y-%m-%d %H:%M:%S.%f`` (µs)
- date -> ``%Y-%m-%d``; bool -> "true"/"false"; None -> "NULL"; else str(v)

Both result sets are fetched through Arrow (``DataFrame.toArrow()`` /
``duckdb .arrow()``) so None-vs-NaN is preserved exactly on both sides.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math
from dataclasses import dataclass

__all__ = ["normalize_value", "normalize_rows", "fetch_spark", "fetch_duckdb", "compare"]


def normalize_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, decimal.Decimal):
        s = f"{v:.6f}".rstrip("0").rstrip(".")
        return s if s not in ("", "-0") else "0"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        s = f"{round(v, 6):.6f}".rstrip("0").rstrip(".")
        return s if s not in ("", "-0") else "0"
    if isinstance(v, _dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, _dt.date):
        return v.strftime("%Y-%m-%d")
    return str(v)


def normalize_rows(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    return [tuple(normalize_value(v) for v in row) for row in rows]


def _arrow_to_rows(tbl) -> tuple[list[str], list[tuple]]:
    cols = tbl.column_names
    pyrows = tbl.to_pylist()
    return cols, [tuple(r[c] for c in cols) for r in pyrows]


def fetch_spark(df) -> tuple[list[str], list[tuple]]:
    """Collect a Spark DataFrame via Arrow, preserving nulls and Decimals."""
    return _arrow_to_rows(df.toArrow())


def fetch_duckdb(con, sql: str) -> tuple[list[str], list[tuple]]:
    return _arrow_to_rows(con.execute(sql).arrow())


@dataclass
class CompareResult:
    ok: bool
    detail: str = ""


def compare(
    engine_cols: list[str],
    engine_rows: list[tuple],
    oracle_cols: list[str],
    oracle_rows: list[tuple],
    ordered: bool = True,
) -> CompareResult:
    if [c.lower() for c in engine_cols] != [c.lower() for c in oracle_cols]:
        return CompareResult(False, f"column mismatch: {engine_cols} vs {oracle_cols}")
    if len(engine_rows) != len(oracle_rows):
        return CompareResult(
            False, f"row count mismatch: {len(engine_rows)} vs {len(oracle_rows)}"
        )
    e = normalize_rows(engine_cols, engine_rows)
    o = normalize_rows(oracle_cols, oracle_rows)
    if not ordered:
        e, o = sorted(e), sorted(o)
    for i, (er, orow) in enumerate(zip(e, o)):
        if er != orow:
            return CompareResult(False, f"first diff at row {i}: engine={er} oracle={orow}")
    return CompareResult(True)
