"""Extension queries beyond the 61 declared ones (SURVEY.md §2.10/§2.9).

These grow the engine's checked surface: LLM-pipeline operators, text
analysis, and live Structured Streaming counterparts of the batch-checkable
streaming queries. Oracle-backed where DuckDB can express the semantics;
rows-only (no oracle) otherwise.

Populated incrementally; every entry added here automatically shows up in
``__spark_entry__.queries()`` and the pytest oracle harness.
"""

from __future__ import annotations
