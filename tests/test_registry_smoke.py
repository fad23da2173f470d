"""Execution gate: EVERY registry entry must actually run before it counts.

Round-3 lesson: ``mm_image_stats``/``mm_audio_stats`` were registered with
docstrings claiming "oracle-verified" but crashed at execution with a
``PicklingError`` — the oracle/canon suites surfaced it, but only because
those queries happened to be oracle-backed. This gate closes the hole for
*all* 147+ registry ids, including engine_fn-only queries with no oracle:
``run(spark, sf0.001).limit(1).collect()`` forces closure pickling, schema
resolution, and at least one partition of real execution per query. A query
that cannot survive this must not be registered.

Kept deliberately cheap (limit-1 at the smallest SF) so it stays in the
default ``pytest tests/`` loop; full-result correctness lives in
``test_declared_oracle.py`` / ``test_driver_canon.py``.
"""

from __future__ import annotations

import pytest

from nyuki_spark.queries import REGISTRY

ALL_IDS = sorted(REGISTRY)


@pytest.mark.parametrize("qid", ALL_IDS)
def test_query_executes(qid, spark, sf_dir):
    df = REGISTRY[qid].run(spark, sf_dir)
    # .limit(1).collect() still submits the job: closures pickle, the plan
    # compiles, and one partition executes — exactly what the r3 bug needed.
    df.limit(1).collect()
