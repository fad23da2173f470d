"""gapfill_locf semantics on crafted rows."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row


def _t(h: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, h, 0, 0)


def test_gapfill_locf_fills_only_interior_gaps(spark):
    from nyuki_spark.operators.timeseries import gapfill_locf

    rows = [
        Row(k=1, ts=_t(0).replace(minute=10), v=10.0),
        Row(k=1, ts=_t(0).replace(minute=40), v=30.0),  # same bucket: avg 20
        Row(k=1, ts=_t(3), v=7.0),  # hours 1-2 are gaps
        Row(k=2, ts=_t(5), v=1.0),  # single-bucket key: no gaps
    ]
    df = spark.createDataFrame(rows)
    out = {
        (r.k, r.h.hour): (r.v, r.v_filled)
        for r in gapfill_locf(df, "k", "ts", "v").collect()
    }
    assert out[(1, 0)] == (20.0, 20.0)
    assert out[(1, 1)] == (None, 20.0)  # generated, carried forward
    assert out[(1, 2)] == (None, 20.0)
    assert out[(1, 3)] == (7.0, 7.0)
    assert out[(2, 5)] == (1.0, 1.0)
    assert len(out) == 5  # grid spans each key's own bounds only
