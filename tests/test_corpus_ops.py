"""Unit tests for PII redaction (functions/text.py) and deterministic
sampling / source mixing (operators/sample.py) on crafted rows — the
registry queries cover the oracle parity; these cover edge semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def _redact_one(spark, s: str) -> str:
    from nyuki_spark.functions.text import redact_pii

    df = spark.createDataFrame([Row(t=s)])
    return df.select(redact_pii("t").alias("r")).head().r


@pytest.mark.parametrize(
    "raw,want",
    [
        ("mail a.b+c_d@sub.example.co today", "mail <EMAIL> today"),
        ("ssn 123-45-6789.", "ssn <SSN>."),
        ("call 555-867-5309 or 555.867.5309", "call <PHONE> or <PHONE>"),
        ("from 10.0.200.7 and 192.168.1.1", "from <IP> and <IP>"),
        ("x@y.io at 1.2.3.4 ssn 111-22-3333", "<EMAIL> at <IP> ssn <SSN>"),
        ("no pii here 12345", "no pii here 12345"),
    ],
)
def test_redact_pii_cases(spark, raw, want):
    assert _redact_one(spark, raw) == want


def test_pii_counts_on_original_text(spark):
    from nyuki_spark.functions.text import pii_counts

    df = spark.createDataFrame([Row(t="a@b.co c@d.io ip 1.2.3.4")])
    got = df.select(*pii_counts("t")).head()
    assert (got.n_email, got.n_ssn, got.n_phone, got.n_ipv4) == (2, 0, 0, 1)


def test_deterministic_sample_reproducible_and_nested(spark):
    from nyuki_spark.operators.sample import deterministic_sample

    df = spark.range(0, 5000).withColumnRenamed("id", "k")
    s20a = {r.k for r in deterministic_sample(df, "k", 0.2).collect()}
    s20b = {r.k for r in deterministic_sample(df.repartition(7), "k", 0.2).collect()}
    assert s20a == s20b  # partition layout can't change the sample
    s10 = {r.k for r in deterministic_sample(df, "k", 0.1).collect()}
    assert s10 <= s20a  # nested rates compose
    assert 0.15 < len(s20a) / 5000 < 0.25  # roughly the asked-for rate


def test_salt_gives_independent_draws(spark):
    from nyuki_spark.operators.sample import deterministic_sample

    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    a = {r.k for r in deterministic_sample(df, "k", 0.5, salt="train").collect()}
    b = {r.k for r in deterministic_sample(df, "k", 0.5, salt="other").collect()}
    assert a != b
    overlap = len(a & b) / max(len(a), 1)
    assert 0.3 < overlap < 0.7  # independent ~50% draws overlap ~50%


def test_mix_sources_rates_and_default(spark):
    from nyuki_spark.operators.sample import mix_sources

    rows = [Row(k=i, source="keep" if i % 2 else "drop") for i in range(1000)]
    df = spark.createDataFrame(rows)
    out = mix_sources(df, {"keep": 1.0, "drop": 0.0}, key="k")
    got = out.groupBy("source").count().collect()
    assert {r.source: r["count"] for r in got} == {"keep": 500}
    # default_rate applies to unlisted groups
    out2 = mix_sources(df, {}, key="k", default_rate=1.0)
    assert out2.count() == 1000
