"""Reference-implementation and idempotence properties for corpus ops.

One Spark job per property over a seeded batch of adversarial inputs —
the Spark result is checked against an independent pure-Python reference
(``re`` chain), not against itself.
"""

from __future__ import annotations

import random
import re

from pyspark.sql import Row
from pyspark.sql import functions as F

_PIECES = [
    "plain words here",
    "a@b.co",
    "user.name+tag@sub.domain.example.org",
    "123-45-6789",
    "555-867-5309",
    "555.867.5309",
    "10.0.0.1",
    "999.999.999.999",  # still matches the permissive ipv4 shape
    "1.2.3",  # not an ipv4
    "12-34-5678",  # not an ssn
    "almost@an@email.com",
    "trailing dot 1.2.3.4.",
    "<EMAIL>",  # already-redacted tag must survive unchanged
    "",
]


def _py_redact(s: str) -> str:
    from nyuki_spark.functions.text import PII_RULES

    for _tag, pattern, repl in PII_RULES:
        s = re.sub(pattern, repl, s)
    return s


def test_redact_matches_python_reference_and_is_idempotent(spark):
    from nyuki_spark.functions.text import redact_pii

    rng = random.Random(42)
    texts = [
        " ".join(rng.choice(_PIECES) for _ in range(rng.randint(1, 8)))
        for _ in range(300)
    ]
    df = spark.createDataFrame([Row(i=i, t=t) for i, t in enumerate(texts)])
    got = {
        r.i: (r.r1, r.r2)
        for r in df.select(
            "i",
            redact_pii("t").alias("r1"),
            redact_pii(redact_pii("t")).alias("r2"),
        ).collect()
    }
    for i, t in enumerate(texts):
        r1, r2 = got[i]
        assert r1 == _py_redact(t), (t, r1)
        assert r2 == r1, f"not idempotent on: {t!r}"


def test_upsert_snapshot_is_idempotent(spark):
    """Applying the same change batch twice yields the same snapshot as
    once — the property that makes CDC replays safe."""
    from nyuki_spark.operators.cdc import upsert_snapshot

    rng = random.Random(7)
    base = spark.createDataFrame(
        [Row(k=i, v=rng.randint(0, 99)) for i in range(200)]
    )
    changes = spark.createDataFrame(
        [
            Row(k=k, v=1000 + k, is_delete=(k % 3 == 0))
            for k in rng.sample(range(250), 80)  # some keys absent from base
        ]
    )
    once = upsert_snapshot(base, changes, ["k"], delete_col="is_delete")
    twice = upsert_snapshot(once, changes, ["k"], delete_col="is_delete")
    a = {(r.k, r.v) for r in once.collect()}
    b = {(r.k, r.v) for r in twice.collect()}
    assert a == b


def test_hash_fraction_is_uniform_enough(spark):
    """The md5 draw feeding split/sampling decisions: mean and bucket
    occupancy of 10k draws stay near uniform (loose 3-sigma bounds)."""
    from nyuki_spark.operators.sample import hash_fraction

    df = spark.range(0, 10_000).withColumnRenamed("id", "k")
    rows = df.select(
        F.floor(hash_fraction("k") * 10).alias("b"), hash_fraction("k").alias("d")
    )
    stats = rows.agg(
        F.avg("d").alias("mean"), F.countDistinct("b").alias("nb")
    ).head()
    assert abs(stats.mean - 0.5) < 0.01
    assert stats.nb == 10
    counts = [r["count"] for r in rows.groupBy("b").count().collect()]
    assert min(counts) > 800 and max(counts) < 1200
