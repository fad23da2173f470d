"""CDC upsert_snapshot edge semantics on crafted rows."""

from __future__ import annotations

from pyspark.sql import Row


def test_upsert_replaces_deletes_and_inserts(spark):
    from nyuki_spark.operators.cdc import upsert_snapshot

    base = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")]
    )
    changes = spark.createDataFrame(
        [
            Row(k=2, v="B", is_delete=False),   # update
            Row(k=3, v=None, is_delete=True),   # delete
            Row(k=4, v="d", is_delete=False),   # insert (new key)
            Row(k=9, v=None, is_delete=True),   # delete of absent key: no-op
        ]
    )
    snap = upsert_snapshot(base, changes, ["k"], delete_col="is_delete")
    got = {r.k: r.v for r in snap.collect()}
    assert got == {1: "a", 2: "B", 4: "d"}
    assert "is_delete" not in snap.columns


def test_upsert_without_delete_col(spark):
    from nyuki_spark.operators.cdc import upsert_snapshot

    base = spark.createDataFrame([Row(k=1, v=10), Row(k=2, v=20)])
    changes = spark.createDataFrame([Row(k=2, v=99)])
    got = {r.k: r.v for r in upsert_snapshot(base, changes, ["k"]).collect()}
    assert got == {1: 10, 2: 99}
