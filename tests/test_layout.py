"""Sink layout: Z-order clustering, partitioned/sized writes, compaction."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F


def _interleave2(x: int, y: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zvalue_matches_reference_interleave(spark):
    from nyuki_spark.sources.layout import zvalue

    rows = [Row(x=x, y=y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows)
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", zvalue(["x", "y"], bits=3).alias("z")).collect()
    }
    for (x, y), z in got.items():
        assert z == _interleave2(x, y, 3), (x, y)
    assert len(set(got.values())) == 64  # bijective on the grid


def test_zvalue_rejects_overflow(spark):
    from nyuki_spark.sources.layout import zvalue

    import pytest

    with pytest.raises(ValueError):
        zvalue(["a", "b"], bits=32)  # 64 > 63 bits


def test_zorder_by_clusters_both_dims(spark):
    """After Z-ordering, each range partition spans a small box in (x, y):
    per-file min/max stats on BOTH dims stay tight (that's the pruning
    property), unlike a sort on x alone where y stays full-range."""
    from nyuki_spark.sources.layout import zorder_by

    n = 64
    rows = [Row(x=x, y=y, payload=x * n + y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows)
    parts = (
        zorder_by(df, ["x", "y"], bits=6, num_partitions=16)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .collect()
    )
    assert sum(p.cnt for p in parts) == n * n
    # average per-partition span must be far below the full extent (63);
    # a single-dim sort would leave the other dim's span at ~63 everywhere.
    avg_sx = sum(p.sx for p in parts) / len(parts)
    avg_sy = sum(p.sy for p in parts) / len(parts)
    assert avg_sx < 40 and avg_sy < 40, (avg_sx, avg_sy)


def test_write_partitioned_dirs_and_file_bounds(spark, tmp_path):
    from nyuki_spark.sources.layout import write_partitioned

    df = spark.createDataFrame(
        [Row(k=i, grp="a" if i % 2 else "b", v=float(i)) for i in range(1000)]
    )
    out = str(tmp_path / "t")
    write_partitioned(
        df, out, partition_by=["grp"], zorder=["k"], max_records_per_file=100
    )
    assert sorted(
        d for d in os.listdir(out) if d.startswith("grp=")
    ) == ["grp=a", "grp=b"]
    back = spark.read.parquet(out)
    assert back.count() == 1000
    # partition filter prunes directories at plan time
    filtered = back.where("grp = 'a'")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "grp" in plan
    # maxRecordsPerFile held per task: no file exceeds the bound
    for root, _dirs, files in os.walk(out):
        for f in files:
            if f.endswith(".parquet"):
                n = spark.read.parquet(os.path.join(root, f)).count()
                assert n <= 100


def test_compact_reduces_file_count(spark, tmp_path):
    from nyuki_spark.sources.layout import compact

    src = str(tmp_path / "small")
    dst = str(tmp_path / "big")
    spark.range(0, 10000).repartition(40).write.parquet(src)
    stats = compact(spark, src, dst, target_mb=128)
    assert stats["files_in"] == 40
    assert stats["files_out"] == 1  # tiny data -> single target-size file
    assert spark.read.parquet(dst).count() == 10000


def test_compact_preserves_directory_partitions(spark, tmp_path):
    from nyuki_spark.sources.layout import compact

    src = str(tmp_path / "psrc")
    dst = str(tmp_path / "pdst")
    df = spark.createDataFrame(
        [Row(k=i, grp="a" if i % 2 else "b") for i in range(2000)]
    )
    df.repartition(20).write.partitionBy("grp").parquet(src)
    compact(spark, src, dst, target_mb=128, partition_by=["grp"])
    assert sorted(
        d for d in os.listdir(dst) if d.startswith("grp=")
    ) == ["grp=a", "grp=b"]
    back = spark.read.parquet(dst)
    assert back.count() == 2000
    assert {r.grp for r in back.select("grp").distinct().collect()} == {"a", "b"}
