"""File-source smoke tests (SURVEY.md §2.1): CSV/JSON with explicit
schemas, plus the map-function surface (§2.7) that has no fixture column.

No CSV/JSON fixtures exist, so these round-trip through the fixture
parquet: write out, read back with a declared schema, compare. Explicit
schemas are the point — schema inference is a full extra pass over 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nyuki_spark.catalog import load_table


def test_csv_roundtrip_explicit_schema(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_csv")
    nation.write.option("header", True).csv(path)
    schema = "n_nationkey int, n_name string, n_regionkey int, n_comment string"
    back = spark.read.schema(schema).option("header", True).csv(path)
    assert back.schema.simpleString() == (
        "struct<n_nationkey:int,n_name:string,n_regionkey:int,n_comment:string>"
    )
    assert sorted(r.n_nationkey for r in back.collect()) == sorted(
        r.n_nationkey for r in nation.collect()
    )


def test_json_roundtrip_and_from_json(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").limit(200)
    path = str(tmp_path / "events_json")
    events.write.json(path)
    back = spark.read.schema(events.schema).json(path)
    assert back.count() == 200
    # Per-topic JSON payload decode at the edge (SURVEY §1.1): props is a
    # schema-less JSON string until a pipeline declares its schema.
    k = back.select(
        F.from_json("props", "k int").alias("p")
    ).select("p.k")
    vals = [r.k for r in k.collect()]
    assert all(v is not None for v in vals)


def test_map_functions_surface(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b"], [10, 20])], "id int, ks array<string>, vs array<int>"
    )
    out = df.select(
        F.map_from_arrays("ks", "vs").alias("m")
    ).select(
        F.element_at("m", "b").alias("b"),
        F.map_keys("m").alias("keys"),
        F.size("m").alias("n"),
    )
    row = out.head()
    assert row.b == 20 and row.keys == ["a", "b"] and row.n == 2


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC is a first-class columnar source in Spark (no extra package):
    schema survives a round trip and predicates reach the ORC scan
    (searchArgument pushdown), same as parquet."""
    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc")
    orders.write.orc(path)
    back = spark.read.orc(path)
    assert back.schema == orders.schema
    assert back.count() == orders.count()
    plan = (
        back.filter(F.col("o_totalprice") > 1000.0)
        .select("o_orderkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # Filter pushed to the ORC scan + column-pruned read schema.
    assert "PushedFilters: [" in plan and "o_totalprice" in plan
    assert "ReadSchema" in plan


def test_text_and_binaryfile_sources(spark, tmp_path):
    """`text` reads lines as a 1-column DataFrame (raw-corpus ingestion);
    `binaryFile` reads whole files as (path, modificationTime, length,
    content) — the opaque-blob entry point for multimodal payloads."""
    p = tmp_path / "docs"
    p.mkdir()
    (p / "a.txt").write_text("alpha\nbeta\n")
    (p / "b.txt").write_text("gamma\n")
    lines = spark.read.text(str(p))
    assert sorted(r.value for r in lines.collect()) == [
        "alpha",
        "beta",
        "gamma",
    ]
    blobs = spark.read.format("binaryFile").load(str(p))
    rows = {r.path.rsplit("/", 1)[-1]: bytes(r.content) for r in blobs.collect()}
    assert rows["a.txt"] == b"alpha\nbeta\n"
    assert rows["b.txt"] == b"gamma\n"
    assert set(blobs.columns) == {"path", "modificationTime", "length", "content"}


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """A table whose newer files gained a column reads as the unified
    schema with NULL backfill under mergeSchema — the append-only corpus
    evolution path (new metadata columns arrive without a rewrite)."""
    p = tmp_path / "evo"
    spark.createDataFrame([(1, "a")], "id int, name string").write.parquet(
        str(p / "batch=1")
    )
    spark.createDataFrame(
        [(2, "b", 0.9)], "id int, name string, quality double"
    ).write.parquet(str(p / "batch=2"))
    df = spark.read.option("mergeSchema", "true").parquet(
        str(p / "batch=1"), str(p / "batch=2")
    )
    assert set(df.columns) == {"id", "name", "quality"}
    rows = {r["id"]: (r["name"], r["quality"]) for r in df.collect()}
    assert rows == {1: ("a", None), 2: ("b", 0.9)}


def test_partition_pruning_reaches_scan(spark, tmp_path):
    """A filter on a hive-partition column must resolve to the scan's
    PartitionFilters (directory pruning), not a post-scan row Filter —
    the property scan_partition_pruning's docstring promises. Asserted
    on the formatted plan of the same partitioned-write -> filtered-read
    shape the query runs."""
    p = str(tmp_path / "part")
    spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "a", 3.0)],
        "id int, k string, v double",
    ).write.partitionBy("k").parquet(p)
    df = spark.read.parquet(p).where("k = 'a'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # The partition predicate must appear inside PartitionFilters...
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("k" in ln for ln in pf), pf
    # ...and the result must actually prune: only partition 'a' rows.
    assert sorted(r["id"] for r in df.collect()) == [1, 3]
