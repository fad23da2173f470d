"""Parquet sink layout control: partitioned writes, file sizing, small-file
compaction, and Z-order clustering (SURVEY.md §2.1 sink surface).

At 100 TB the dominant sink problems are (a) file counts — too many small
files kill the driver and the object store, too few kill parallelism —
and (b) data layout — row-group min/max stats only prune scans if rows
with nearby keys land in the same files. These helpers make both explicit:

- :func:`write_partitioned` — directory partitioning + bounded file sizes
  via ``maxRecordsPerFile`` (Spark enforces it per task, so the knob holds
  at any executor count).
- :func:`compact` — rewrite a directory of small files into ~target-sized
  ones; the everyday maintenance op behind streaming sinks.
- :func:`zvalue` / :func:`zorder_by` — multi-dimensional clustering by
  bit-interleaved Z-curve (Morton order, public technique used by Delta
  Lake OPTIMIZE ZORDER and Databricks' liquid clustering ancestors): sort
  by the interleaved key and *every* prefix dimension gets useful row-group
  stats, so filters on any clustered column skip files. Pure ``Column``
  bit arithmetic — codegen'd, no UDF — and the sort is
  ``repartitionByRange`` + ``sortWithinPartitions``: a range shuffle, never
  a global single-partition sort.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["zvalue", "zvalue_sql", "zorder_by", "write_partitioned", "compact"]


def zvalue(cols: list[Column | str], bits: int = 16) -> Column:
    """Bit-interleaved Z-curve key over N non-negative integer columns.

    Bit ``b`` of column ``i`` lands at output bit ``b * N + i``, so the
    result orders data along the Morton curve. ``N * bits`` must be ≤ 63
    (BIGINT). Callers bucket floats/strings to ints first (e.g.
    ``F.hash(col) % 1024`` or quantile buckets); inputs are masked to
    ``bits`` bits, so out-of-range values wrap rather than corrupt
    neighbors. The expansion is ``N * bits`` shift-and-mask terms — all
    JVM-side in one codegen stage.
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds 63-bit BIGINT")
    out = F.lit(0).cast("bigint")
    for i, c in enumerate(cols):
        col = (F.col(c) if isinstance(c, str) else c).cast("bigint")
        for b in range(bits):
            out = out + F.shiftleft(
                F.shiftright(col, b).bitwiseAND(F.lit(1)), b * n + i
            )
    return out


def zvalue_sql(cols: list[str], bits: int = 16) -> str:
    """The identical Z-value as portable SQL text (runs on DuckDB too) —
    the oracle twin of :func:`zvalue`, kept adjacent so the two stay in
    lockstep."""
    n = len(cols)
    terms = [
        f"(({c} >> {b}) & 1) * {1 << (b * n + i)}"
        for i, c in enumerate(cols)
        for b in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def zorder_by(
    df: DataFrame,
    cols: list[Column | str],
    bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Cluster rows along the Z-curve of ``cols``.

    ``repartitionByRange`` on the Z-value splits the curve into contiguous
    segments (one per output file/partition) and ``sortWithinPartitions``
    orders inside each — so every output file covers a small hyper-rectangle
    of the clustered dimensions and its parquet min/max stats prune reads
    filtered on ANY of them. Range boundaries come from Spark's reservoir
    sample: no single-partition stage at any scale.
    """
    z = zvalue(cols, bits).alias("__z")
    out = df.withColumn("__z", z)
    if num_partitions:
        out = out.repartitionByRange(num_partitions, "__z")
    else:
        out = out.repartitionByRange("__z")
    return out.sortWithinPartitions("__z").drop("__z")


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    zorder: list[str] | None = None,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Partitioned, size-bounded, optionally Z-ordered parquet write.

    ``partition_by`` gives coarse directory pruning (query planner skips
    whole directories); ``zorder`` gives fine row-group pruning inside
    each directory; ``max_records_per_file`` bounds file size per write
    task — together they are the three layout levers a 100 TB table needs.
    """
    if zorder:
        df = zorder_by(df, list(zorder))
    w = df.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def _dir_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a local parquet directory tree."""
    n, size = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                size += os.path.getsize(os.path.join(root, f))
    return n, size


def compact(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_mb: int = 128,
    partition_by: list[str] | None = None,
) -> dict:
    """Rewrite a small-file parquet directory into ~``target_mb`` files.

    Reads the existing layout, computes the output file count from actual
    bytes (never from row counts — row width varies), and rewrites with a
    shuffle-free ``coalesce``. Writes to a NEW directory: atomic swap is
    the caller's rename (object stores don't do in-place atomically, and
    pretending otherwise loses data on failure). Returns before/after file
    counts so maintenance jobs can log their effect.

    ``partition_by``: pass the table's directory-partition columns to keep
    them as directories in the output (a flat rewrite would inline them
    into the files and lose planner-level directory pruning). With
    partitions the file-count bound applies per write task via
    ``maxRecordsPerFile``-free coalesce, so heavily partitioned tables may
    still produce one file per (task, partition) — the parquet contract.
    """
    n_in, bytes_in = _dir_stats(in_path)
    n_out = max(1, math.ceil(bytes_in / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(in_path)
    w = df.coalesce(n_out).write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(out_path)
    n_written, bytes_out = _dir_stats(out_path)
    return {
        "files_in": n_in,
        "bytes_in": bytes_in,
        "files_out": n_written,
        "bytes_out": bytes_out,
    }
