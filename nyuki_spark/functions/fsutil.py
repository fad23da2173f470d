"""Driver-side filesystem helpers that go through Spark's Hadoop
FileSystem layer (r7 advice / verdict #3).

The IVF maintenance path (compaction census, build/append idempotence
markers) needs a handful of tiny metadata operations — list a bounded
cell directory, check a marker, write a marker. ``os.listdir``/``open``
silently restrict those to driver-local paths; on the HDFS/S3 object
stores the index docstrings describe they just break. Everything here
resolves the path's own filesystem via
``Path.getFileSystem(hadoopConf)`` — the same resolution
``spark.read.parquet`` uses — so local paths keep byte-identical
behavior while ``hdfs://`` / ``s3a://`` URIs work unchanged.

All calls are driver-side py4j round trips over BOUNDED listings (one
status call per cell directory, cell count is the fixed index
parameter); nothing here touches data-sized paths.
"""

from __future__ import annotations


def _fs_and_path(spark, path_str: str):
    """(FileSystem, Path) for ``path_str``, resolved against the
    session's Hadoop configuration — local paths get the local FS,
    URIs get their scheme's FS."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def fs_exists(spark, path_str: str) -> bool:
    """Hadoop-FS existence check (marker files, _SUCCESS sentinels)."""
    fs, jpath = _fs_and_path(spark, path_str)
    return bool(fs.exists(jpath))


def fs_write_marker(spark, path_str: str, content: str = "ok") -> None:
    """Atomically-enough create a small marker file (overwrite=True —
    markers are idempotence flags, last write wins)."""
    fs, jpath = _fs_and_path(spark, path_str)
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def list_subdirs(spark, dir_str: str) -> list:
    """Names of the immediate child DIRECTORIES of ``dir_str`` (empty if
    the path is missing). One listStatus — callers use it for
    partition-style layouts (``batch_id=N``, ``cell=N``) whose child
    count is bounded by design, never data-sized."""
    fs, jpath = _fs_and_path(spark, dir_str)
    if not fs.exists(jpath):
        return []
    return [
        st.getPath().getName() for st in fs.listStatus(jpath) if st.isDirectory()
    ]


def list_cell_file_counts(spark, vec_dir: str, suffix: str = ".parquet") -> dict:
    """Per-``cell=N`` data-file census of a partitioned layout:
    {"cell=3": 2, ...}. One listStatus per cell directory — bounded by
    the index's cell count, never by corpus size."""
    fs, jpath = _fs_and_path(spark, vec_dir)
    counts: dict[str, int] = {}
    if not fs.exists(jpath):
        return counts
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("cell=")):
            continue
        n = 0
        for f in fs.listStatus(st.getPath()):
            if f.getPath().getName().endswith(suffix):
                n += 1
        counts[name] = n
    return counts
