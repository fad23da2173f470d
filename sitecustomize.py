"""Python-worker startup tune-up, shipped to Spark workers via PYTHONPATH.

WHY THIS FILE EXISTS (r12 optimization round, guide §4 — the Python
boundary): PySpark's worker protocol calls ``importlib.invalidate_caches()``
at the start of EVERY task (``pyspark/worker_util.py:setup_spark_files``).
On CPython 3.11, ``zipimport.zipimporter.invalidate_caches()`` re-parses
the whole zip central directory UNCONDITIONALLY — and every Spark worker
has ``pyspark.zip`` (3.5 MB, thousands of entries) plus ``py4j-*.zip`` on
``sys.path``. Measured on this rig with a patched worker: **154 ms median
per task**, i.e. ~70 s of pure directory re-parsing across a 19-micro-batch
streaming query, and a fixed +150 ms on every batch Python stage (a trivial
8-task ``mapInPandas`` job dropped 0.70 s → 0.27 s per run with the guard).

THE FIX mirrors what newer CPython does upstream: only re-read a zip
importer's directory when the archive's (mtime, size) actually changed.
Semantics are preserved — a modified archive still invalidates; an
untouched archive (the 100%-of-the-time case for Spark's own zips) becomes
a stat() instead of a multi-MB parse.

Deployment: ``nyuki_spark.session.get_session`` prepends the repo root to
``os.environ["PYTHONPATH"]`` before the JVM launches, so the pyspark
daemon (and the workers forked from it) import this module at interpreter
startup via the stdlib ``site`` mechanism. Everything is wrapped in
try/except: if anything here fails, workers behave exactly as stock.
"""

try:
    import os
    import zipimport

    if not getattr(zipimport, "_nyuki_mtime_guard", False):
        _orig_invalidate_caches = zipimport.zipimporter.invalidate_caches

        def _guarded_invalidate_caches(self):
            try:
                st = os.stat(self.archive)
                sig = (st.st_mtime, st.st_size)
                if getattr(self, "_nyuki_zip_sig", None) == sig:
                    return
            except OSError:
                sig = None
            _orig_invalidate_caches(self)
            if sig is not None:
                self._nyuki_zip_sig = sig

        zipimport.zipimporter.invalidate_caches = _guarded_invalidate_caches
        zipimport._nyuki_mtime_guard = True
except Exception:  # pragma: no cover - never break interpreter startup
    pass
