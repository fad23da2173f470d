"""The zipimport mtime guard (sitecustomize.py) must reach Python workers.

PySpark calls ``importlib.invalidate_caches()`` at the start of every task;
stock CPython 3.11 re-parses every zip archive on sys.path each time
(~154 ms/task measured on this rig — see sitecustomize.py). get_session()
ships the guard by prepending the repo root to the env PYTHONPATH before
the JVM launches; these tests pin both the shipping mechanism and the
guard's semantics (an actually-changed archive must still invalidate).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_repo_root_on_pythonpath_after_get_session(spark):
    # The session fixture went through get_session(), which must have
    # exported the repo root for worker interpreters.
    assert REPO_ROOT in os.environ.get("PYTHONPATH", "").split(os.pathsep)


def test_guard_active_inside_worker(spark):
    def chk(it):
        import zipimport

        import pandas as pd

        for pdf in it:
            yield pd.DataFrame(
                {"ok": [bool(getattr(zipimport, "_nyuki_mtime_guard", False))] * len(pdf)}
            )

    rows = (
        spark.range(0, 4, 1, 4).mapInPandas(chk, "ok boolean").collect()
    )
    assert rows and all(r.ok for r in rows)


def test_guard_still_invalidates_changed_archive(tmp_path):
    # Run in a subprocess with the guard installed via PYTHONPATH, exactly
    # like a worker: an unchanged zip skips the re-parse; a REPLACED zip
    # (new mtime/size) must re-read the directory and expose new modules.
    script = tmp_path / "probe.py"
    script.write_text(
        """
import os, sys, time, zipfile, zipimport, importlib

assert getattr(zipimport, "_nyuki_mtime_guard", False), "guard not installed"

zpath = sys.argv[1]
with zipfile.ZipFile(zpath, "w") as z:
    z.writestr("m_one.py", "X = 1")
imp = zipimport.zipimporter(zpath)
assert imp.find_spec("m_one") is not None
assert imp.find_spec("m_two") is None

# First call on a fresh importer records the (mtime, size) signature
# (it may re-parse once); after that, an unchanged archive is a
# stat-only no-op.
imp.invalidate_caches()
sig_before = imp._files
imp.invalidate_caches()
assert imp._files is sig_before, "unchanged zip should not re-parse"

# Changed archive: must re-parse and see the new module.
time.sleep(0.01)
with zipfile.ZipFile(zpath, "w") as z:
    z.writestr("m_one.py", "X = 1")
    z.writestr("m_two.py", "Y = 2")
os.utime(zpath, (time.time() + 5, time.time() + 5))
imp.invalidate_caches()
assert imp.find_spec("m_two") is not None, "changed zip must invalidate"
print("OK")
"""
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO_ROOT
    out = subprocess.run(
        [sys.executable, str(script), str(tmp_path / "probe.zip")],
        capture_output=True,
        text=True,
        env=env,
        timeout=60,
    )
    assert out.returncode == 0, out.stderr
    assert "OK" in out.stdout
