"""BPE merge-loop cost growth probe (r7 next-round #6).

Times the generalized _bpe_fn at k in {3, 8, 16} merges at sf0.1 —
verifying the claimed shape: one vocab-sized pair aggregate + one 1-row
argmax collect per merge step, so total cost grows LINEARLY in k (the
corpus-sized word-frequency pass is paid once, in step 1's lineage).
Prints a markdown table for BASELINE.md, loadavg-stamped.

Usage: python scripts/bpe_cost_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyuki_spark.queries.corpus import _bpe_fn
from nyuki_spark.session import get_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("bpe-cost-probe", master="local[32]")
    print("loadavg", [round(x, 2) for x in os.getloadavg()])
    # Warm the parquet read once so k=3 doesn't pay the cold scan alone.
    _bpe_fn(spark, sf_dir, k=1).collect()
    print("| k merges | total (s) | s/merge |")
    print("|---|---|---|")
    for k in (3, 8, 16):
        t0 = time.perf_counter()
        rows = _bpe_fn(spark, sf_dir, k=k).collect()
        dt = time.perf_counter() - t0
        assert len(rows) == k
        print(f"| {k} | {dt:.2f} | {dt / k:.2f} |")
    print("loadavg", [round(x, 2) for x in os.getloadavg()])
    spark.stop()


if __name__ == "__main__":
    main()
