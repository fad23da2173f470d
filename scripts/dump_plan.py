"""Dump explain("formatted") for registry ids to plans/<tag>/<id>_<suffix>.txt.

Usage: python scripts/dump_plan.py <suffix> <id> [<id> ...]
       NYUKI_TEST_SF_DIR overrides the default /root/testdata/sf0.01.
       NYUKI_PLAN_TAG overrides the default r12 output directory.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyuki_spark.queries import REGISTRY  # noqa: E402
from nyuki_spark.session import get_session  # noqa: E402


def main() -> int:
    suffix, ids = sys.argv[1], sys.argv[2:]
    sf_dir = os.environ.get("NYUKI_TEST_SF_DIR", "/root/testdata/sf0.01")
    tag = os.environ.get("NYUKI_PLAN_TAG", "r12")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session("nyuki-dump-plan", master="local[8]")
    for qid in ids:
        df = REGISTRY[qid].run(spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        path = os.path.join(out_dir, f"{qid}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        n_ex = txt.count("Exchange")
        print(f"{qid:28s} -> {path} (Exchange x{n_ex})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
