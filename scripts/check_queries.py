"""Spot-check a subset of registry queries against their DuckDB oracles.

Development loop companion to export_correctness_full.py: same
canonicalization + comparison, but only for the ids given on the command
line (or ids matching a prefix with ``--prefix p``), printed verbosely.

Usage:  python scripts/check_queries.py net_triangles net_assortativity
        python scripts/check_queries.py --prefix net_
        NYUKI_TEST_SF_DIR overrides the default /root/testdata/sf0.01.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from export_correctness_full import _canon, _cells_hashable  # noqa: E402

from nyuki_spark.catalog import TABLES  # noqa: E402
from nyuki_spark.queries import REGISTRY  # noqa: E402
from nyuki_spark.session import get_session  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    if args and args[0] == "--prefix":
        ids = sorted(q for q in REGISTRY if q.startswith(args[1]))
    else:
        ids = args
    unknown = [q for q in ids if q not in REGISTRY]
    if unknown or not ids:
        print(f"unknown/empty ids: {unknown}")
        return 2

    sf_dir = os.environ.get("NYUKI_TEST_SF_DIR", "/root/testdata/sf0.01")
    spark = get_session("nyuki-check", master="local[*]")
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    fails = 0
    for qid in ids:
        q = REGISTRY[qid]
        t0 = time.time()
        try:
            epdf = q.run(spark, sf_dir).toPandas()
            if q.oracle_sql is None:
                print(f"  {qid:32s} rows_only ({len(epdf)} rows, "
                      f"{time.time() - t0:.2f}s)")
                continue
            opdf = duck.execute(q.oracle_sql).df()
            for side, pdf in (("engine", epdf), ("oracle", opdf)):
                bad = _cells_hashable(pdf)
                if bad:
                    raise AssertionError(f"{side}: {bad}")
            e, o = _canon(epdf), _canon(opdf)
            ok = (
                len(e) == len(o)
                and list(e.columns) == list(o.columns)
                and all(e[c].dtype.kind == o[c].dtype.kind for c in e.columns)
                and e.equals(o)
            )
            print(f"  {qid:32s} {'OK' if ok else 'MISMATCH'} "
                  f"({len(e)} vs {len(o)} rows, {time.time() - t0:.2f}s)")
            if not ok:
                fails += 1
                print("   engine head:\n", e.head(8).to_string())
                print("   oracle head:\n", o.head(8).to_string())
                if len(e) == len(o) and list(e.columns) == list(o.columns):
                    diff = (e != o) & ~(e.isna() & o.isna())
                    bad_rows = diff.any(axis=1)
                    if bad_rows.any():
                        i = bad_rows.idxmax()
                        print("   first diff row", i)
                        print("    engine:", e.loc[i].to_dict())
                        print("    oracle:", o.loc[i].to_dict())
        except Exception as exc:  # noqa: BLE001
            fails += 1
            print(f"  {qid:32s} ERR {type(exc).__name__}: {exc}")
        spark.catalog.clearCache()
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
