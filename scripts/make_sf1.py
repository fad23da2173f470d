"""Generate an sf1 fixture set (~10x sf0.1) for scale-up validation.

The driver's generators are not in the repo and /root/testdata is
read-only, so sf1 is synthesized by REPLICATION: each fact/entity table is
the union of 10 copies of sf0.1 with key columns offset per replica, which
preserves every FK relationship (FIXTURES.md: o_custkey -> c_custkey,
l_orderkey -> o_orderkey, l_partkey/l_suppkey -> part/supplier) inside each
replica, keeps per-key group sizes identical (so join/agg fan-outs scale
linearly, not quadratically), and multiplies distinct-key counts by 10 —
the shape a real 10x data growth has. Dimension tables with fixed domains
(region, nation) are copied unchanged, as at any TPC-H scale factor.

Replica 0 is byte-identical to sf0.1, so sf1 results restricted to
replica-0 keys must equal sf0.1 results — a free correctness check at
scale. Non-key attribute columns are left untouched.

Output: /root/repo/testdata_sf1/{table}.parquet  (git-ignored; ~170 MB).

Usage: python scripts/make_sf1.py [replicas=10] [out_dir=testdata_sf1]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DST = os.path.join(_REPO, "testdata_sf1")

# table -> {column: source_key_space} ; every FK offsets by the SAME span as
# its referenced PK, so relationships hold within each replica.
KEYED: dict[str, dict[str, str]] = {
    "customer": {"c_custkey": "customer.c_custkey"},
    "supplier": {"s_suppkey": "supplier.s_suppkey"},
    "part": {"p_partkey": "part.p_partkey"},
    "orders": {"o_orderkey": "orders.o_orderkey", "o_custkey": "customer.c_custkey"},
    "lineitem": {
        "l_orderkey": "orders.o_orderkey",
        "l_partkey": "part.p_partkey",
        "l_suppkey": "supplier.s_suppkey",
    },
    "events": {"event_id": "events.event_id", "user_id": "events.user_id"},
    "documents": {"doc_id": "documents.doc_id"},
    "embeddings": {"vec_id": "embeddings.vec_id"},
}
COPY_ONLY = ("region", "nation")


def main() -> None:
    global DST
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    if len(sys.argv) > 2:
        DST = os.path.join(_REPO, sys.argv[2])
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SRC}/{t}.parquet'")

    # Key spans: offset step per key space = max(key)+1 (keys are dense
    # 0..n-1 per FIXTURES.md, but max+1 is safe regardless).
    spans: dict[str, int] = {}
    for t, keys in KEYED.items():
        for col, space in keys.items():
            if space not in spans:
                st, sc = space.split(".")
                spans[space] = int(con.execute(f"SELECT MAX({sc})+1 FROM {st}").fetchone()[0])

    for t in COPY_ONLY:
        con.execute(f"COPY (SELECT * FROM {t}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied unchanged")

    for t, keys in KEYED.items():
        cols = [c[0] for c in con.execute(f"SELECT * FROM {t} LIMIT 0").description]
        sel = []
        for c in cols:
            if c in keys:
                span = spans[keys[c]]
                sel.append(f"{c} + r.i * {span} AS {c}")
            else:
                sel.append(c)
        q = (
            f"COPY (SELECT {', '.join(sel)} FROM {t}, range({replicas}) r(i)) "
            f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
        con.execute(q)
        n = con.execute(f"SELECT COUNT(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows ({replicas}x)")


if __name__ == "__main__":
    main()
