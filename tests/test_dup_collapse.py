"""Duplicate-collapse funnel: the expansion path must stay oracle-exact.

``llm_cosine_pairs`` and ``ts_similar_users`` collapse exact-duplicate
vectors/profiles before LSH (r4: identical vectors collide in every hash
table, so candidates grow with the square of the duplication factor —
901 s at replicated sf1 before the collapse) and expand group pairs back
afterwards. The shipped fixtures are duplicate-free, so the oracle suites
only exercise the 1:1 degenerate path; this test plants real duplicates —
a replicated copy of the sf0.001 fixtures with offset ids, exactly the
shape scripts/make_sf1.py produces — and checks both queries against their
DuckDB oracles on the SAME planted data. Intra-duplicate pairs (sim 1.0),
cross-group expansion, and ordering ties all get exercised.
"""

from __future__ import annotations

import duckdb
import pytest

from nyuki_spark.catalog import TABLES
from nyuki_spark.queries import REGISTRY

# (query id, duplicate-evidence check): beyond engine==oracle, each query
# must show its intra-duplicate path actually ran on the planted corpus —
# "top1": similarity-ordered, first row is a dup pair at 1.0;
# "any1"/"any0": a dup pair (sim 1.0 / hamming 0) appears somewhere;
# "rows": equality only (cluster outputs carry no per-pair similarity).
DUP_QUERIES = (
    ("llm_cosine_pairs", "top1"),
    ("ts_similar_users", "top1"),
    ("llm_ngram_jaccard", "any1"),
    ("llm_simhash_pairs", "any0"),
    ("llm_neardup_clusters", "rows"),
    ("llm_dedup_groups", "rows"),
)


@pytest.fixture(scope="module")
def dup_sf_dir(tmp_path_factory):
    """sf0.001 replicated 3x with offset keys -> every row has 2 exact dups."""
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("dup_sf")
    con = duckdb.connect()
    spans = {
        "embeddings": ("vec_id", None),
        "events": ("event_id", "user_id"),
        "documents": ("doc_id", None),
    }
    for t in TABLES:
        if t in spans:
            keys = [k for k in spans[t] if k]
            cols = [
                c[0] for c in con.execute(f"SELECT * FROM '{src}/{t}.parquet' LIMIT 0").description
            ]
            sel = []
            for c in cols:
                if c in keys:
                    span = con.execute(
                        f"SELECT MAX({c})+1 FROM '{src}/{t}.parquet'"
                    ).fetchone()[0]
                    sel.append(f"{c} + r.i * {span} AS {c}")
                else:
                    sel.append(c)
            con.execute(
                f"COPY (SELECT {', '.join(sel)} FROM '{src}/{t}.parquet', range(3) r(i)) "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
            )
    return str(dst)


@pytest.mark.parametrize("qid,check", DUP_QUERIES)
def test_collapse_matches_oracle_on_duplicates(qid, check, spark, dup_sf_dir):
    q = REGISTRY[qid]
    engine = [tuple(r) for r in q.run(spark, dup_sf_dir).collect()]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{dup_sf_dir}/{t}.parquet'"
        )
    oracle = [tuple(r) for r in con.execute(q.oracle_sql).fetchall()]

    assert engine == oracle, f"{qid} diverged on planted duplicates"
    assert engine
    if check == "top1":
        assert engine[0][2] == pytest.approx(1.0)
    elif check == "any1":
        assert any(r[2] == pytest.approx(1.0) for r in engine)
    elif check == "any0":
        assert any(r[2] == 0 for r in engine)


@pytest.fixture(scope="module")
def degenerate_dup_sf_dir(tmp_path_factory):
    """documents with ADVERSARIAL duplicate groups appended: identical
    2-word texts (no 3-gram shingle, no 5-gram), identical empty strings,
    and NULL-text duplicates — the degenerate classes the duplicate
    collapse must NOT fabricate pairs for (r4 code review)."""
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("degen_sf")
    con = duckdb.connect()
    for t in TABLES:
        if t == "documents":
            con.execute(
                f"""COPY (
                  SELECT * FROM '{src}/{t}.parquet'
                  UNION ALL
                  SELECT 900001 + v.k * 2 + r.i, v.txt, 'en', 'src_0',
                         COALESCE(LEN(v.txt), 0)
                  FROM range(2) r(i),
                       (VALUES (0, 'hi there'), (1, ''),
                               (2, CAST(NULL AS VARCHAR))) v(k, txt)
                ) TO '{dst}/{t}.parquet' (FORMAT PARQUET)"""
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
            )
    return str(dst)


@pytest.mark.parametrize(
    "qid",
    [
        "llm_ngram_jaccard",
        "llm_simhash_pairs",
        "llm_minhash_neardup",
        "llm_neardup_clusters",
        "llm_dedup_groups",
        "llm_decontaminate",
    ],
)
def test_collapse_degenerate_duplicates(qid, spark, degenerate_dup_sf_dir):
    q = REGISTRY[qid]
    engine = [tuple(r) for r in q.run(spark, degenerate_dup_sf_dir).collect()]
    if q.oracle_sql is None:
        # minhash is recall-tier: assert only that no fabricated pair
        # touches the shingle-less planted ids.
        planted = set(range(900001, 900007))
        assert not [r for r in engine if r[0] in planted or r[1] in planted]
        return
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{degenerate_dup_sf_dir}/{t}.parquet'"
        )
    oracle = [tuple(r) for r in con.execute(q.oracle_sql).fetchall()]
    assert engine == oracle, f"{qid} diverged on degenerate duplicates"
