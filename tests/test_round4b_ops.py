"""Property tests for the round-4b operators: invariants the single-fixture
oracle comparison can't cover — equality with the naive quadratic form,
determinism across partitionings, and planted-duplicate detection."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyuki_spark.catalog import load_table
from nyuki_spark.operators.asof import nearest_event_asof
from nyuki_spark.operators.dedup import minhash_band_pairs
from nyuki_spark.operators.kmeans import kmeans_assign
from nyuki_spark.operators.spans import duplicated_substring_spans


def test_nearest_asof_equals_bruteforce(spark, sf_dir):
    """The two-frame window rewrite must equal the naive per-probe argmin
    over ALL reference rows (min abs distance, ties to the earlier ts)."""
    ev = load_table(spark, sf_dir, "events")
    out = nearest_event_asof(
        ev,
        key="user_id",
        ts="ts",
        ref_predicate=F.col("event_type") == "signup",
        probe_predicate=F.col("event_type") == "purchase",
        out_col="nearest_ts",
    ).select("event_id", "nearest_ts")

    probes = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("pts")
    )
    refs = ev.where(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("rts")
    )
    # ts is TIMESTAMP_NTZ (no unix_micros/double casts); interval
    # subtraction is well-typed and sortable, like the operator itself.
    dist = F.greatest(
        F.col("rts") - F.col("pts"), F.col("pts") - F.col("rts")
    )
    brute = (
        probes.join(refs, "user_id", "left")
        .groupBy("event_id")
        .agg(F.min(F.struct(dist.alias("d"), F.col("rts"))).alias("m"))
        .select("event_id", F.col("m.rts").alias("nearest_ts"))
    )
    assert sorted(out.collect()) == sorted(brute.collect())


def test_kmeans_deterministic_across_partitionings(spark, sf_dir):
    """Bit-identical assignments regardless of input partitioning — the
    operator's whole contract (order-pinned fp folds, rounded centroid
    handoff, id-ordered seed)."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = kmeans_assign(emb.repartition(1), k=5, iters=2).collect()
    b = kmeans_assign(emb.repartition(13, "vec_id"), k=5, iters=2).collect()
    assert sorted(a) == sorted(b)
    assert len({r["cluster_id"] for r in a}) > 1


def test_substring_spans_planted(spark):
    """A planted 10-token span shared by two docs is reported as ONE maximal
    island per doc at the right offsets; the disjoint doc reports nothing."""
    shared = " ".join(f"tok{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (1, "alpha beta " + shared + " gamma"),
            (2, shared + " delta epsilon zeta"),
            (3, " ".join(f"other{i}" for i in range(20))),
        ],
        "doc_id int, text string",
    )
    got = {
        (r["doc_id"], r["start_pos"], r["span_tokens"])
        for r in duplicated_substring_spans(docs, l=8).collect()
    }
    # 10 shared tokens -> 8-gram positions 0..2 within the span; maximal
    # island covers all 10 tokens. Doc 1 offsets shift by its 2-token prefix.
    assert got == {(1, 2, 10), (2, 0, 10)}


def test_minhash_band_pairs_planted(spark):
    """Planted near-identical docs land in a shared band; a disjoint doc
    never pairs (its shingles share no hashes, so no band can collide)."""
    base = " ".join(f"w{i}" for i in range(30))
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extra"),
            (3, " ".join(f"z{i}" for i in range(30))),
        ],
        "doc_id int, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_band_pairs(docs).collect()
    }
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)] >= 0.75


def test_pq_codes_deterministic_and_bounded(spark, sf_dir):
    """Per-subspace PQ codes are invariant to input partitioning (the
    kmeans determinism contract, applied to sliced vectors) and stay
    inside the k=4 code range."""
    from nyuki_spark.queries import REGISTRY

    a = REGISTRY["llm_pq_codes"].run(spark, sf_dir).collect()
    emb = load_table(spark, sf_dir, "embeddings")
    for s in range(4):
        sub = emb.repartition(7, "vec_id").select(
            "vec_id",
            F.slice(F.col("embedding").cast("array<double>"), s * 16 + 1, 16)
            .alias("embedding"),
        )
        got = {
            r["vec_id"]: r["cluster_id"]
            for r in kmeans_assign(sub, k=4, iters=2).collect()
        }
        for r in a:
            assert got[r["vec_id"]] == r[f"code{s}"]
            assert 0 <= r[f"code{s}"] < 4


def test_minhash_bandpairs_recall_vs_exact(spark, sf_dir):
    """Every exact-Jaccard >= 0.7 pair must be recovered by the banded
    portable MinHash (16 perms / 4 bands: per-pair candidate probability
    ~0.97 at J=0.7; on the fixed fixture+hash constants the result is
    deterministic and currently exhaustive)."""
    from nyuki_spark.operators.dedup import (
        collapse_text_groups,
        minhash_band_pairs,
        ngram_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    _, uniq, _ = collapse_text_groups(docs)
    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(uniq, threshold=0.7).collect()
    }
    cand = {(r["id_a"], r["id_b"]) for r in minhash_band_pairs(uniq).collect()}
    assert exact, "fixture should contain planted near-duplicates"
    assert len(exact & cand) / len(exact) >= 0.9
