"""Connected components (operators/components.py): label propagation vs a
driver-side union-find brute force on crafted graphs, plus the dedup
projection that keeps one representative per group.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row


def _brute_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _run(spark, edges, **kw):
    from nyuki_spark.operators.components import connected_components

    df = spark.createDataFrame(
        [Row(id_a=a, id_b=b) for a, b in edges], "id_a long, id_b long"
    )
    return {r.id: r.component for r in connected_components(df, **kw).collect()}


@pytest.mark.parametrize(
    "edges",
    [
        [(1, 2)],  # one pair
        [(1, 2), (3, 4), (5, 6)],  # disjoint pairs
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7)],  # path: diameter 6
        [(10, 11), (11, 12), (12, 10), (20, 21)],  # cycle + pair
        [(5, 1), (9, 5), (2, 9), (7, 3)],  # min id arrives via chain
    ],
)
def test_matches_union_find(spark, edges):
    assert _run(spark, edges) == _brute_components(edges)


def test_transitive_closure_beyond_pairs(spark):
    # A~B and B~C were emitted as pairs; A-C never was. One group anyway.
    got = _run(spark, [(100, 200), (200, 300)])
    assert got == {100: 100, 200: 100, 300: 100}


def test_dedup_keeps_one_per_group_and_all_singletons(spark):
    from nyuki_spark.operators.components import dedup_by_components

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"t{i}") for i in range(8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [Row(id_a=1, id_b=3), Row(id_a=3, id_b=5), Row(id_a=6, id_b=7)],
        "id_a long, id_b long",
    )
    kept = sorted(r.doc_id for r in dedup_by_components(docs, pairs).collect())
    # group {1,3,5} -> keep 1; group {6,7} -> keep 6; 0,2,4 untouched
    assert kept == [0, 1, 2, 4, 6]


def test_empty_edge_list_converges_immediately(spark):
    # Empty graph: the monotone-sum convergence check compares NULL sums
    # (None == None) and must break on round 0 — no nodes, no labels,
    # and no infinite loop up to max_iter.
    assert _run(spark, []) == {}


def test_driver_and_distributed_paths_agree(spark, monkeypatch):
    # r12 size-adaptive split: below the edge threshold the labels come
    # from the driver-local numpy propagation, above it from the
    # distributed loop. Both must yield the identical min-id labeling on
    # a graph exercising chains, cycles, and out-of-order min arrival.
    import nyuki_spark.operators.components as C

    edges = [
        (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7),  # long chain
        (10, 11), (11, 12), (12, 10),                     # cycle
        (9, 5),                                           # merges into chain
        (40, 41),                                         # isolated pair
    ]
    monkeypatch.setattr(C, "_DRIVER_MAX_EDGES", 1_000_000)
    via_driver = _run(spark, edges)
    monkeypatch.setattr(C, "_DRIVER_MAX_EDGES", 0)
    via_distributed = _run(spark, edges)
    assert via_driver == via_distributed == _brute_components(edges)
