"""Connected components (large-star/small-star) vs exact union-find."""

import random

from pyspark.sql import functions as F

from onetl_spark.llm import dedup
from onetl_spark.operators.graph import connected_components


def _uf_components(edges):
    parent = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    nodes = {n for e in edges for n in e}
    return {n: find(n) for n in nodes}


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["rep"] for r in connected_components(df).collect()}


def test_long_chain(spark):
    # worst case for min-label propagation (needs n rounds); star
    # contraction must converge within its O(log^2 n) bound
    n = 64
    edges = [(i, i + 1) for i in range(n)]
    got = _run(spark, edges)
    assert got == {i: 0 for i in range(n + 1)}


def test_two_components_and_duplicates_and_reversed(spark):
    edges = [(5, 3), (3, 5), (3, 1), (10, 11), (11, 10), (11, 12), (7, 7)]
    got = _run(spark, edges)
    assert got == {1: 1, 3: 1, 5: 1, 10: 10, 11: 10, 12: 10}
    # self-loop-only node drops out of the edge set entirely
    assert 7 not in got


def test_random_graphs_match_union_find(spark):
    rng = random.Random(42)
    for trial in range(3):
        nodes = list(range(200))
        edges = [
            (rng.choice(nodes), rng.choice(nodes))
            for _ in range(150)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        assert _run(spark, edges) == _uf_components(edges)


def test_dedup_survivors_distributed_path_matches_driver_path(spark):
    docs = spark.createDataFrame(
        [(i, f"doc text number {i % 4} repeated body") for i in range(20)],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(0, 4), (4, 8), (1, 5), (17, 13)], "a_id long, b_id long",
    )
    driver = {
        r["doc_id"]: r["rep_id"]
        for r in dedup.dedup_survivors(docs, pairs).collect()
    }
    dist = {
        r["doc_id"]: r["rep_id"]
        for r in dedup.dedup_survivors(docs, pairs, collect_threshold=0).collect()
    }
    assert driver == dist
    assert dist[8] == 0 and dist[4] == 0 and dist[5] == 1 and dist[17] == 13
    # untouched docs represent themselves
    assert dist[2] == 2
