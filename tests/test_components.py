"""connected_components / dedup_assign — transitive duplicate clusters.

Reference behavior: the cluster stage a real dedup pipeline runs after
candidate-pair generation (pairs are edges; duplicates are transitive).
Checked against a pure-Python union-find on seeded random graphs, plus
the adversarial shapes for the alternating large/small-star algorithm
(chains, inverted stars, cliques, singletons).
"""

import random

import pytest
from pyspark.sql import functions as F

from tantivy_search_spark.pipeline import dedup


def _uf_components(n_nodes, edges):
    """Union-find ground truth: node -> min node of its component,
    restricted to nodes that appear in at least one edge."""
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


def _run(spark, edges):
    pairs = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "a long, b long")
    out = dedup.connected_components(pairs)
    return {r["doc_id"]: r["component_id"] for r in out.collect()}


class TestConnectedComponents:
    def test_chain(self, spark):
        # worst case for naive min-propagation: a long path
        edges = [(i, i + 1) for i in range(60)]
        got = _run(spark, edges)
        assert got == {i: 0 for i in range(61)}

    def test_inverted_star(self, spark):
        # (1,3),(2,3): passes a naive "no chains" convergence test but
        # is not a star — 2 must still land in component 1
        got = _run(spark, [(1, 3), (2, 3)])
        assert got == {1: 1, 2: 1, 3: 1}

    def test_two_cliques_and_pair_order(self, spark):
        edges = [(5, 4), (4, 3), (5, 3),          # clique {3,4,5}
                 (10, 11), (11, 12), (10, 12)]    # clique {10,11,12}
        got = _run(spark, edges)
        assert got == {3: 3, 4: 3, 5: 3, 10: 10, 11: 10, 12: 10}

    def test_self_loops_and_duplicates_ignored(self, spark):
        got = _run(spark, [(7, 7), (1, 2), (2, 1), (1, 2)])
        assert got == {1: 1, 2: 1}

    def test_empty(self, spark):
        pairs = spark.createDataFrame([], "a long, b long")
        assert dedup.connected_components(pairs).count() == 0

    @pytest.mark.parametrize("seed,n,m", [(1, 120, 90), (2, 200, 260),
                                          (3, 80, 400)])
    def test_random_vs_union_find(self, spark, seed, n, m):
        rng = random.Random(seed)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        edges = [e for e in edges if e[0] != e[1]]
        got = _run(spark, edges)
        assert got == _uf_components(n, edges)


class TestDedupAssign:
    def test_assign_flags_and_survivors(self, spark):
        docs = spark.range(0, 10).select(F.col("id").alias("doc_id"))
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (7, 8)], "a long, b long")
        out = dedup.dedup_assign(docs, pairs)
        rows = {r["doc_id"]: (r["cluster_id"], r["is_duplicate"])
                for r in out.collect()}
        assert rows[1] == (1, False) and rows[2] == (1, True) \
            and rows[3] == (1, True)
        assert rows[7] == (7, False) and rows[8] == (7, True)
        # untouched docs are their own singleton cluster
        for d in (0, 4, 5, 6, 9):
            assert rows[d] == (d, False)
        # exactly one survivor per cluster
        survivors = out.where(~F.col("is_duplicate"))
        assert survivors.count() == 7

    def test_compose_with_lsh_pairs(self, spark):
        # end-to-end fuzzy dedup: near-identical docs cluster together
        rows = [
            (0, "the quick brown fox jumps over the lazy dog again"),
            (1, "the quick brown fox jumps over the lazy dog again!"),
            (2, "the quick brown fox jumps over the lazy dog again ok"),
            (3, "completely different text about spark query engines"),
            (4, "another unrelated document mentioning inverted index"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = dedup.minhash_lsh_pairs(docs, w=3, n_perm=8, bands=4,
                                        threshold=0.4)
        out = {r["doc_id"]: r for r in
               dedup.dedup_assign(docs, pairs).collect()}
        assert out[0]["cluster_id"] == 0 and not out[0]["is_duplicate"]
        assert out[1]["cluster_id"] == 0 and out[1]["is_duplicate"]
        assert out[2]["cluster_id"] == 0 and out[2]["is_duplicate"]
        assert not out[3]["is_duplicate"] and not out[4]["is_duplicate"]
