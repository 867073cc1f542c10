"""u32-boundary doc ids (BoundaryIndexSearch.cpp:53-128).

The reference's boundary suite indexes docs with row ids straddling the
u32 ceiling (4294960000..4294980000 — ClickHouse parts can start at any
global row offset) and requires queries against them to answer rather
than overflow.  The engine stores int64 doc ids throughout; this pins
that an index built with pre-assigned ids near 2**32 builds, searches,
range-checks and deletes correctly.
"""

import pytest

from tantivy_search_spark.config import IndexConfig
from tantivy_search_spark.index.builder import IndexBuilder
from tantivy_search_spark.search.engine import SearchIndex

BASE = 4_294_960_000  # < 2**32 = 4_294_967_296; ids cross the ceiling


@pytest.fixture(scope="module")
def u32_index(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("u32") / "idx")
    rows = [
        {"doc_id": BASE + i,
         "body": f"alpha token{i} " + ("needle" if i in (0, 9000) else "hay")}
        for i in range(0, 9001, 1000)
    ]
    cfg = IndexConfig.from_json(["body"], "{}")
    cfg.parts_per_shard = 2
    cfg.n_buckets = 8
    df = spark.createDataFrame(rows)
    IndexBuilder(spark, path, cfg, rows_per_part=4).build(df, id_col="doc_id")
    return SearchIndex(spark, path)


class TestU32Boundary:
    def test_bm25_returns_large_ids(self, u32_index):
        got = {r["row_id"] for r in
               u32_index.bm25_search("needle", top_k=10,
                                     operator_or=True).collect()}
        assert got == {BASE, BASE + 9000}
        assert max(got) > 2**32  # the 9000 offset crosses the ceiling

    def test_with_range_across_ceiling(self, u32_index):
        ix = u32_index
        assert ix.query_term_with_range("body", "needle", BASE, BASE)
        assert not ix.query_term_with_range(
            "body", "needle", BASE + 1, BASE + 8999)
        assert ix.query_term_with_range(
            "body", "needle", 2**32, BASE + 20_000)
        # reference boundary rule: ranges below/above the corpus -> False
        assert not ix.query_term_with_range("body", "needle", 0, 1000)
        assert not ix.query_term_with_range(
            "body", "needle", BASE + 10_000, BASE + 50_000)

    def test_missing_term_cheap_false(self, u32_index):
        # no-match bitmaps stay empty (no giant allocation on miss)
        assert u32_index.query_term_bitmap("body", "zzznope") == b""
        assert not u32_index.query_term_with_range(
            "body", "zzznope", BASE, BASE + 20_000)

    def test_delete_large_ids(self, u32_index):
        u32_index.delete_row_ids([BASE])
        try:
            got = {r["row_id"] for r in
                   u32_index.bm25_search("needle", top_k=10,
                                         operator_or=True).collect()}
            assert got == {BASE + 9000}
            assert not u32_index.query_term_with_range(
                "body", "needle", BASE, BASE)
        finally:
            u32_index.delete_row_ids([])  # no-op keeps API shape
