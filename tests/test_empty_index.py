"""Empty-index semantics (BoundaryIndexSearch.cpp empty-index suites:
ffiBM25SearchEmptyIndex:169-176, ffiQuerySentenceBitmapEmptyIndex:
197-203): an index created and committed with zero documents opens in
both tiers and answers every query with an empty result — no schema
inference failures, no throws."""

import pytest

import pyspark.sql.types as T

from tantivy_search_spark.config import IndexConfig
from tantivy_search_spark.index.builder import IndexBuilder
from tantivy_search_spark.search.engine import SearchIndex


@pytest.fixture(scope="module")
def empty_index(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("empty") / "idx")
    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("body", T.StringType())])
    cfg = IndexConfig.from_json(["body"], "{}")
    IndexBuilder(spark, path, cfg, rows_per_part=4).build(
        spark.createDataFrame([], schema), id_col="doc_id")
    return SearchIndex(spark, path)


class TestEmptyIndex:
    def test_meta(self, empty_index):
        assert empty_index.get_total_num_docs() == 0
        assert empty_index.meta.part_ranges == []

    def test_bm25_empty(self, empty_index):
        assert empty_index.bm25_search(
            "anything here", top_k=10, operator_or=True).collect() == []
        # huge top_k is tolerated (reference passes 1_000_000)
        assert empty_index.bm25_search(
            "anything", top_k=1_000_000, operator_or=True).collect() == []

    def test_bitmaps_empty(self, empty_index):
        assert empty_index.query_term_bitmap("body", "x") == b""
        assert empty_index.query_sentence_bitmap("body", "a b c") == b""
        assert empty_index.regex_term_bitmap("body", "%x%") == b""
        assert not empty_index.query_term_with_range("body", "x", 0, 100)

    def test_delete_tolerated(self, empty_index):
        assert empty_index.delete_row_ids([5])
        assert empty_index.delete_row_ids([])

    def test_embedded_tier(self, empty_index):
        local = SearchIndex.open_local(empty_index.index_path)
        try:
            assert local.bm25_search_local("anything here", top_k=5) == []
            assert local.query_term_bitmap("body", "x") == b""
            assert not local.query_term_with_range("body", "x", 0, 100)
        finally:
            local.close()


class TestNullText:
    """NULL / empty column values index as empty documents (ClickHouse
    feeds empty strings for NULLs; the reference's add_text accepts
    them) — the row exists, matches nothing, scores nothing."""

    def test_nulls_index_as_empty(self, spark, tmp_path):
        path = str(tmp_path / "nulls")
        schema = T.StructType([T.StructField("doc_id", T.LongType()),
                               T.StructField("body", T.StringType())])
        rows = [(0, "alpha beta"), (1, None), (2, ""), (3, "alpha gamma")]
        cfg = IndexConfig.from_json(["body"], "{}")
        IndexBuilder(spark, path, cfg, rows_per_part=2).build(
            spark.createDataFrame(rows, schema), id_col="doc_id")
        ix = SearchIndex(spark, path)
        assert ix.get_total_num_docs() == 4
        got = sorted(r["row_id"] for r in
                     ix.bm25_search("alpha", top_k=5,
                                    operator_or=True).collect())
        assert got == [0, 3]
        from tantivy_search_spark.bitmap import u8_bitmap_to_row_ids
        assert u8_bitmap_to_row_ids(
            ix.query_term_bitmap("body", "alpha")).tolist() == [0, 3]
