"""FunctionalFFI golden parity.

Every assertion below is transcribed 1:1 from the reference's
tests/unit_test/FunctionalFFI.cpp (the FFI surface ClickHouse calls),
over the same 10-row x 2-column English corpus (corpora.ffi_english_rows,
FunctionalFFI.cpp:50-59) and the same per-column tokenizer configs.
File:line citations on each test mark the transcribed TEST_F.
"""

import pytest

from corpora import ffi_english_rows
from tantivy_search_spark.config import IndexConfig
from tantivy_search_spark.index.builder import IndexBuilder
from tantivy_search_spark.search.engine import SearchIndex


def _build(spark, tmp_path_factory, tag: str, cfg_json: str) -> SearchIndex:
    path = str(tmp_path_factory.mktemp("ffi") / tag)
    cfg = IndexConfig.from_json(["col1", "col2"], cfg_json)
    cfg.parts_per_shard = 2
    cfg.n_buckets = 8
    df = spark.createDataFrame(ffi_english_rows())
    IndexBuilder(spark, path, cfg, rows_per_part=4).build(df, id_col="doc_id")
    return SearchIndex(spark, path)


@pytest.fixture(scope="module")
def stem_stem(spark, tmp_path_factory):
    return _build(spark, tmp_path_factory, "stem_stem",
                  '{"col1":{"tokenizer":{"type":"stem"}},'
                  ' "col2":{"tokenizer":{"type":"stem"}}}')


@pytest.fixture(scope="module")
def ws_stem(spark, tmp_path_factory):
    return _build(spark, tmp_path_factory, "ws_stem",
                  '{"col1":{"tokenizer":{"type":"whitespace"}},'
                  ' "col2":{"tokenizer":{"type":"stem"}}}')


@pytest.fixture(scope="module")
def ws_raw(spark, tmp_path_factory):
    return _build(spark, tmp_path_factory, "ws_raw",
                  '{"col1":{"tokenizer":{"type":"whitespace"}},'
                  ' "col2":{"tokenizer":{"type":"raw"}}}')


@pytest.fixture(scope="module")
def stem_stopwords_both(spark, tmp_path_factory):
    # FFIBM25SearchWithStopWords config: english stop words on BOTH cols
    return _build(
        spark, tmp_path_factory, "stem_sw2",
        '{"col1":{"tokenizer":{"type":"stem",'
        ' "stop_word_filters":["english"]}},'
        ' "col2":{"tokenizer":{"type":"stem",'
        ' "stop_word_filters":["english"]}}}')


@pytest.fixture(scope="module")
def stem_stopwords_col1(spark, tmp_path_factory):
    # TantivyBM25SearchWithFilter config: stop words on col1 only
    return _build(
        spark, tmp_path_factory, "stem_sw1",
        '{"col1":{"tokenizer":{"type":"stem",'
        ' "stop_word_filters":["english"]}},'
        ' "col2":{"tokenizer":{"type":"stem"}}}')


def _rows(df):
    return [r["row_id"] for r in df.collect()]


class TestWithRangeGoldens:
    def test_term_with_range(self, stem_stem):
        # FunctionalFFI.cpp:77-84 (FFIQueryTermWithRange)
        ix = stem_stem
        assert ix.query_term_with_range("col1", "Ancient", 0, 1)
        assert not ix.query_term_with_range("col1", "Ancient", 3, 9)
        assert not ix.query_term_with_range("col1", "Ancient", 29, 33)

    def test_terms_with_range(self, stem_stem):
        # FunctionalFFI.cpp:86-93 (FFIQueryTermsWithRange)
        ix = stem_stem
        probe = ["Ancient", "Social", "Chemical"]
        assert ix.query_terms_with_range("col1", probe, 0, 1)
        assert not ix.query_terms_with_range("col1", probe, 2, 2)
        assert ix.query_terms_with_range("col2", probe, 8, 20)

    def test_sentence_with_range(self, stem_stem):
        # FunctionalFFI.cpp:95-101 (FFIQuerySentenceWithRange)
        ix = stem_stem
        s = "Military strategies evolve with technological advancements."
        assert ix.query_sentence_with_range("col2", s, 7, 7)
        assert not ix.query_sentence_with_range("col1", s, 9, 9)

    def test_regex_with_range(self, ws_raw):
        # FunctionalFFI.cpp:103-110 (FFIRegexTermWithRange)
        ix = ws_raw
        assert ix.regex_term_with_range("col2", "%ate🦠, refl%", 0, 2)
        assert not ix.regex_term_with_range("col2", "%ate🦠, refl%", 8, 8)
        assert not ix.regex_term_with_range("col1", "%ns 🦠 in te%", 4, 6)
        assert ix.regex_term_with_range("col1", "%heori%", 7, 8)


class TestBitmapGoldens:
    def test_term_bitmap(self, stem_stem):
        # FunctionalFFI.cpp:116-123 (FFIQueryTermBitmap)
        ix = stem_stem
        assert len(ix.query_term_bitmap("col1", "Ancient")) > 0
        assert len(ix.query_term_bitmap("col2", "Ancient")) > 0
        assert len(ix.query_term_bitmap("col2", "Innovations")) == 0

    def test_terms_bitmap(self, ws_stem):
        # FunctionalFFI.cpp:124-131 (FFIQueryTermsBitmap)
        ix = ws_stem
        probe = ["Ancient", "Social", "Chemical"]
        assert len(ix.query_terms_bitmap("col1", probe)) > 0
        assert len(ix.query_terms_bitmap("col2", probe)) > 0
        assert len(ix.query_terms_bitmap(
            "col2", ["unlock", "merits", "ethics"])) == 0

    def test_sentence_bitmap(self, ws_stem):
        # FunctionalFFI.cpp:133-139 (FFIQuerySentenceBitmap)
        ix = ws_stem
        s = "Environmental conservation efforts protect Earth's biodiversity."
        assert len(ix.query_sentence_bitmap("col2", s)) > 0
        assert len(ix.query_sentence_bitmap("col1", s)) == 0

    def test_regex_bitmap(self, ws_raw):
        # FunctionalFFI.cpp:141-149 (FFIRegexTermBitmap)
        ix = ws_raw
        assert len(ix.regex_term_bitmap("col2", "%ate🦠, refl%")) > 0
        assert len(ix.regex_term_bitmap("col1", "%ate🦠, refl%")) == 0
        assert len(ix.regex_term_bitmap("col1", "%ns 🦠 in te%")) == 0
        assert len(ix.regex_term_bitmap("col1", "%heori%")) > 0


class TestBM25Goldens:
    def test_nlq_top3_order(self, stem_stem):
        # FunctionalFFI.cpp:151-161 (FFIBM25Search): "the of" top-3 is
        # rows [3, 2, 1] in score order.
        got = _rows(stem_stem.bm25_search(
            "the of", top_k=3, operator_or=True, enable_nlq=True))
        assert got == [3, 2, 1]

    def test_stopwords_empty(self, stem_stopwords_both):
        # FunctionalFFI.cpp:165-172 (FFIBM25SearchWithStopWords): with
        # english stop words on both columns, every query token of
        # "the of abc" is either dropped by the stop-word filter or
        # absent from the corpus — zero results.
        got = _rows(stem_stopwords_both.bm25_search(
            "the of abc", top_k=3, operator_or=True, enable_nlq=True))
        assert got == []

    def test_filter_alive_bitmap(self, stem_stopwords_col1):
        # FunctionalFFI.cpp:176-188 (TantivyBM25SearchWithFilter):
        # stop words on col1 only, so "the of" matches through col2;
        # alive bitmap bytes [6, 1] = rows {1, 2, 8}; col2 row 8 has no
        # the/of, leaving exactly rows [1, 2] in score order.
        alive = bytes([6, 1])
        got = _rows(stem_stopwords_col1.bm25_search(
            "the of", top_k=10, operator_or=True, enable_nlq=True,
            alive_bitmap=alive))
        assert got == [1, 2]

    def test_delete_row_ids(self, spark, tmp_path_factory):
        # FunctionalFFI.cpp:66-75 (TantivyDeleteRowIds): "Ancient"
        # matches 2 rows; delete {0, 6, 1000} (1000 out of range is
        # tolerated) leaves 0.
        ix = _build(spark, tmp_path_factory, "stem_del",
                    '{"col1":{"tokenizer":{"type":"stem"}},'
                    ' "col2":{"tokenizer":{"type":"stem"}}}')
        before = _rows(ix.bm25_search(
            "Ancient", top_k=10, operator_or=True, enable_nlq=True))
        assert sorted(before) == [0, 6]
        ix.delete_row_ids([0, 6, 1000])
        after = _rows(ix.bm25_search(
            "Ancient", top_k=10, operator_or=True, enable_nlq=True))
        assert after == []


class TestTokenizerTestRs:
    """Parity with the reference's tokenizer integration test
    (src/tokenizer/tests/tokenizer_test.rs:174-199 `test_different_tokenizers`,
    corpus at :44-85): a `simple` case-insensitive chain over 10 mixed
    Chinese-English documents, queried with the mixed sentence
    "Elon Musk 是否能够使得世界经济繁荣" through both the standard and the
    natural-language strategies (operation_or=true, top_k=10)."""

    QUERY = "Elon Musk 是否能够使得世界经济繁荣"

    @pytest.fixture(scope="class")
    def zh_en_simple(self, spark, tmp_path_factory):
        from corpora import tokenizer_test_zh_en_rows
        path = str(tmp_path_factory.mktemp("tokrs") / "zh_en_simple")
        cfg = IndexConfig.from_json(
            ["col1"],
            '{"col1":{"tokenizer":{"type":"simple",'
            ' "case_sensitive":false}}}')
        cfg.parts_per_shard = 2
        cfg.n_buckets = 8
        df = spark.createDataFrame(tokenizer_test_zh_en_rows())
        IndexBuilder(spark, path, cfg, rows_per_part=4).build(
            df, id_col="doc_id")
        return SearchIndex(spark, path)

    def test_simple_chain_cjk_run_tokens(self, zh_en_simple):
        # tantivy's SimpleTokenizer splits on non-alphanumeric and CJK
        # chars ARE alphanumeric ('哈'.is_alphanumeric() — the property
        # the reference test prints at tokenizer_test.rs:176-178), so a
        # contiguous CJK run is ONE token
        an = zh_en_simple.config.analyzer("col1")
        assert an("在繁忙的城市生活中，finding tranquility") == \
            ["在繁忙的城市生活中", "finding", "tranquility"]
        assert an(self.QUERY) == ["elon", "musk", "是否能够使得世界经济繁荣"]

    def test_mixed_query_both_strategies(self, zh_en_simple):
        # only doc 2 contains "Elon Musk"; the query's CJK run is not a
        # token of any document, so both strategies return exactly row 2
        ix = zh_en_simple
        std = ix.bm25_search(self.QUERY, top_k=10, operator_or=True)
        assert _rows(std) == [2]
        nlq = ix.bm25_search(self.QUERY, top_k=10, operator_or=True,
                             enable_nlq=True)
        assert _rows(nlq) == [2]

    def test_mixed_query_local_tier(self, zh_en_simple):
        ix_local = SearchIndex.open_local(zh_en_simple.index_path)
        try:
            got = ix_local.bm25_search_local(
                self.QUERY, top_k=10, operator_or=True)
            assert [r[0] for r in got] == [2]
        finally:
            ix_local.close()
