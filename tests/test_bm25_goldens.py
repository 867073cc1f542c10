"""Golden BM25 + bitmap tests on corpus A — expected row_ids and scores
(3 decimals) from the reference's unit tests
(api_bm25_standard_search.rs:37-106, api_bm25_nlq_search.rs:36-99,
api_query_*_bitmap.rs, FIXTURES.md §2)."""

import pytest

from tantivy_search_spark.bitmap import row_ids_to_u8_bitmap


def rows(df):
    return [(r["row_id"], round(r["score"], 3)) for r in df.collect()]


class TestStandardSearch:
    def test_or_mixed_sentence(self, corpus_a_index):
        # standard mode tokenizes the raw sentence; 'col2'/'or' are tokens
        got = rows(corpus_a_index.bm25_search(
            "col2:ancient OR (moral horizons)", top_k=100000, operator_or=True))
        assert got == [(0, 2.218), (4, 2.181)]

    def test_and_ancient_rise_fall(self, corpus_a_index):
        got = rows(corpus_a_index.bm25_search(
            "ancient rise fall", top_k=100000, operator_or=False))
        assert got == [(0, 3.352)]

    def test_and_restricted_col3_empty(self, corpus_a_index):
        got = rows(corpus_a_index.bm25_search(
            "ancient rise fall", column_names=["col3"], top_k=100000,
            operator_or=False))
        assert got == []

    def test_or_with_filter_bitmap(self, corpus_a_index):
        got = rows(corpus_a_index.bm25_search(
            "col2:(ancient rise fall)", top_k=100000, operator_or=True,
            alive_bitmap=bytes([16])))
        assert got == [(4, 0.895)]

    def test_or_no_filter(self, corpus_a_index):
        got = rows(corpus_a_index.bm25_search(
            "col2:(ancient rise fall)", top_k=100000, operator_or=True))
        assert got == [(0, 3.352), (4, 0.895)]


class TestNlqSearch:
    def test_or_field_queries(self, corpus_a_index):
        got = rows(corpus_a_index.bm25_search(
            "col1:ancient OR col2:(moral horizons)", top_k=100000,
            operator_or=True, enable_nlq=True))
        assert got == [(0, 2.218), (4, 2.181)]

    def test_and_field_group(self, corpus_a_index):
        got = rows(corpus_a_index.bm25_search(
            "col1:(ancient rise fall)", top_k=100000, operator_or=False,
            enable_nlq=True))
        assert got == [(0, 3.352)]

    def test_or_field_group_filter(self, corpus_a_index):
        got = rows(corpus_a_index.bm25_search(
            "col1:(ancient rise fall)", top_k=100000, operator_or=True,
            enable_nlq=True, alive_bitmap=bytes([16])))
        assert got == [(4, 0.895)]

    def test_or_field_group_no_filter(self, corpus_a_index):
        got = rows(corpus_a_index.bm25_search(
            "col1:(ancient rise fall)", top_k=100000, operator_or=True,
            enable_nlq=True))
        assert got == [(0, 3.352), (4, 0.895)]


class TestBitmapQueries:
    def test_term_ancient(self, corpus_a_index):
        assert corpus_a_index.query_term_bitmap("col1", "Ancient") == bytes([17])

    def test_term_nature(self, corpus_a_index):
        assert corpus_a_index.query_term_bitmap("col2", "Nature") == bytes([2])

    def test_terms(self, corpus_a_index):
        assert corpus_a_index.query_terms_bitmap(
            "col1", ["ancient", "reflect"]) == bytes([19])

    def test_terms_col2(self, corpus_a_index):
        assert corpus_a_index.query_terms_bitmap(
            "col2", ["Nature", "Moral"]) == bytes([18])

    def test_sentence(self, corpus_a_index):
        assert corpus_a_index.query_sentence_bitmap(
            "col2", "nature moral") == bytes([18])

    def test_regex_like(self, corpus_a_index):
        assert corpus_a_index.regex_term_bitmap("col1", "An%ent") == bytes([17])
        assert corpus_a_index.regex_term_bitmap("col1", "an%ent") == bytes([17])

    def test_regex_economic(self, corpus_a_index):
        assert corpus_a_index.regex_term_bitmap("col2", "E%no__c") == bytes([4])

    def test_regex_no_cross_token(self, corpus_a_index):
        # pattern spans two tokens -> no single dictionary term matches
        assert corpus_a_index.regex_term_bitmap("col1", "%ncient%empir%") == b""


class TestStatsApis:
    def test_total_docs(self, corpus_a_index):
        assert corpus_a_index.get_total_num_docs() == 5

    def test_total_tokens_col1(self, corpus_a_index):
        # 9+6+7+8+7 default-chain tokens
        assert corpus_a_index.get_total_num_tokens("col1") == 37

    def test_doc_freq(self, corpus_a_index):
        freqs = {(c, t): d for (t, c, d) in
                 corpus_a_index.get_doc_freq("ancient rise")}
        assert freqs[("col1", "ancient")] == 2
        assert freqs[("col1", "rise")] == 1

    def test_indexed_doc_counts(self, corpus_a_index):
        assert corpus_a_index.get_indexed_doc_counts() == 5
