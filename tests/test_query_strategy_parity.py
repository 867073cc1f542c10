"""Parity with the reference's query-strategy unit suite.

Expected counts / row orders transcribed from
/root/reference/src/search/implements/strategy/query_strategy_test.rs
(term-set 3 hits, single-term 2, regex '%dgmen%' 2, parser-sentence 3,
BM25 NL top hit row 2 with score >= 4.0 then row 0 with score <= 1.6),
all against the 3-column corpus A fixture
(/root/reference/src/common/test_util.rs:32-59).
"""


def popcount(bitmap: bytes) -> int:
    return bin(int.from_bytes(bitmap, "little")).count("1") if bitmap else 0


class TestQueryStrategyParity:
    def test_term_set_query_strategy(self, corpus_a_index):
        # TermSetQueryStrategy {terms: [ancient, balance], column: col1} -> 3
        bm = corpus_a_index.query_terms_bitmap("col1", ["ancient", "balance"])
        assert popcount(bm) == 3
        assert bm == bytes([0b11001])  # rows {0, 3, 4}

    def test_single_term_query_strategy(self, corpus_a_index):
        # SingleTermQueryStrategy {term: judgment, column: col2} -> 2
        bm = corpus_a_index.query_term_bitmap("col2", "judgment")
        assert popcount(bm) == 2
        assert bm == bytes([0b10010])  # rows {1, 4} ('Judgment' lowercased)

    def test_regex_query_strategy(self, corpus_a_index):
        # RegexQueryStrategy {pattern: %dgmen%, column: col2} -> 2
        bm = corpus_a_index.regex_term_bitmap("col2", "%dgmen%")
        assert popcount(bm) == 2
        assert bm == bytes([0b10010])

    def test_parser_query_strategy(self, corpus_a_index):
        # ParserQueryStrategy {col3, "Literary inventions capture
        # philosophical masterpieces."} -> 3 (OR semantics over tokens)
        bm = corpus_a_index.query_sentence_bitmap(
            "col3", "Literary inventions capture philosophical masterpieces.")
        assert popcount(bm) == 3
        assert bm == bytes([0b10101])  # rows {0, 2, 4}

    def test_bm25_query_strategy(self, corpus_a_index):
        # BM25NaturalLanguageStrategy {topk: 10, OR, no filter}: first hit is
        # row 2 (literary+capture+masterpieces) scoring >= 4.0, second is
        # row 0 (inventions) scoring <= 1.6.
        got = [(r["row_id"], r["score"]) for r in corpus_a_index.bm25_search(
            "Literary inventions capture philosophical masterpieces.",
            top_k=10, operator_or=True, enable_nlq=True).collect()]
        assert got[0][0] == 2 and got[0][1] >= 4.0
        assert got[1][0] == 0 and got[1][1] <= 1.6
