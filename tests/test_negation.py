"""NLQ MustNot clauses ('-term', tantivy QueryParser semantics)."""

import pytest


def _ids(df):
    return sorted(r["row_id"] for r in df.collect())


class TestNegation:
    def test_must_not_excludes(self, corpus_a_index):
        ix = corpus_a_index
        base = _ids(ix.bm25_search("ancient", top_k=10, operator_or=True,
                                   enable_nlq=True))
        neg = _ids(ix.bm25_search("ancient -rise", top_k=10,
                                  operator_or=True, enable_nlq=True))
        rise = _ids(ix.bm25_search("rise", top_k=10, operator_or=True,
                                   enable_nlq=True))
        assert set(neg) == set(base) - set(rise)
        assert neg  # the fixture has an 'ancient' doc without 'rise'

    def test_negated_field_term(self, corpus_a_index):
        ix = corpus_a_index
        got = _ids(ix.bm25_search("ancient -col2:rise", top_k=10,
                                  operator_or=True, enable_nlq=True))
        col2_rise = _ids(ix.bm25_search("col2:rise", top_k=10,
                                        operator_or=True, enable_nlq=True))
        base = _ids(ix.bm25_search("ancient", top_k=10, operator_or=True,
                                   enable_nlq=True))
        assert set(got) == set(base) - set(col2_rise)

    def test_score_is_positive_clause_only(self, corpus_a_index):
        ix = corpus_a_index
        pos = {r["row_id"]: round(r["score"], 6) for r in
               ix.bm25_search("ancient", top_k=10, operator_or=True,
                              enable_nlq=True).collect()}
        neg = {r["row_id"]: round(r["score"], 6) for r in
               ix.bm25_search("ancient -rise", top_k=10, operator_or=True,
                              enable_nlq=True).collect()}
        for rid, sc in neg.items():
            assert sc == pos[rid], rid

    def test_pure_negative_matches_nothing(self, corpus_a_index):
        out = corpus_a_index.bm25_search("-ancient", top_k=10,
                                         operator_or=True, enable_nlq=True)
        assert out.count() == 0

    def test_plus_prefix_tolerated(self, corpus_a_index):
        ix = corpus_a_index
        a = _ids(ix.bm25_search("+ancient rise", top_k=10,
                                operator_or=False, enable_nlq=True))
        b = _ids(ix.bm25_search("ancient rise", top_k=10,
                                operator_or=False, enable_nlq=True))
        assert a == b

    def test_batch_and_local_agree(self, corpus_a_index):
        ix = corpus_a_index
        q = "ancient -rise"
        want = [(r["row_id"], round(r["score"], 4)) for r in
                ix.bm25_search(q, top_k=10, operator_or=True,
                               enable_nlq=True).collect()]
        batch = [(r["row_id"], round(r["score"], 4)) for r in
                 ix.bm25_search_batch([(q, True)], top_k=10,
                                      enable_nlq=True).collect()]
        loc = [(r, round(s, 4)) for r, s in
               ix.bm25_search_local(q, top_k=10, operator_or=True,
                                    enable_nlq=True)]
        assert batch == want and loc == want

    def test_negated_quoted_phrase(self, spark, tmp_path_factory):
        from tantivy_search_spark.config import IndexConfig
        from tantivy_search_spark.index.builder import IndexBuilder
        from tantivy_search_spark.search.engine import SearchIndex

        rows = [
            {"doc_id": 0, "text": "alpha moral horizons beta"},
            {"doc_id": 1, "text": "alpha horizons moral beta"},
            {"doc_id": 2, "text": "alpha beta gamma"},
        ]
        path = str(tmp_path_factory.mktemp("negp") / "idx")
        cfg = IndexConfig.from_json(["text"], "{}")
        cfg.with_positions = True
        IndexBuilder(spark, path, cfg, rows_per_part=3).build(
            spark.createDataFrame(rows), id_col="doc_id")
        ix = SearchIndex(spark, path)
        got = _ids(ix.bm25_search('alpha -"moral horizons"', top_k=10,
                                  operator_or=True, enable_nlq=True))
        assert got == [1, 2]  # doc 0 has the adjacent phrase


class TestBoost:
    def test_boost_scales_score(self, corpus_a_index):
        ix = corpus_a_index
        plain = {r["row_id"]: r["score"] for r in
                 ix.bm25_search("ancient", top_k=10, operator_or=True,
                                enable_nlq=True).collect()}
        boosted = {r["row_id"]: r["score"] for r in
                   ix.bm25_search("ancient^2.5", top_k=10,
                                  operator_or=True,
                                  enable_nlq=True).collect()}
        assert set(boosted) == set(plain)
        for rid in plain:
            assert abs(boosted[rid] - 2.5 * plain[rid]) < 1e-9

    def test_boost_in_or_group(self, corpus_a_index):
        ix = corpus_a_index
        a = {r["row_id"]: r["score"] for r in
             ix.bm25_search("ancient", top_k=10, operator_or=True,
                            enable_nlq=True).collect()}
        b = {r["row_id"]: r["score"] for r in
             ix.bm25_search("rise", top_k=10, operator_or=True,
                            enable_nlq=True).collect()}
        got = {r["row_id"]: r["score"] for r in
               ix.bm25_search("ancient^3 OR rise", top_k=10,
                              operator_or=True, enable_nlq=True).collect()}
        for rid, sc in got.items():
            want = 3 * a.get(rid, 0.0) + b.get(rid, 0.0)
            assert abs(sc - want) < 1e-9, rid

    def test_group_boost(self, corpus_a_index):
        ix = corpus_a_index
        grp = {r["row_id"]: r["score"] for r in
               ix.bm25_search("(ancient rise)", top_k=10,
                              operator_or=False, enable_nlq=True).collect()}
        got = {r["row_id"]: r["score"] for r in
               ix.bm25_search("(ancient rise)^1.5", top_k=10,
                              operator_or=False, enable_nlq=True).collect()}
        assert set(got) == set(grp)
        for rid in grp:
            assert abs(got[rid] - 1.5 * grp[rid]) < 1e-9

    def test_invalid_boost_is_literal(self, corpus_a_index):
        # 'spark^x' has no numeric suffix: token kept verbatim (and the
        # analyzer splits on the non-alnum '^'), no crash
        out = corpus_a_index.bm25_search("ancient^x", top_k=10,
                                         operator_or=True, enable_nlq=True)
        assert out.count() >= 0


class TestParserLenience:
    def test_stray_dash_ignored(self, corpus_a_index):
        ix = corpus_a_index
        a = sorted(r["row_id"] for r in
                   ix.bm25_search("ancient - rise", top_k=10,
                                  operator_or=True, enable_nlq=True)
                   .collect())
        b = sorted(r["row_id"] for r in
                   ix.bm25_search("ancient rise", top_k=10,
                                  operator_or=True, enable_nlq=True)
                   .collect())
        assert a == b


class TestCombinedClauses:
    def test_boost_negation_phrase_combined(self, spark, tmp_path_factory):
        """All round-2 NLQ clause types composed in one query, batch ==
        sequential == expected set."""
        from tantivy_search_spark.config import IndexConfig
        from tantivy_search_spark.index.builder import IndexBuilder
        from tantivy_search_spark.search.engine import SearchIndex

        rows = [
            {"doc_id": 0, "text": "alpha moral horizons beta keep"},
            {"doc_id": 1, "text": "alpha moral horizons beta drop bad"},
            {"doc_id": 2, "text": "alpha horizons moral keep"},   # no phrase
            {"doc_id": 3, "text": "gamma keep only"},
        ]
        path = str(tmp_path_factory.mktemp("comb") / "idx")
        cfg = IndexConfig.from_json(["text"], "{}")
        cfg.with_positions = True
        IndexBuilder(spark, path, cfg, rows_per_part=4).build(
            spark.createDataFrame(rows), id_col="doc_id")
        ix = SearchIndex(spark, path)
        # parenthesize so the exclusion scopes over the whole query
        # (an unparenthesized -bad binds to its own OR branch)
        q = '("moral horizons"^2 OR gamma) -bad'
        seq = [(r["row_id"], round(r["score"], 4)) for r in
               ix.bm25_search(q, top_k=10, operator_or=True,
                              enable_nlq=True).collect()]
        # doc 0: phrase (boosted); doc 1 excluded by -bad; doc 2 no
        # phrase; doc 3 gamma
        assert sorted(r for r, _ in seq) == [0, 3]
        batch = [(r["row_id"], round(r["score"], 4)) for r in
                 ix.bm25_search_batch([(q, True)], top_k=10,
                                      enable_nlq=True).collect()]
        assert batch == seq
        # the boost actually doubled the phrase doc's score
        plain = {r["row_id"]: r["score"] for r in
                 ix.bm25_search('("moral horizons" OR gamma) -bad',
                                top_k=10, operator_or=True,
                                enable_nlq=True).collect()}
        got = dict(seq)
        assert abs(got[0] - round(2 * plain[0], 4)) < 1e-3
