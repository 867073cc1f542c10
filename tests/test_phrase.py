"""True phrase queries over a positions-enabled index (reference
WithFreqsAndPositions, index_manager.rs:64; quoted NLQ no longer
silently degrades to AND when positions are stored)."""

import pytest

from pyspark.sql import functions as F


ROWS = [
    {"doc_id": 0, "text": "the moral horizons of ancient man"},
    {"doc_id": 1, "text": "horizons moral the reversed order"},     # AND yes, phrase no
    {"doc_id": 2, "text": "moral and also horizons far apart"},     # AND yes, phrase no
    {"doc_id": 3, "text": "deep moral horizons moral horizons wide"},
    {"doc_id": 4, "text": "nothing relevant here at all"},
    {"doc_id": 5, "text": "moral ending"},
    {"doc_id": 6, "text": "start horizons moral horizons trailing"},
]


@pytest.fixture(scope="module")
def pos_index(spark, tmp_path_factory):
    from tantivy_search_spark.config import IndexConfig
    from tantivy_search_spark.index.builder import IndexBuilder
    from tantivy_search_spark.search.engine import SearchIndex

    path = str(tmp_path_factory.mktemp("pidx") / "pos")
    cfg = IndexConfig.from_json(["text"], "{}")
    cfg.with_positions = True
    cfg.parts_per_shard = 2
    cfg.n_buckets = 8
    IndexBuilder(spark, path, cfg, rows_per_part=3).build(
        spark.createDataFrame(ROWS), id_col="doc_id")
    return SearchIndex(spark, path)


class TestPhrase:
    def test_phrase_matches_only_adjacent(self, pos_index):
        got = pos_index.bm25_search('"moral horizons"', enable_nlq=True,
                                    top_k=10).collect()
        assert sorted(r["row_id"] for r in got) == [0, 3, 6]

    def test_and_still_matches_non_adjacent(self, pos_index):
        got = pos_index.bm25_search("moral horizons", operator_or=False,
                                    top_k=10).collect()
        assert sorted(r["row_id"] for r in got) == [0, 1, 2, 3, 6]

    def test_phrase_score_is_member_sum(self, pos_index):
        """Documented semantics: phrase docs score as the AND group."""
        phrase = {r["row_id"]: round(r["score"], 6) for r in
                  pos_index.bm25_search('"moral horizons"', enable_nlq=True,
                                        top_k=10).collect()}
        anded = {r["row_id"]: round(r["score"], 6) for r in
                 pos_index.bm25_search("moral horizons", operator_or=False,
                                       top_k=10).collect()}
        for rid, sc in phrase.items():
            assert sc == anded[rid], rid

    def test_phrase_in_boolean_tree(self, pos_index):
        got = pos_index.bm25_search('"moral horizons" OR relevant',
                                    enable_nlq=True, top_k=10).collect()
        assert sorted(r["row_id"] for r in got) == [0, 3, 4, 6]

    def test_local_falls_back_consistently(self, pos_index):
        pos_index.enable_stats_cache()
        loc = pos_index.bm25_search_local('"moral horizons"',
                                          enable_nlq=True, top_k=10)
        dist = [(r["row_id"], round(r["score"], 4)) for r in
                pos_index.bm25_search('"moral horizons"', enable_nlq=True,
                                      top_k=10).collect()]
        assert [(r, round(s, 4)) for r, s in loc] == dist

    def test_positions_free_index_degrades_to_and(self, spark,
                                                  tmp_path_factory):
        from tantivy_search_spark.config import IndexConfig
        from tantivy_search_spark.index.builder import IndexBuilder
        from tantivy_search_spark.search.engine import SearchIndex

        path = str(tmp_path_factory.mktemp("pidx") / "nopos")
        cfg = IndexConfig.from_json(["text"], "{}")
        IndexBuilder(spark, path, cfg, rows_per_part=3).build(
            spark.createDataFrame(ROWS), id_col="doc_id")
        ix = SearchIndex(spark, path)
        got = ix.bm25_search('"moral horizons"', enable_nlq=True,
                             top_k=10).collect()
        # round-1 behavior preserved for the default layout
        assert sorted(r["row_id"] for r in got) == [0, 1, 2, 3, 6]

    def test_phrase_after_delete(self, pos_index):
        import os
        import shutil
        src = pos_index
        # copy the index dir so the module fixture stays intact
        dst = src.index_path + "_delcopy"
        shutil.rmtree(dst, ignore_errors=True)
        shutil.copytree(src.index_path, dst)
        from tantivy_search_spark.search.engine import SearchIndex
        ix = SearchIndex(src.spark, dst)
        ix.delete_row_ids([0])
        got = ix.bm25_search('"moral horizons"', enable_nlq=True,
                             top_k=10).collect()
        assert sorted(r["row_id"] for r in got) == [3, 6]
        shutil.rmtree(dst)


class TestPositionsSurviveMaintenance:
    def test_append_and_compact_keep_positions(self, spark, tmp_path):
        from tantivy_search_spark.config import IndexConfig
        from tantivy_search_spark.index.builder import IndexBuilder
        from tantivy_search_spark.search.engine import SearchIndex

        path = str(tmp_path / "pos_app")
        cfg = IndexConfig.from_json(["text"], "{}")
        cfg.with_positions = True
        cfg.parts_per_shard = 2
        b = IndexBuilder(spark, path, cfg, rows_per_part=4)
        b.build(spark.createDataFrame(ROWS[:4]), id_col="doc_id")
        b.append(spark.createDataFrame(
            [{"doc_id": r["doc_id"] - 4, "text": r["text"]}
             for r in ROWS[4:]]), id_col="doc_id")
        b.compact(min_rows_per_group=1)  # force full rewrite
        ix = SearchIndex(spark, path)
        got = ix.bm25_search('"moral horizons"', enable_nlq=True,
                             top_k=10).collect()
        assert sorted(r["row_id"] for r in got) == [0, 3, 6]


class TestPhraseBatch:
    def test_batch_with_phrase_equals_sequential(self, pos_index):
        qs = [('"moral horizons" OR relevant', False),
              ("moral horizons", False),
              ('"moral horizons"', True)]
        batch = pos_index.bm25_search_batch(qs, top_k=10,
                                            enable_nlq=True).collect()
        by_q = {}
        for r in batch:
            by_q.setdefault(r["query_id"], []).append(
                (r["row_id"], round(r["score"], 4)))
        for qid, (s, op_or) in enumerate(qs):
            want = [(r["row_id"], round(r["score"], 4)) for r in
                    pos_index.bm25_search(s, top_k=10, operator_or=op_or,
                                          enable_nlq=True).collect()]
            assert by_q.get(qid, []) == want, (qid, s)


class TestPhraseSlop:
    """'"a b"~N' (tantivy QueryParser slop): in-order with a cumulative
    gap budget; transpositions never match."""

    def test_slop_widens_matches_in_order_only(self, pos_index):
        # doc 2 has 'moral and also horizons' -> gap 2; doc 1 is the
        # reversed order and must never match at any slop
        for q, want in [('"moral horizons"~0', [0, 3, 6]),
                        ('"moral horizons"~1', [0, 3, 6]),
                        ('"moral horizons"~2', [0, 2, 3, 6]),
                        ('"moral horizons"~9', [0, 2, 3, 6])]:
            got = pos_index.bm25_search(q, enable_nlq=True,
                                        top_k=10).collect()
            assert sorted(r["row_id"] for r in got) == want, q

    def test_slop_score_is_member_sum(self, pos_index):
        sloppy = {r["row_id"]: round(r["score"], 6) for r in
                  pos_index.bm25_search('"moral horizons"~2',
                                        enable_nlq=True, top_k=10).collect()}
        anded = {r["row_id"]: round(r["score"], 6) for r in
                 pos_index.bm25_search("moral horizons", operator_or=False,
                                       top_k=10).collect()}
        for rid, sc in sloppy.items():
            assert sc == anded[rid], rid

    def test_slop_local_equals_distributed(self, pos_index):
        pos_index.enable_stats_cache()
        loc = [(r, round(s, 4)) for r, s in
               pos_index.bm25_search_local('"moral horizons"~2',
                                           enable_nlq=True, top_k=10)]
        dist = [(r["row_id"], round(r["score"], 4)) for r in
                pos_index.bm25_search('"moral horizons"~2',
                                      enable_nlq=True, top_k=10).collect()]
        assert loc == dist

    def test_slop_with_boost_and_negation(self, pos_index):
        # fused '~2^2' token: slop then boost; scores double vs plain slop
        plain = {r["row_id"]: r["score"] for r in
                 pos_index.bm25_search('"moral horizons"~2',
                                       enable_nlq=True, top_k=10).collect()}
        boosted = {r["row_id"]: r["score"] for r in
                   pos_index.bm25_search('"moral horizons"~2^2',
                                         enable_nlq=True, top_k=10).collect()}
        assert set(boosted) == set(plain)
        for rid, sc in boosted.items():
            assert round(sc, 6) == round(2 * plain[rid], 6)
        neg = pos_index.bm25_search('relevant -"moral horizons"~2',
                                    enable_nlq=True, top_k=10).collect()
        assert sorted(r["row_id"] for r in neg) == [4]

    def test_three_term_cumulative_budget(self, spark, tmp_path):
        from tantivy_search_spark.config import IndexConfig
        from tantivy_search_spark.index.builder import IndexBuilder
        from tantivy_search_spark.search.engine import SearchIndex

        rows = [
            {"doc_id": 0, "text": "alpha beta gamma"},
            {"doc_id": 1, "text": "alpha x beta gamma"},        # gap 1
            {"doc_id": 2, "text": "alpha x beta y gamma"},      # gaps 1+1
            {"doc_id": 3, "text": "alpha x y beta z w gamma"},  # gaps 2+2
        ]
        path = str(tmp_path / "slop3")
        cfg = IndexConfig.from_json(["text"], "{}")
        cfg.with_positions = True
        IndexBuilder(spark, path, cfg, rows_per_part=4).build(
            spark.createDataFrame(rows), id_col="doc_id")
        ix = SearchIndex(spark, path)
        for q, want in [('"alpha beta gamma"', [0]),
                        ('"alpha beta gamma"~1', [0, 1]),
                        ('"alpha beta gamma"~2', [0, 1, 2]),
                        ('"alpha beta gamma"~4', [0, 1, 2, 3])]:
            got = ix.bm25_search(q, enable_nlq=True, top_k=10).collect()
            assert sorted(r["row_id"] for r in got) == want, q


class TestLocalPhrase:
    def test_local_phrase_native_no_spark_job_warm(self, pos_index):
        """Phrase trees are flat now (one pseudo-atom), so the local
        path evaluates them in-process: warm queries run zero jobs."""
        pos_index.enable_stats_cache()
        first = pos_index.bm25_search_local('"moral horizons"',
                                            enable_nlq=True, top_k=10)
        tracker = pos_index.spark.sparkContext.statusTracker()
        before = tracker.getJobIdsForGroup(None)
        again = pos_index.bm25_search_local('"moral horizons"',
                                            enable_nlq=True, top_k=10)
        after = tracker.getJobIdsForGroup(None)
        assert again == first
        assert len(after) == len(before), "warm local phrase ran a job"
        dist = [(r["row_id"], round(r["score"], 4)) for r in
                pos_index.bm25_search('"moral horizons"', enable_nlq=True,
                                      top_k=10).collect()]
        assert [(r, round(s, 4)) for r, s in again] == dist

    def test_local_phrase_in_boolean_tree(self, pos_index):
        pos_index.enable_stats_cache()
        loc = [(r, round(s, 4)) for r, s in
               pos_index.bm25_search_local('"moral horizons" OR relevant',
                                           enable_nlq=True, top_k=10)]
        dist = [(r["row_id"], round(r["score"], 4)) for r in
                pos_index.bm25_search('"moral horizons" OR relevant',
                                      enable_nlq=True, top_k=10).collect()]
        assert loc == dist


STOP_ROWS = [
    {"doc_id": 0, "text": "quick fox runs"},          # adjacent
    {"doc_id": 1, "text": "quick the fox runs"},      # stopword hole (gap 2)
    {"doc_id": 2, "text": "quick brown fox runs"},    # real token between
    {"doc_id": 3, "text": "fox quick runs"},          # reversed
    {"doc_id": 4, "text": "quick red brown fox"},     # gap 3
]


@pytest.fixture(scope="module")
def stop_pos_index(spark, tmp_path_factory):
    """Positions index over a stop-word chain: tantivy assigns positions
    at tokenization, so removed stop words leave GAPS (reference
    StopWordFilter is a tantivy-level filter; build_analyzer_pos)."""
    from tantivy_search_spark.config import IndexConfig
    from tantivy_search_spark.index.builder import IndexBuilder
    from tantivy_search_spark.search.engine import SearchIndex

    path = str(tmp_path_factory.mktemp("pidx") / "stop_pos")
    cfg = IndexConfig.from_json(
        ["text"],
        '{"text": {"tokenizer": {"type": "simple", '
        '"stop_word_filters": ["english"]}}}')
    cfg.with_positions = True
    cfg.parts_per_shard = 2
    cfg.n_buckets = 8
    IndexBuilder(spark, path, cfg, rows_per_part=2).build(
        spark.createDataFrame(STOP_ROWS), id_col="doc_id")
    return SearchIndex(spark, path)


class TestStopwordPositionGaps:
    """tantivy parity: positions are assigned BEFORE the stop-word
    filter, so '"quick fox"' does NOT match 'quick the fox', and a
    stop word INSIDE the quotes widens the required gap
    (PhraseQuery::new_with_offset semantics)."""

    def test_phrase_does_not_match_across_removed_stopword(
            self, stop_pos_index):
        got = stop_pos_index.bm25_search('"quick fox"', enable_nlq=True,
                                         top_k=10).collect()
        assert sorted(r["row_id"] for r in got) == [0]

    def test_stopword_in_query_widens_gap(self, stop_pos_index):
        # query tokens (quick, fox) at offsets (0, 2): matches both the
        # stopword hole (doc 1) and a real token between (doc 2)
        got = stop_pos_index.bm25_search('"quick the fox"',
                                         enable_nlq=True,
                                         top_k=10).collect()
        assert sorted(r["row_id"] for r in got) == [1, 2]

    def test_slop_displacement_both_directions(self, stop_pos_index):
        # slop 1 over query gap 1: doc 0 exact, docs 1/2 displaced +1
        got = stop_pos_index.bm25_search('"quick fox"~1',
                                         enable_nlq=True,
                                         top_k=10).collect()
        assert sorted(r["row_id"] for r in got) == [0, 1, 2]
        # slop 1 over query gap 2 ("quick the fox"~1): doc 0 (closer by
        # one, displacement 1), docs 1/2 exact, doc 4 (wider by one)
        got = stop_pos_index.bm25_search('"quick the fox"~1',
                                         enable_nlq=True,
                                         top_k=10).collect()
        assert sorted(r["row_id"] for r in got) == [0, 1, 2, 4]

    def test_reversed_never_matches(self, stop_pos_index):
        got = stop_pos_index.bm25_search('"quick fox"~4',
                                         enable_nlq=True,
                                         top_k=10).collect()
        assert 3 not in {r["row_id"] for r in got}

    def test_local_equals_distributed_with_offsets(self, stop_pos_index):
        stop_pos_index.enable_stats_cache()
        for q in ('"quick the fox"', '"quick fox"~1', '"quick the fox"~1'):
            loc = [(r, round(s, 4)) for r, s in
                   stop_pos_index.bm25_search_local(q, enable_nlq=True,
                                                    top_k=10)]
            dist = [(r["row_id"], round(r["score"], 4)) for r in
                    stop_pos_index.bm25_search(q, enable_nlq=True,
                                               top_k=10).collect()]
            assert loc == dist, q

    def test_batch_with_offset_phrase_equals_sequential(
            self, stop_pos_index):
        qs = [('"quick the fox"', False), ('"quick fox"~1', False)]
        batch = stop_pos_index.bm25_search_batch(
            qs, top_k=10, enable_nlq=True).collect()
        by_q = {}
        for r in batch:
            by_q.setdefault(r["query_id"], []).append(
                (r["row_id"], round(r["score"], 4)))
        for i, (q, op_or) in enumerate(qs):
            seq = [(r["row_id"], round(r["score"], 4)) for r in
                   stop_pos_index.bm25_search(q, operator_or=op_or,
                                              enable_nlq=True,
                                              top_k=10).collect()]
            assert sorted(by_q.get(i, [])) == sorted(seq), q
