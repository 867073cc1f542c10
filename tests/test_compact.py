"""Compaction (reference B8 LogMergePolicy analog): after appends
fragment (col, term, shard) groups into multiple posting rows, compact()
folds them back to minimal rows without changing any query result."""

from pyspark.sql import functions as F

from corpora import corpus_a_rows, part0_rows, part1_rows


QUERIES = [
    ("Ancient empires rise and fall", True),
    ("Human health", False),
    ("ancient", True),
]


def _results(ix):
    out = {}
    for q, op in QUERIES:
        out[(q, op)] = [(r["row_id"], round(r["score"], 4)) for r in
                        ix.bm25_search(q, top_k=100, operator_or=op).collect()]
    return out


class TestCompact:
    def test_compact_preserves_results(self, spark, tmp_path):
        from tantivy_search_spark.config import IndexConfig
        from tantivy_search_spark.index.builder import IndexBuilder
        from tantivy_search_spark.search.engine import SearchIndex

        cfg = IndexConfig.from_json(["col1", "col2", "col3"], "{}")
        cfg.parts_per_shard = 64  # everything in one shard -> max fragmenting
        path = str(tmp_path / "cidx")
        b = IndexBuilder(spark, path, cfg, rows_per_part=4)
        b.build(spark.createDataFrame(part0_rows(0)), id_col="doc_id")
        b.append(spark.createDataFrame(part1_rows(0)), id_col="doc_id")
        b.append(spark.createDataFrame(corpus_a_rows()), id_col="doc_id")

        ix = SearchIndex(spark, path)
        before = _results(ix)
        rows_before = ix._postings.count()
        # hot terms ('the', 'of'...) appear in all three ingests
        frag = (ix._postings.groupBy("col", "term", "shard")
                .agg(F.count("*").alias("n")).where(F.col("n") > 1).count())
        assert frag > 0, "setup should fragment at least one group"

        metrics = b.compact()
        assert metrics["fragmented_rows"] > 0
        ix.reload()
        rows_after = ix._postings.count()
        assert rows_after < rows_before

        # every group now singleton (no sub splits at this tiny scale)
        still_frag = (ix._postings.groupBy("col", "term", "shard")
                      .agg(F.count("*").alias("n")).where(F.col("n") > 1)
                      .count())
        assert still_frag == 0

        assert _results(ix) == before

    def test_compact_noop_on_fresh_index(self, spark, tmp_path):
        from tantivy_search_spark.config import IndexConfig
        from tantivy_search_spark.index.builder import IndexBuilder
        from tantivy_search_spark.search.engine import SearchIndex

        cfg = IndexConfig.from_json(["col1", "col2", "col3"], "{}")
        cfg.parts_per_shard = 2
        path = str(tmp_path / "fresh")
        b = IndexBuilder(spark, path, cfg, rows_per_part=2)
        b.build(spark.createDataFrame(corpus_a_rows()), id_col="doc_id")
        ix = SearchIndex(spark, path)
        before = _results(ix)
        rows_before = ix._postings.count()
        m = b.compact()
        ix.reload()
        # multi-part single-shard groups may still fold; results invariant
        assert ix._postings.count() <= rows_before
        assert _results(ix) == before
        assert m["rows_after"] == ix._postings.count()


class TestMergeRouting:
    def test_hot_groups_merged_tail_passes_through(self, spark, tmp_path):
        """rows_per_part=1 makes every doc its own part: terms in >=5
        docs hit the pandas merge branch, rare terms pass through as
        JVM rows — results identical either way, merged groups have one
        row."""
        from pyspark.sql import functions as F
        from tantivy_search_spark.config import IndexConfig
        from tantivy_search_spark.index.builder import IndexBuilder
        from tantivy_search_spark.search.engine import SearchIndex

        cfg = IndexConfig.from_json(["body"], "{}")
        cfg.parts_per_shard = 16  # all parts in one shard
        path = str(tmp_path / "mr")
        docs = [{"doc_id": i, "body": f"common filler{i} word{i % 2}"}
                for i in range(8)]
        b = IndexBuilder(spark, path, cfg, rows_per_part=1)
        b.merge_hot_df = 5  # tiny corpus: 'common' (df 8) is the hot term
        b.build(spark.createDataFrame(docs), id_col="doc_id")
        ix = SearchIndex(spark, path)
        # 'common' (df 8 >= merge_hot_df) -> one merged row
        hot = ix._postings.where(F.col("term") == "common").collect()
        assert len(hot) == 1 and hot[0]["df"] == 8
        # 'word0'/'word1' (df 4 < merge_hot_df) -> pass-through rows
        rare = ix._postings.where(F.col("term") == "word0").collect()
        assert len(rare) == 4 and all(r["df"] == 1 for r in rare)
        # queries agree across the mixed layout
        got = [(r["row_id"], round(r["score"], 4)) for r in
               ix.bm25_search("common word0", top_k=10,
                              operator_or=False).collect()]
        assert [rid for rid, _ in got] == [0, 2, 4, 6]
        loc = [(rid, round(s, 4)) for rid, s in
               ix.bm25_search_local("common word0", top_k=10,
                                    operator_or=False)]
        assert loc == got


class TestOptimizeLayout:
    def test_optimize_preserves_everything(self, spark, tmp_path):
        """optimize_layout() is a pure row-preserving rewrite: every
        query path (Spark BM25, embedded BM25/WAND, bitmaps byte-level,
        deletes) answers identically, and the row multiset survives."""
        from tantivy_search_spark.config import IndexConfig
        from tantivy_search_spark.index.builder import IndexBuilder
        from tantivy_search_spark.search.engine import SearchIndex

        cfg = IndexConfig.from_json(["col1", "col2", "col3"], "{}")
        cfg.parts_per_shard = 2
        path = str(tmp_path / "oidx")
        b = IndexBuilder(spark, path, cfg, rows_per_part=4)
        b.build(spark.createDataFrame(corpus_a_rows()), id_col="doc_id")

        ix = SearchIndex(spark, path)
        ix.delete_row_ids([1])
        before = _results(ix)
        bm_before = ix.query_term_bitmap("col1", "ancient")
        rows_before = sorted(
            (r["col"], r["term"], r["shard"], r["sub"], bytes(r["deltas"]))
            for r in ix._postings.collect())
        loc = SearchIndex.open_local(path)
        local_before = loc.bm25_search_local(
            "Ancient empires rise and fall", top_k=20, operator_or=True,
            use_wand=True)
        loc.close()

        metrics = b.optimize_layout(row_group_mb=1)
        assert metrics["secs"] > 0
        ix.reload()

        assert _results(ix) == before
        assert ix.query_term_bitmap("col1", "ancient") == bm_before
        rows_after = sorted(
            (r["col"], r["term"], r["shard"], r["sub"], bytes(r["deltas"]))
            for r in ix._postings.collect())
        assert rows_after == rows_before
        loc = SearchIndex.open_local(path)
        assert loc.bm25_search_local(
            "Ancient empires rise and fall", top_k=20, operator_or=True,
            use_wand=True) == local_before
        loc.close()


class TestAutoCompact:
    def test_append_auto_compacts_at_threshold(self, spark, tmp_path):
        """LogMergePolicy analog: append(auto_compact_min_rows=3) folds
        once a (col, term, shard) group reaches 3 rows, results invariant
        (reference merges in the background once >= 5 segments,
        index_manager.rs:90-92)."""
        from tantivy_search_spark.config import IndexConfig
        from tantivy_search_spark.index.builder import IndexBuilder
        from tantivy_search_spark.search.engine import SearchIndex

        cfg = IndexConfig.from_json(["col1", "col2", "col3"], "{}")
        cfg.parts_per_shard = 64
        path = str(tmp_path / "auto")
        b = IndexBuilder(spark, path, cfg, rows_per_part=4)
        b.build(spark.createDataFrame(part0_rows(0)), id_col="doc_id")
        b.append(spark.createDataFrame(part1_rows(0)), id_col="doc_id",
                 auto_compact_min_rows=3)
        ix = SearchIndex(spark, path)
        # 2 ingests: below threshold, nothing folded yet
        frag2 = (ix._postings.groupBy("col", "term", "shard")
                 .agg(F.count("*").alias("n")).where(F.col("n") >= 3).count())
        before = _results(ix)
        b.append(spark.createDataFrame(corpus_a_rows()), id_col="doc_id",
                 auto_compact_min_rows=3)
        ix.reload()
        after_rows = (ix._postings.groupBy("col", "term", "shard")
                      .agg(F.count("*").alias("n")).where(F.col("n") >= 3)
                      .count())
        assert frag2 == 0 or after_rows < frag2
        assert after_rows == 0  # third ingest tripped the fold
        # old-doc rows survive (scores shift with corpus growth)
        for k in before:
            assert {x[0] for x in before[k]} <= \
                {x[0] for x in _results(ix)[k]}, k
