"""Incremental ingest: batch append (reference B4/B5 + reader reload)
and the Structured-Streaming foreachBatch sink."""

import os

import pytest

from corpora import corpus_a_rows, part0_rows, part1_rows


class TestAppend:
    def test_append_equals_bulk_build(self, spark, tmp_path):
        """build(part0) + append(part1) answers like build(part0+part1):
        same hits; scores equal because global stats refresh on commit."""
        from tantivy_search_spark.config import IndexConfig
        from tantivy_search_spark.index.builder import IndexBuilder
        from tantivy_search_spark.search.engine import SearchIndex

        def cfg():
            c = IndexConfig.from_json(["col1", "col2", "col3"], "{}")
            c.parts_per_shard = 2
            return c

        inc_path = str(tmp_path / "inc")
        b = IndexBuilder(spark, inc_path, cfg(), rows_per_part=4)
        b.build(spark.createDataFrame(part0_rows(0)), id_col="doc_id")
        ix = SearchIndex(spark, inc_path)
        n_before = ix.bm25_search("Human health", top_k=100).count()
        assert n_before == 1  # only part0's row 9 col2 has human+health? -> check bulk

        # append part1 with explicit local ids; append() offsets them
        b.append(spark.createDataFrame(part1_rows(0)), id_col="doc_id")
        ix.reload()

        bulk_path = str(tmp_path / "bulk")
        IndexBuilder(spark, bulk_path, cfg(), rows_per_part=4).build(
            spark.createDataFrame(part0_rows(0) + part1_rows(12)),
            id_col="doc_id")
        bulk = SearchIndex(spark, bulk_path)

        for q, op in (("Human health", False),
                      ("Ancient provide wisdom modern dilemmas", True)):
            got = [round(r["score"], 3) for r in
                   ix.bm25_search(q, top_k=100, operator_or=op).collect()]
            want = [round(r["score"], 3) for r in
                    bulk.bm25_search(q, top_k=100, operator_or=op).collect()]
            assert sorted(got) == sorted(want), q

        assert ix.get_total_num_docs() == 30
        assert ix.get_total_num_tokens() == bulk.get_total_num_tokens()

    def test_append_then_delete(self, spark, tmp_path):
        from tantivy_search_spark.config import IndexConfig
        from tantivy_search_spark.index.builder import IndexBuilder
        from tantivy_search_spark.search.engine import SearchIndex

        path = str(tmp_path / "ad")
        cfg = IndexConfig.from_json(["col1", "col2", "col3"], "{}")
        b = IndexBuilder(spark, path, cfg, rows_per_part=3)
        b.build(spark.createDataFrame(corpus_a_rows()), id_col="doc_id")
        b.append(spark.createDataFrame(corpus_a_rows()), id_col="doc_id")
        ix = SearchIndex(spark, path)
        # corpus A twice: 'Ancient' in rows {0,4} and appended copies
        hits = ix.bm25_search("Ancient", top_k=100, operator_or=True)
        ids = sorted(r["row_id"] for r in hits.collect())
        assert len(ids) == 4 and ids[0] == 0
        ix.delete_row_ids(ids[2:])
        hits2 = ix.bm25_search("Ancient", top_k=100, operator_or=True)
        assert sorted(r["row_id"] for r in hits2.collect()) == ids[:2]


class TestStreamingIngest:
    def test_foreachbatch_sink(self, spark, tmp_path):
        from tantivy_search_spark.config import IndexConfig
        from tantivy_search_spark.search.engine import SearchIndex
        from tantivy_search_spark.streaming.ingest import stream_ingest

        src_dir = str(tmp_path / "src")
        os.makedirs(src_dir)
        idx_path = str(tmp_path / "sidx")

        spark.createDataFrame(part0_rows(0)).write.mode("append").parquet(src_dir)

        cfg = IndexConfig.from_json(["col1", "col2", "col3"], "{}")
        stream = spark.readStream.schema(
            "doc_id long, col1 string, col2 string, col3 string"
        ).parquet(src_dir).drop("doc_id")
        q = stream_ingest(spark, stream, idx_path, cfg, rows_per_part=4,
                          checkpoint_dir=str(tmp_path / "ckpt"),
                          order_cols=["col1"])
        q.awaitTermination(120)

        ix = SearchIndex(spark, idx_path)
        assert ix.get_total_num_docs() == 10
        assert ix.bm25_search("Ancient", top_k=100,
                              operator_or=True).count() == 2

        # second wave of files -> second availableNow run appends
        spark.createDataFrame(part1_rows(0)).write.mode("append").parquet(src_dir)
        q2 = stream_ingest(spark, stream, idx_path, cfg, rows_per_part=4,
                           checkpoint_dir=str(tmp_path / "ckpt"),
                           order_cols=["col1"])
        q2.awaitTermination(120)
        ix.reload()
        assert ix.get_total_num_docs() == 30
        assert ix.bm25_search("Human health", top_k=100).count() == 2


class TestAppendCrashRepair:
    def test_crashed_append_repaired_before_next(self, spark, tmp_path):
        """A crash mid-append leaves orphan docs/postings files with ids
        above the committed meta range; without repair the NEXT append
        would re-assign the same id range (duplicate doc ids).  repair()
        — run automatically at append() start — must drop exactly the
        orphan files and leave queries identical to the pre-crash
        state, and the follow-up append must produce a correct index."""
        import os

        from corpora import corpus_a_rows
        from tantivy_search_spark.config import IndexConfig
        from tantivy_search_spark.index.builder import IndexBuilder
        from tantivy_search_spark.search.engine import SearchIndex

        path = str(tmp_path / "crash_idx")
        cfg = IndexConfig.from_json(["col1", "col2", "col3"], "{}")
        b = IndexBuilder(spark, path, cfg, rows_per_part=2)
        rows = corpus_a_rows()
        b.build(spark.createDataFrame(rows[:3]), id_col="doc_id")
        ix = SearchIndex(spark, path)
        before = [(r["row_id"], round(r["score"], 4)) for r in
                  ix.bm25_search("Ancient", top_k=10,
                                 operator_or=True).collect()]

        # simulate a crash mid-append: docs + postings written for the
        # new rows, but NO meta save (kill before the final step)
        orig_save = type(ix.meta).save

        def bomb(self_meta, p):
            raise RuntimeError("injected crash before meta save")

        type(ix.meta).save = bomb
        try:
            with __import__("pytest").raises(RuntimeError):
                b.append(spark.createDataFrame(
                    [{**r, "doc_id": r["doc_id"] - 3} for r in rows[3:]]),
                    id_col="doc_id")
        finally:
            type(ix.meta).save = orig_save

        # orphan postings visible pre-repair; repair restores the
        # committed state exactly
        rep = b.repair()
        assert rep["docs"] >= 1 and rep["postings"] >= 1
        assert rep["segment_chunks"] >= 1
        ix2 = SearchIndex(spark, path)
        after = [(r["row_id"], round(r["score"], 4)) for r in
                 ix2.bm25_search("Ancient", top_k=10,
                                 operator_or=True).collect()]
        assert after == before
        assert b.repair() == {"docs": 0, "postings": 0,
                              "segment_chunks": 0,
                              "stats_rebuilt": False}  # idempotent

        # the retried append (auto-repair already clean) now succeeds
        # and equals a from-scratch full build
        b.append(spark.createDataFrame(
            [{**r, "doc_id": r["doc_id"] - 3} for r in rows[3:]]),
            id_col="doc_id")
        ix3 = SearchIndex(spark, path)
        full_path = str(tmp_path / "full_idx")
        IndexBuilder(spark, full_path, cfg, rows_per_part=2).build(
            spark.createDataFrame(rows), id_col="doc_id")
        full = SearchIndex(spark, full_path)
        # append assigns part-aligned ids (4, 5) for the second half, so
        # compare by score multiset + totals rather than raw row ids
        got = sorted(round(r["score"], 4) for r in
                     ix3.bm25_search("Ancient", top_k=10,
                                     operator_or=True).collect())
        want = sorted(round(r["score"], 4) for r in
                      full.bm25_search("Ancient", top_k=10,
                                       operator_or=True).collect())
        assert got == want and len(got) == 2
        assert ix3.meta.total_tokens == full.meta.total_tokens
        # doc ids unique across the repaired + appended index
        n = ix3.docs.count()
        assert ix3.docs.select("doc_id").distinct().count() == n == 5
