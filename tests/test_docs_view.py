"""docs_mode='view': the index never copies the corpus — the docs
table is reconstructed lazily from the pinned source-parquet snapshot
(doc_id = per-file offset + _metadata.row_index), with only a slim
(doc_id, sha256) audit sidecar written at build time.

Pinned here: view docs ≡ copy docs (rows and schema), with_docs joins
identical, the audit sidecar matches on-read hashes, deletes mask in
view mode, and append/purge are rejected with clear errors.
"""

import os

import pytest

from pyspark.sql import functions as F

from tantivy_search_spark.config import IndexConfig
from tantivy_search_spark.index.builder import IndexBuilder
from tantivy_search_spark.search.engine import SearchIndex


def _cfg(store_doc=True):
    import json
    spec = {"col1": {"tokenizer": {"type": "default", "store_doc": store_doc}}}
    cfg = IndexConfig.from_json(["col1"], json.dumps(spec))
    cfg.n_buckets = 4
    cfg.parts_per_shard = 2
    return cfg


@pytest.fixture()
def corpus_parquet(spark, tmp_path):
    from corpora import corpus_a_rows

    rows = [{"tag": f"t{r['doc_id']:03d}", "col1": r["col1"]}
            for r in corpus_a_rows()]
    path = str(tmp_path / "corpus")
    spark.createDataFrame(rows).repartition(3).write.parquet(path)
    return path


def _build(spark, tmp_path, corpus_parquet, name, **kw):
    path = str(tmp_path / name)
    src = spark.read.parquet(corpus_parquet)
    IndexBuilder(spark, path, _cfg(kw.pop("store_doc", True)),
                 rows_per_part=2).build(src, position_ids=True, **kw)
    return SearchIndex(spark, path)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestDocsView:
    def test_view_equals_copy(self, spark, tmp_path, corpus_parquet):
        ix_c = _build(spark, tmp_path, corpus_parquet, "copy",
                      docs_mode="copy")
        ix_v = _build(spark, tmp_path, corpus_parquet, "view",
                      docs_mode="view")
        assert ix_v.meta.docs_mode == "view"
        assert ix_c.docs.columns == ix_v.docs.columns
        assert _rows(ix_c.docs) == _rows(ix_v.docs)

    def test_view_equals_copy_no_store_doc(self, spark, tmp_path,
                                           corpus_parquet):
        ix_c = _build(spark, tmp_path, corpus_parquet, "copy",
                      docs_mode="copy", store_doc=False)
        ix_v = _build(spark, tmp_path, corpus_parquet, "view",
                      docs_mode="view", store_doc=False)
        assert ix_c.docs.columns == ix_v.docs.columns
        assert "col1" not in ix_v.docs.columns  # content not stored
        assert _rows(ix_c.docs) == _rows(ix_v.docs)

    def test_sidecar_matches_on_read_hashes(self, spark, tmp_path,
                                            corpus_parquet):
        ix_v = _build(spark, tmp_path, corpus_parquet, "view2",
                      docs_mode="view")
        side = spark.read.parquet(os.path.join(ix_v.index_path, "docs"))
        assert set(side.columns) == {"doc_id", "sha256_col1"}
        assert _rows(side) == _rows(ix_v.docs.select("doc_id", "sha256_col1"))

    def test_with_docs_identical(self, spark, tmp_path, corpus_parquet):
        ix_c = _build(spark, tmp_path, corpus_parquet, "copy3",
                      docs_mode="copy")
        ix_v = _build(spark, tmp_path, corpus_parquet, "view3",
                      docs_mode="view")
        q = ("ancient", True)
        a = ix_c.bm25_search(q[0], top_k=10, operator_or=q[1], with_docs=True)
        b = ix_v.bm25_search(q[0], top_k=10, operator_or=q[1], with_docs=True)
        assert a.columns == b.columns
        ra = [(r["row_id"], round(r["score"], 6), r["tag"]) for r in a.collect()]
        rb = [(r["row_id"], round(r["score"], 6), r["tag"]) for r in b.collect()]
        assert ra == rb

    def test_scores_match_copy_build(self, spark, tmp_path, corpus_parquet):
        ix_c = _build(spark, tmp_path, corpus_parquet, "copy4",
                      docs_mode="copy")
        ix_v = _build(spark, tmp_path, corpus_parquet, "view4",
                      docs_mode="view")
        for q, op in [("Ancient empires rise and fall", True),
                      ("ancient", True), ("ancient wisdom", False)]:
            a = [(r["row_id"], round(r["score"], 6)) for r in
                 ix_c.bm25_search(q, top_k=10, operator_or=op).collect()]
            b = [(r["row_id"], round(r["score"], 6)) for r in
                 ix_v.bm25_search(q, top_k=10, operator_or=op).collect()]
            assert a == b

    def test_delete_masks_in_view_mode(self, spark, tmp_path, corpus_parquet):
        ix_v = _build(spark, tmp_path, corpus_parquet, "view5",
                      docs_mode="view")
        before = {r["row_id"] for r in
                  ix_v.bm25_search("ancient", top_k=10,
                                   operator_or=True).collect()}
        victim = min(before)
        ix_v.delete_row_ids([victim])
        after = {r["row_id"] for r in
                 ix_v.bm25_search("ancient", top_k=10,
                                  operator_or=True).collect()}
        assert victim not in after
        assert after == before - {victim}

    def test_append_rejected(self, spark, tmp_path, corpus_parquet):
        ix_v = _build(spark, tmp_path, corpus_parquet, "view6",
                      docs_mode="view")
        b = IndexBuilder(spark, ix_v.index_path, _cfg(), rows_per_part=2)
        with pytest.raises(ValueError, match="docs_mode='view'"):
            b.append(spark.read.parquet(corpus_parquet))

    def test_purge_rejected(self, spark, tmp_path, corpus_parquet):
        ix_v = _build(spark, tmp_path, corpus_parquet, "view7",
                      docs_mode="view")
        ix_v.delete_row_ids([0])
        b = IndexBuilder(spark, ix_v.index_path, _cfg(), rows_per_part=2)
        with pytest.raises(ValueError, match="purge_deletes"):
            b.compact(purge_deletes=True)

    def test_defer_equals_sidecar(self, spark, tmp_path, corpus_parquet):
        """docs_sha='defer' writes NO docs table at all; docs rows,
        meta, and scores still match the sidecar view build."""
        ix_s = _build(spark, tmp_path, corpus_parquet, "side9",
                      docs_mode="view")
        ix_d = _build(spark, tmp_path, corpus_parquet, "defer9",
                      docs_mode="view", docs_sha="defer")
        assert not os.path.exists(os.path.join(ix_d.index_path, "docs"))
        assert _rows(ix_s.docs) == _rows(ix_d.docs)
        from tantivy_search_spark.index import layout as L
        assert [list(map(int, x)) for x in L.part_bounds(ix_s.meta)] \
            == [list(map(int, x)) for x in L.part_bounds(ix_d.meta)]
        assert ix_s.meta.total_tokens == ix_d.meta.total_tokens
        a = [(r["row_id"], round(r["score"], 6)) for r in
             ix_s.bm25_search("ancient", top_k=10, operator_or=True).collect()]
        b = [(r["row_id"], round(r["score"], 6)) for r in
             ix_d.bm25_search("ancient", top_k=10, operator_or=True).collect()]
        assert a == b

    def test_defer_meta_is_dense(self, spark, tmp_path, corpus_parquet):
        """defer metas carry the O(1) dense descriptor instead of one
        part_ranges entry per part; part_bounds() expands identically
        to a sidecar build's explicit list."""
        from tantivy_search_spark.index import layout as L
        ix_s = _build(spark, tmp_path, corpus_parquet, "sideA",
                      docs_mode="view")
        ix_d = _build(spark, tmp_path, corpus_parquet, "deferA",
                      docs_mode="view", docs_sha="defer")
        assert ix_d.meta.part_ranges is None
        assert ix_d.meta.dense_ranges == [ix_d.meta.total_docs, 2]
        assert [list(map(int, x)) for x in L.part_bounds(ix_d.meta)] \
            == [list(map(int, x)) for x in L.part_bounds(ix_s.meta)]

    def test_defer_wand_cogrouped_deletes(self, spark, tmp_path,
                                          corpus_parquet, monkeypatch):
        """Over-cap delete sets route WAND through the cogrouped
        tombstone tier; on a dense meta the doc->shard mapping is pure
        arithmetic (no ranges broadcast).  Results must equal the
        broadcast tier's."""
        from tantivy_search_spark.search.engine import SearchIndex as SI
        ix = _build(spark, tmp_path, corpus_parquet, "deferB",
                    docs_mode="view", docs_sha="defer")
        baseline = [(r["row_id"], round(r["score"], 6)) for r in
                    ix.bm25_search("ancient", top_k=10, operator_or=True,
                                   use_wand=True).collect()]
        victim = baseline[0][0]
        ix.delete_row_ids([victim])
        bcast = [(r["row_id"], round(r["score"], 6)) for r in
                 ix.bm25_search("ancient", top_k=10, operator_or=True,
                                use_wand=True).collect()]
        monkeypatch.setattr(type(ix), "TOMBSTONE_BROADCAST_MAX", 0)
        ix2 = SI(spark, ix.index_path)
        ix2.enable_stats_cache()
        cogrp = [(r["row_id"], round(r["score"], 6)) for r in
                 ix2.bm25_search("ancient", top_k=10, operator_or=True,
                                 use_wand=True).collect()]
        assert victim not in [r for r, _ in cogrp]
        assert cogrp == bcast

    def test_defer_requires_view(self, spark, tmp_path, corpus_parquet):
        src = spark.read.parquet(corpus_parquet)
        b = IndexBuilder(spark, str(tmp_path / "bad2"), _cfg(),
                         rows_per_part=2)
        with pytest.raises(ValueError, match="docs_sha"):
            b.build(src, position_ids=True, docs_sha="defer")

    def test_view_requires_position_ids(self, spark, tmp_path,
                                        corpus_parquet):
        src = spark.read.parquet(corpus_parquet)
        b = IndexBuilder(spark, str(tmp_path / "bad"), _cfg(),
                         rows_per_part=2)
        with pytest.raises(ValueError, match="position_ids"):
            b.build(src, docs_mode="view")

    def test_viewlite_resume_after_crash(self, spark, tmp_path,
                                         corpus_parquet):
        """Kill a viewlite build after the docs checkpoint -> restart
        completes with the arithmetic part ranges intact and answers
        match an uninterrupted build."""
        path = str(tmp_path / "resume_v")
        src = spark.read.parquet(corpus_parquet)
        b = IndexBuilder(spark, path, _cfg(), rows_per_part=2)
        orig = b._ckpt_write

        def bomb(name, payload):
            orig(name, payload)
            if name == "docs":
                raise RuntimeError("injected crash after docs stage")

        b._ckpt_write = bomb
        with pytest.raises(RuntimeError, match="injected"):
            b.build(src, position_ids=True, docs_mode="view",
                    docs_sha="defer")
        assert not os.path.exists(
            os.path.join(path, "_index_meta.json"))

        b2 = IndexBuilder(spark, path, _cfg(), rows_per_part=2)
        meta = b2.build(src, position_ids=True, docs_mode="view",
                        docs_sha="defer")
        ix = SearchIndex(spark, path)
        ref = _build(spark, tmp_path, corpus_parquet, "resume_ref",
                     docs_mode="view", docs_sha="defer")
        assert meta.part_ranges == ref.meta.part_ranges
        assert meta.dense_ranges == ref.meta.dense_ranges
        assert meta.total_tokens == ref.meta.total_tokens
        a = [(r["row_id"], round(r["score"], 6)) for r in
             ix.bm25_search("ancient", top_k=10, operator_or=True).collect()]
        c = [(r["row_id"], round(r["score"], 6)) for r in
             ref.bm25_search("ancient", top_k=10, operator_or=True).collect()]
        assert a == c

    def test_part_ranges_and_tokens_match_copy(self, spark, tmp_path,
                                               corpus_parquet):
        """The folded meta jobs (part_ranges from the docs read-back,
        total_tokens from per-col lineage) must equal the scan-derived
        values of a copy build."""
        ix_c = _build(spark, tmp_path, corpus_parquet, "copy8",
                      docs_mode="copy")
        ix_v = _build(spark, tmp_path, corpus_parquet, "view8",
                      docs_mode="view")
        assert ix_c.meta.part_ranges == ix_v.meta.part_ranges
        assert ix_c.meta.total_tokens == ix_v.meta.total_tokens
        assert ix_c.meta.total_docs == ix_v.meta.total_docs
        # and against a direct recompute from the docs table
        pr = sorted(
            [int(r["pid"]), int(r["lo"]), int(r["hi"]), int(r["n"])]
            for r in ix_v.docs.withColumn(
                "pid", (F.col("doc_id") / F.lit(2)).cast("int"))
            .groupBy("pid").agg(F.min("doc_id").alias("lo"),
                                F.max("doc_id").alias("hi"),
                                F.count("*").alias("n")).collect())
        assert [list(map(int, x)) for x in ix_v.meta.part_ranges] == pr

    def test_defer_chunked_build(self, spark, tmp_path, corpus_parquet):
        """ADVICE r4: defer + n_chunks>1 used to crash PATH_NOT_FOUND —
        the chunked segments stage counted chunk docs by scanning the
        docs table defer mode never writes.  Now arithmetic; a chunked
        defer build must equal the single-chunk one, including the
        per-chunk doc counts in the build metrics."""
        ix_1 = _build(spark, tmp_path, corpus_parquet, "defer_c1",
                      docs_mode="view", docs_sha="defer")
        path = str(tmp_path / "defer_c3")
        src = spark.read.parquet(corpus_parquet)
        meta = IndexBuilder(spark, path, _cfg(), rows_per_part=2).build(
            src, position_ids=True, docs_mode="view", docs_sha="defer",
            n_chunks=3)
        ix_3 = SearchIndex(spark, path)
        assert meta.dense_ranges == ix_1.meta.dense_ranges
        assert meta.total_tokens == ix_1.meta.total_tokens
        chunks = meta.build_metrics["stages"]["segments"]["chunks"]
        assert sum(c["docs"] for c in chunks) == meta.total_docs
        a = [(r["row_id"], round(r["score"], 6)) for r in
             ix_1.bm25_search("ancient", top_k=10, operator_or=True).collect()]
        b = [(r["row_id"], round(r["score"], 6)) for r in
             ix_3.bm25_search("ancient", top_k=10, operator_or=True).collect()]
        assert a == b

    def test_resume_docs_sha_mismatch_raises(self, spark, tmp_path,
                                             corpus_parquet):
        """ADVICE r4: a crashed view+sidecar build resumed with
        docs_sha='defer' silently kept the checkpointed variant."""
        path = str(tmp_path / "resume_sha")
        src = spark.read.parquet(corpus_parquet)
        b = IndexBuilder(spark, path, _cfg(), rows_per_part=2)
        orig = b._ckpt_write

        def bomb(name, payload):
            orig(name, payload)
            if name == "docs":
                raise RuntimeError("injected crash after docs stage")

        b._ckpt_write = bomb
        with pytest.raises(RuntimeError, match="injected"):
            b.build(src, position_ids=True, docs_mode="view")
        b2 = IndexBuilder(spark, path, _cfg(), rows_per_part=2)
        with pytest.raises(ValueError, match="docs_sha"):
            b2.build(src, position_ids=True, docs_mode="view",
                     docs_sha="defer")
        # resuming with the SAME variant completes fine
        meta = b2.build(src, position_ids=True, docs_mode="view")
        assert meta.total_docs > 0

    def test_zero_doc_view_docs_readable(self, spark, tmp_path):
        """ADVICE r4: a zero-doc view build committed fine but
        SearchIndex.docs raised UNABLE_TO_INFER_SCHEMA (empty file
        list).  It must serve a typed empty docs table with the same
        schema a copy-mode zero-doc index serves."""
        src_path = str(tmp_path / "empty_src")
        spark.createDataFrame(
            [], "tag string, col1 string").write.parquet(src_path)
        src = spark.read.parquet(src_path)
        pv = str(tmp_path / "empty_view")
        IndexBuilder(spark, pv, _cfg(), rows_per_part=2).build(
            src, position_ids=True, docs_mode="view")
        pc = str(tmp_path / "empty_copy")
        IndexBuilder(spark, pc, _cfg(), rows_per_part=2).build(
            src, position_ids=True, docs_mode="copy")
        dv = SearchIndex(spark, pv).docs
        dc = SearchIndex(spark, pc).docs
        assert dv.count() == 0
        assert sorted(dv.columns) == sorted(dc.columns)
        assert dict(dv.dtypes) == dict(dc.dtypes)

    def test_max_bounds_o1_helpers(self, spark, tmp_path, corpus_parquet):
        """layout.max_doc_bound / max_part_bound equal the part_bounds
        expansion on both explicit and dense metas (ADVICE r4: the
        callers only needed the max but expanded the full list)."""
        from tantivy_search_spark.index import layout as L
        ix_s = _build(spark, tmp_path, corpus_parquet, "mb_side",
                      docs_mode="view")
        ix_d = _build(spark, tmp_path, corpus_parquet, "mb_defer",
                      docs_mode="view", docs_sha="defer")
        for meta in (ix_s.meta, ix_d.meta):
            pb = L.part_bounds(meta)
            assert L.max_doc_bound(meta) == max(r[2] for r in pb)
            assert L.max_part_bound(meta) == max(r[0] for r in pb)
        # empty meta
        empty = L.IndexMeta(config_json="{}", num_parts=0, total_docs=0,
                            total_tokens={}, part_ranges=[],
                            dense_ranges=[0, 64])
        assert L.max_doc_bound(empty) == -1
        assert L.max_part_bound(empty) == -1
