"""Shuffle-free segments stage (segment_shuffle='stream'): identical
index semantics to the shuffled groupBy path on ordered input, split
parts handled, unordered input rejected, auto mode engages on staged
ids."""

import pytest

import tantivy_search_spark.index.builder as builder_mod
from tantivy_search_spark.config import IndexConfig
from tantivy_search_spark.index.builder import IndexBuilder
from tantivy_search_spark.search.engine import SearchIndex

QUERIES = [
    ("Ancient empires rise and fall", True),
    ("ancient moral horizons", False),
    ("ancient", True),
]


def _cfg():
    cfg = IndexConfig.from_json(["col1", "col2", "col3"], "{}")
    cfg.n_buckets = 4
    cfg.parts_per_shard = 2
    return cfg


def _results(spark, path):
    ix = SearchIndex(spark, path)
    ix.enable_stats_cache()
    out = []
    for s, op in QUERIES:
        out.append([(r["row_id"], round(r["score"], 4)) for r in
                    ix.bm25_search(s, operator_or=op, top_k=100).collect()])
    out.append(ix.get_total_num_tokens())
    out.append(sorted(ix._stats_cache.items()))
    ix.close()
    return out


class TestStreamSegments:
    def test_stream_equals_group(self, spark, tmp_path):
        """Same ordered input, both stages: identical search results,
        token totals, and term dictionary."""
        from corpora import corpus_a_rows

        rows = corpus_a_rows()
        paths = {}
        for mode in ("group", "stream"):
            path = str(tmp_path / f"idx_{mode}")
            df = spark.createDataFrame(rows)
            IndexBuilder(spark, path, _cfg(), rows_per_part=2,
                         segment_shuffle=mode).build(df, id_col="doc_id")
            paths[mode] = path
        assert _results(spark, paths["group"]) == \
               _results(spark, paths["stream"])

    def test_split_part_across_partitions(self, spark, tmp_path):
        """rows_per_part=4 with 3-row input slices: parts straddle
        partition boundaries and must yield fragment rows that still
        answer identically to the shuffled build."""
        from corpora import corpus_a_rows

        rows = corpus_a_rows()
        ref_path = str(tmp_path / "idx_ref")
        IndexBuilder(spark, ref_path, _cfg(), rows_per_part=4,
                     segment_shuffle="group").build(
            spark.createDataFrame(rows), id_col="doc_id")
        # parallelize with many slices => most parts split across
        # partitions (slices of 1-2 rows vs 4-row parts)
        split_path = str(tmp_path / "idx_split")
        sdf = spark.createDataFrame(
            spark.sparkContext.parallelize(rows, max(len(rows) // 2, 2)))
        IndexBuilder(spark, split_path, _cfg(), rows_per_part=4,
                     segment_shuffle="stream").build(sdf, id_col="doc_id")
        assert _results(spark, ref_path) == _results(spark, split_path)

    def test_descending_disjoint_input_builds_correctly(self, spark,
                                                        tmp_path):
        """Strictly descending ids form single-row monotonic runs with
        DISJOINT per-part ranges — legal for the stream stage (a part
        split across files can arrive high-half first under Spark's
        size-ordered file packing), and the index must answer
        identically to the shuffled build."""
        from corpora import corpus_a_rows

        rows = corpus_a_rows()
        ref_path = str(tmp_path / "idx_ref")
        IndexBuilder(spark, ref_path, _cfg(), rows_per_part=2,
                     segment_shuffle="group").build(
            spark.createDataFrame(rows), id_col="doc_id")
        rev_path = str(tmp_path / "idx_rev")
        df = spark.createDataFrame(
            spark.sparkContext.parallelize(list(reversed(rows)), 1))
        IndexBuilder(spark, rev_path, _cfg(), rows_per_part=2,
                     segment_shuffle="stream").build(df, id_col="doc_id")
        assert _results(spark, ref_path) == _results(spark, rev_path)

    def test_overlapping_input_raises(self, spark, tmp_path):
        """Genuinely interleaved OVERLAPPING ranges for one part must
        raise — overlapping fragments would merge into duplicate
        postings."""
        from corpora import corpus_a_rows

        rows = corpus_a_rows()
        # evens-then-odds: run [0,2,4,...] then run [1,3,5,...] — two
        # monotonic runs with overlapping spans inside one part
        shuffled = sorted(rows, key=lambda r: (r["doc_id"] % 2,
                                               r["doc_id"]))
        df = spark.createDataFrame(
            spark.sparkContext.parallelize(shuffled, 1))
        with pytest.raises(Exception, match="overlapping doc ranges"):
            IndexBuilder(
                spark, str(tmp_path / "idx_bad"), _cfg(),
                rows_per_part=len(rows) * 2,
                segment_shuffle="stream").build(df, id_col="doc_id")

    def test_auto_streams_on_staged_ids(self, spark, tmp_path,
                                        monkeypatch):
        """id_col=None (builder stages the ids itself) must pick the
        zero-shuffle stage under segment_shuffle='auto'."""
        from corpora import corpus_a_rows

        calls = []
        orig = builder_mod._segment_builder_stream

        def spy(cfg_json):
            calls.append(1)
            return orig(cfg_json)

        monkeypatch.setattr(builder_mod, "_segment_builder_stream", spy)
        path = str(tmp_path / "idx_auto")
        df = spark.createDataFrame(corpus_a_rows()).drop("doc_id")
        IndexBuilder(spark, path, _cfg(), rows_per_part=2).build(
            df, order_cols=["col1"])
        assert calls, "auto mode did not choose the stream stage"
        # and the result is a working index
        ix = SearchIndex(spark, path)
        assert ix.bm25_search("ancient", operator_or=True,
                              top_k=5).count() > 0
        ix.close()

    def test_explicit_group_on_arbitrary_layout(self, spark, tmp_path):
        """Explicit id_col (arbitrary layout) keeps the shuffle path
        under 'auto' — shuffled input builds fine."""
        from corpora import corpus_a_rows

        rows = list(reversed(corpus_a_rows()))
        df = spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 3))
        path = str(tmp_path / "idx_groupauto")
        IndexBuilder(spark, path, _cfg(), rows_per_part=2).build(
            df, id_col="doc_id")
        ix = SearchIndex(spark, path)
        assert ix.bm25_search("ancient", operator_or=True,
                              top_k=5).count() > 0
        ix.close()
