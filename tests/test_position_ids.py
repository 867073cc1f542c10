"""position_ids build mode: doc ids from source-file row positions —
no sort, no shuffle, no staged parquet.  Ids are dense and unique;
BM25 scores per document equal the sorted-id build's (global stats are
id-order independent); resume verifies the source snapshot."""

import os

import pytest

from tantivy_search_spark.config import IndexConfig
from tantivy_search_spark.index.builder import IndexBuilder
from tantivy_search_spark.search.engine import SearchIndex

QUERIES = [
    ("Ancient empires rise and fall", True),
    ("ancient moral horizons", False),
    ("ancient", True),
]


def _cfg():
    cfg = IndexConfig.from_json(["col1"], "{}")
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


def _scored_tags(spark, index_path, docs_parquet_tags):
    """{query -> sorted [(tag, score)]} via the index's docs table."""
    ix = SearchIndex(spark, index_path)
    ix.enable_stats_cache()
    docs = spark.read.parquet(os.path.join(index_path, "docs"))
    id_to_tag = {r["doc_id"]: r["tag"] for r in docs.collect()}
    out = {}
    for s, op in QUERIES:
        rows = ix.bm25_search(s, operator_or=op, top_k=100).collect()
        out[(s, op)] = sorted((id_to_tag[r["row_id"]], round(r["score"], 6))
                              for r in rows)
    ix.close()
    return out


class TestPositionIds:
    def test_dense_unique_and_scores_match_sorted_build(
            self, spark, tmp_path, corpus_parquet):
        src = spark.read.parquet(corpus_parquet)
        pos_path = str(tmp_path / "idx_pos")
        meta = IndexBuilder(spark, pos_path, _cfg(), rows_per_part=2).build(
            src, position_ids=True)
        n = meta.total_docs
        docs = spark.read.parquet(os.path.join(pos_path, "docs"))
        ids = sorted(r["doc_id"] for r in docs.collect())
        assert ids == list(range(n))

        sorted_path = str(tmp_path / "idx_sorted")
        IndexBuilder(spark, sorted_path, _cfg(), rows_per_part=2).build(
            spark.read.parquet(corpus_parquet), order_cols=["tag"])
        assert _scored_tags(spark, pos_path, None) == \
               _scored_tags(spark, sorted_path, None)

    def test_no_staged_dir_written(self, spark, tmp_path, corpus_parquet):
        pos_path = str(tmp_path / "idx_pos2")
        IndexBuilder(spark, pos_path, _cfg(), rows_per_part=2).build(
            spark.read.parquet(corpus_parquet), position_ids=True)
        assert not os.path.exists(os.path.join(pos_path, "_staged"))

    def test_mutually_exclusive_with_order_cols(self, spark, tmp_path,
                                                corpus_parquet):
        with pytest.raises(ValueError, match="mutually exclusive"):
            IndexBuilder(spark, str(tmp_path / "x"), _cfg()).build(
                spark.read.parquet(corpus_parquet), position_ids=True,
                order_cols=["tag"])

    def test_resume_detects_changed_snapshot(self, spark, tmp_path,
                                             corpus_parquet):
        from corpora import corpus_a_rows

        pos_path = str(tmp_path / "idx_pos3")
        b = IndexBuilder(spark, pos_path, _cfg(), rows_per_part=2)
        src = spark.read.parquet(corpus_parquet)
        b.build(src, position_ids=True)
        # grow the source, then "resume" (re-build over the existing
        # checkpoints): must refuse rather than reuse stale ids
        extra = [{"tag": "tZZZ", "col1": "brand new text"}]
        spark.createDataFrame(extra).write.mode("append").parquet(
            corpus_parquet)
        with pytest.raises(ValueError, match="snapshot changed"):
            b.build(spark.read.parquet(corpus_parquet), position_ids=True)
