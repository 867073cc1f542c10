"""vacuum_segments(): dropping the intermediate segments table of a
committed index must not change any query answer, and append() must
keep working (totals are additive off meta, not segments)."""

import os

import pytest

from tantivy_search_spark.config import IndexConfig
from tantivy_search_spark.index.builder import IndexBuilder
from tantivy_search_spark.search.engine import SearchIndex


def _cfg():
    cfg = IndexConfig.from_json(["col1"], "{}")
    cfg.n_buckets = 4
    cfg.parts_per_shard = 2
    return cfg


@pytest.fixture()
def built(spark, tmp_path):
    from corpora import corpus_a_rows
    path = str(tmp_path / "vac")
    rows = [{"doc_id": r["doc_id"], "col1": r["col1"]}
            for r in corpus_a_rows()]
    df = spark.createDataFrame(rows)
    b = IndexBuilder(spark, path, _cfg(), rows_per_part=2)
    b.build(df, id_col="doc_id")
    return b, path, df


class TestVacuumSegments:
    def test_queries_unchanged_and_idempotent(self, spark, built):
        b, path, _ = built
        ix = SearchIndex(spark, path)
        before = [(r["row_id"], round(r["score"], 6)) for r in
                  ix.bm25_search("ancient", top_k=10,
                                 operator_or=True).collect()]
        stats = b.vacuum_segments()
        assert stats["freed_bytes"] > 0
        assert not os.path.exists(os.path.join(path, "segments"))
        ix2 = SearchIndex(spark, path)
        after = [(r["row_id"], round(r["score"], 6)) for r in
                 ix2.bm25_search("ancient", top_k=10,
                                 operator_or=True).collect()]
        assert after == before
        assert b.vacuum_segments() == {"freed_bytes": 0}  # idempotent

    def test_append_after_vacuum(self, spark, built):
        b, path, df = built
        b.vacuum_segments()
        extra = df.withColumn("col1", df.col1).drop("doc_id")
        meta0 = SearchIndex(spark, path).meta
        meta = b.append(extra)
        assert meta.total_docs == 2 * meta0.total_docs
        # additive token totals survived the missing old segments
        assert meta.total_tokens["col1"] == 2 * meta0.total_tokens["col1"]
        ix = SearchIndex(spark, path)
        # every original 'Ancient' hit now appears twice (orig + copy)
        n0 = sum(1 for _ in
                 SearchIndex(spark, path).bm25_search(
                     "ancient", top_k=100, operator_or=True).collect())
        assert n0 == 4  # corpus A has 2 'Ancient' docs

    def test_refuses_legacy_meta(self, spark, built):
        import json
        b, path, _ = built
        mp = os.path.join(path, "_index_meta.json")
        m = json.load(open(mp))
        m["total_tokens"] = None
        json.dump(m, open(mp, "w"))
        with pytest.raises(ValueError, match="legacy meta"):
            b.vacuum_segments()

    def test_refuses_uncommitted(self, spark, tmp_path):
        b = IndexBuilder(spark, str(tmp_path / "nothing"), _cfg(),
                         rows_per_part=2)
        with pytest.raises(FileNotFoundError):
            b.vacuum_segments()
