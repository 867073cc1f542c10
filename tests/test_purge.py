"""compact(purge_deletes=True): physical tombstone removal.

Property (the Tantivy merge semantic — the reference's LogMergePolicy
merge applies the alive bitset and drops deleted docs from the merged
segment): delete + purge must be indistinguishable from never having
indexed the docs — same doc sets, same BM25 scores (idf/avgdl shift to
the post-delete corpus), same bitmaps, same stats.
"""

import os

import pytest

from tantivy_search_spark.config import IndexConfig
from tantivy_search_spark.index.builder import IndexBuilder
from tantivy_search_spark.index.layout import IndexMeta, TOMBSTONES_DIR
from tantivy_search_spark.search.engine import SearchIndex

WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lambda mu nu xi omicron pi rho sigma tau upsilon").split()


def doc_text(i: int) -> str:
    # deterministic overlapping vocabulary; every doc 6 terms
    return " ".join(WORDS[(i * 3 + j * 7) % len(WORDS)] for j in range(6))


def make_rows(ids):
    return [{"doc_id": i, "body": doc_text(i)} for i in ids]


N = 40
DELETED = sorted({3, 7, 8, 9, 11, 19, 23, 24, 25, 26, 27, 28, 29, 31})
KEPT = [i for i in range(N) if i not in DELETED]
QUERIES = ["alpha beta", "gamma", "sigma tau alpha", "theta iota kappa"]


def build(spark, path, ids, positions=False, rows_per_part=10):
    cfg = IndexConfig.from_json(["body"], "{}")
    cfg.parts_per_shard = 2
    cfg.n_buckets = 4
    if positions:
        cfg.with_positions = True
    IndexBuilder(spark, str(path), cfg, rows_per_part=rows_per_part).build(
        spark.createDataFrame(make_rows(ids)), id_col="doc_id")
    return str(path)


@pytest.fixture(scope="module")
def purged_and_ref(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("purge")
    # B: all docs, delete D, purge (D includes the whole part [24..29]
    # range slice and a non-existent id)
    b_path = build(spark, root / "b", range(N))
    ixb = SearchIndex(spark, b_path)
    assert ixb.delete_row_ids(DELETED + [10 ** 6])
    cfg = IndexConfig.from_json(["body"], "{}")
    cfg.parts_per_shard = 2
    cfg.n_buckets = 4
    metrics = IndexBuilder(spark, b_path, cfg, rows_per_part=10).compact(
        purge_deletes=True)
    ixb.reload()
    # A: the deleted docs were never indexed (same doc_ids)
    a_path = build(spark, root / "a", KEPT)
    ixa = SearchIndex(spark, a_path)
    return ixb, ixa, metrics, b_path


class TestPurgeEquivalence:
    def test_metrics(self, purged_and_ref):
        _, _, metrics, _ = purged_and_ref
        assert metrics["purged_docs"] == len(DELETED)

    def test_totals(self, purged_and_ref):
        ixb, ixa, _, _ = purged_and_ref
        assert ixb.get_total_num_docs() == ixa.get_total_num_docs() == len(KEPT)
        assert ixb.get_indexed_doc_counts() == len(KEPT)
        assert ixb.get_total_num_tokens("body") == \
            ixa.get_total_num_tokens("body")

    def test_tombstones_cleared(self, purged_and_ref):
        _, _, _, b_path = purged_and_ref
        assert not os.path.isdir(os.path.join(b_path, TOMBSTONES_DIR))

    def test_doc_freq(self, purged_and_ref):
        ixb, ixa, _, _ = purged_and_ref
        probe = " ".join(WORDS)
        assert sorted(ixb.get_doc_freq(probe)) == \
            sorted(ixa.get_doc_freq(probe))

    def test_bm25_scores_match_fresh_build(self, purged_and_ref):
        ixb, ixa, _, _ = purged_and_ref
        for q in QUERIES:
            for op_or in (True, False):
                got = [(r["row_id"], round(r["score"], 9)) for r in
                       ixb.bm25_search(q, top_k=100, operator_or=op_or)
                       .collect()]
                want = [(r["row_id"], round(r["score"], 9)) for r in
                        ixa.bm25_search(q, top_k=100, operator_or=op_or)
                        .collect()]
                assert got == want, (q, op_or)

    def test_wand_matches(self, purged_and_ref):
        ixb, ixa, _, _ = purged_and_ref
        for q in QUERIES:
            got = [(r["row_id"], round(r["score"], 9)) for r in
                   ixb.bm25_search(q, top_k=10, operator_or=True,
                                   use_wand=True).collect()]
            want = [(r["row_id"], round(r["score"], 9)) for r in
                    ixa.bm25_search(q, top_k=10, operator_or=True,
                                    use_wand=True).collect()]
            assert got == want, q

    def test_bitmaps_match(self, purged_and_ref):
        ixb, ixa, _, _ = purged_and_ref
        for term in WORDS[:8]:
            assert ixb.query_term_bitmap("body", term) == \
                ixa.query_term_bitmap("body", term), term

    def test_local_tier_matches(self, purged_and_ref):
        ixb, ixa, _, b_path = purged_and_ref
        loc = SearchIndex.open_local(b_path)
        try:
            for q in QUERIES:
                got = [(i, round(s, 9)) for i, s in
                       loc.bm25_search_local(q, top_k=100, operator_or=True)]
                want = [(r["row_id"], round(r["score"], 9)) for r in
                        ixa.bm25_search(q, top_k=100, operator_or=True)
                        .collect()]
                assert got == want, q
        finally:
            loc.close()


class TestPurgeWithPositions:
    def test_phrase_results_match(self, spark, tmp_path_factory):
        root = tmp_path_factory.mktemp("purge_pos")
        b_path = build(spark, root / "b", range(N), positions=True)
        ixb = SearchIndex(spark, b_path)
        ixb.delete_row_ids(DELETED)
        cfg = IndexConfig.from_json(["body"], "{}")
        cfg.parts_per_shard = 2
        cfg.n_buckets = 4
        cfg.with_positions = True
        IndexBuilder(spark, b_path, cfg, rows_per_part=10).compact(
            purge_deletes=True)
        ixb.reload()
        a_path = build(spark, root / "a", KEPT, positions=True)
        ixa = SearchIndex(spark, a_path)
        phrase = f'"{doc_text(KEPT[1]).split()[0]} ' \
                 f'{doc_text(KEPT[1]).split()[1]}"'
        got = [(r["row_id"], round(r["score"], 9)) for r in
               ixb.bm25_search(phrase, top_k=100, operator_or=True,
                               enable_nlq=True).collect()]
        want = [(r["row_id"], round(r["score"], 9)) for r in
                ixa.bm25_search(phrase, top_k=100, operator_or=True,
                                enable_nlq=True).collect()]
        assert got == want and got


class TestPurgeLifecycle:
    def test_idempotent_and_appendable(self, spark, tmp_path_factory):
        root = tmp_path_factory.mktemp("purge_life")
        b_path = build(spark, root / "b", range(N))
        ixb = SearchIndex(spark, b_path)
        # delete the CURRENT max ids so the high-water mark matters
        tail = [N - 1, N - 2, 5]
        ixb.delete_row_ids(tail)
        cfg = IndexConfig.from_json(["body"], "{}")
        cfg.parts_per_shard = 2
        cfg.n_buckets = 4
        builder = IndexBuilder(spark, b_path, cfg, rows_per_part=10)
        builder.compact(purge_deletes=True)
        meta = IndexMeta.load(b_path)
        assert meta.max_doc_id == N - 1
        # second purge run with nothing to do converges (plain compact)
        m2 = builder.compact(purge_deletes=True)
        assert "purged_docs" not in m2
        # append after purge: new ids never reuse the purged tail
        builder.append(spark.createDataFrame(
            [{"body": "totally fresh appended words"}] * 3))
        ixb.reload()
        assert ixb.get_total_num_docs() == N - len(tail) + 3
        new_ids = {r["row_id"] for r in ixb.bm25_search(
            "appended", top_k=10, operator_or=True).collect()}
        assert len(new_ids) == 3 and min(new_ids) > N - 1


class TestPurgeEmptyGroup:
    def test_term_with_all_postings_tombstoned(self, spark, tmp_path):
        """A term whose ONLY docs in a shard are all deleted: the purge
        rewrite of that group produces zero rows — the compactor must
        emit a correctly-typed empty frame (regression: pandas gave the
        empty columns float64 dtype and Arrow refused the list<int64>
        conversion, aborting the whole purge job)."""
        path = str(tmp_path / "empty_grp")
        cfg = IndexConfig.from_json(["col1"], "{}")
        cfg.n_buckets = 4
        cfg.parts_per_shard = 2
        rows = [
            {"doc_id": 0, "col1": "unique_term_xyz shared"},
            {"doc_id": 1, "col1": "shared other words"},
            {"doc_id": 2, "col1": "shared more words"},
        ]
        b = IndexBuilder(spark, path, cfg, rows_per_part=2)
        b.build(spark.createDataFrame(rows), id_col="doc_id")
        ix = SearchIndex(spark, path)
        ix.delete_row_ids([0])
        b.compact(min_rows_per_group=2, purge_deletes=True)
        ix.reload()
        assert ix.bm25_search("unique_term_xyz", top_k=10,
                              operator_or=True).count() == 0
        assert {r["row_id"] for r in
                ix.bm25_search("shared", top_k=10,
                               operator_or=True).collect()} == {1, 2}
        assert ix.get_indexed_doc_counts() == 2


class TestPurgeEverything:
    def test_all_docs_deleted_then_purged(self, spark, tmp_path):
        """Delete EVERY doc, purge: zero-row dynamic-partition writes
        must still leave readable (schema-bearing) postings/stats/docs
        tables — regression: the swapped dirs had no data files and
        every later open died with UNABLE_TO_INFER_SCHEMA."""
        path = str(tmp_path / "purge_all")
        cfg = IndexConfig.from_json(["col1"], "{}")
        cfg.n_buckets = 4
        cfg.parts_per_shard = 2
        rows = [{"doc_id": i, "col1": f"alpha beta gamma{i}"}
                for i in range(5)]
        b = IndexBuilder(spark, path, cfg, rows_per_part=2)
        b.build(spark.createDataFrame(rows), id_col="doc_id")
        ix = SearchIndex(spark, path)
        ix.delete_row_ids(list(range(5)))
        b.compact(min_rows_per_group=2, purge_deletes=True)
        ix.reload()
        assert ix.bm25_search("alpha", top_k=10,
                              operator_or=True).count() == 0
        assert ix.get_indexed_doc_counts() == 0
        assert ix.get_total_num_docs() == 0
        # the index is still a working writer target: append revives it
        meta = b.append(spark.createDataFrame(
            [{"col1": "alpha fresh start"}]))
        assert meta.total_docs == 1
        ix.reload()
        got = ix.bm25_search("alpha", top_k=10, operator_or=True).collect()
        assert len(got) == 1
