"""The distributed-correctness property (reference MultiPartsTest,
src/common/test_util.rs:516-648): searching two separate part indexes
with merged global statistics, then unioning and sorting, must equal
searching one combined index — row-ids equal, scores equal to 3 decimals.

Also asserts the corpus B golden result counts from
api_bm25_standard_search.rs:109-118 and api_bm25_nlq_search.rs:101-113.
"""

import pytest

from corpora import part0_rows, part1_rows


@pytest.fixture(scope="module")
def part_indexes(spark, tmp_path_factory):
    from tantivy_search_spark.config import IndexConfig
    from tantivy_search_spark.index.builder import IndexBuilder
    from tantivy_search_spark.search.engine import SearchIndex

    base = tmp_path_factory.mktemp("multiparts")

    def build(name, rows, rpp):
        path = str(base / name)
        cfg = IndexConfig.from_json(["col1", "col2", "col3"], "{}")
        cfg.parts_per_shard = 2
        cfg.n_buckets = 8
        df = spark.createDataFrame(rows)
        IndexBuilder(spark, path, cfg, rows_per_part=rpp).build(df, id_col="doc_id")
        return SearchIndex(spark, path)

    p0 = build("part0", part0_rows(0), rpp=4)
    p1 = build("part1", part1_rows(10), rpp=7)
    combined = build("combined", part0_rows(0) + part1_rows(10), rpp=6)
    # reference-faithful variant: each part has a LOCAL 0-based row_id
    # space (test_util.rs:90-92) and the alive bitmap applies per part
    p1_local = build("part1_local", part1_rows(0), rpp=7)
    return p0, p1, combined, p1_local


def _merged_stats(p0, p1, sentence):
    from tantivy_search_spark.search.engine import Statistics

    cols = p0.config.columns
    toks = {c: p0.config.analyzer(c)(sentence) for c in cols}
    return Statistics.merge([p0.local_statistics(toks), p1.local_statistics(toks)])


def _search_parts_merged(p0, p1, sentence, **kw):
    stats = _merged_stats(p0, p1, sentence)
    r0 = p0.bm25_search(sentence, statistics=stats, **kw).collect()
    r1 = p1.bm25_search(sentence, statistics=stats, **kw).collect()
    rows = [(r["row_id"], r["score"]) for r in r0 + r1]
    return sorted(rows, key=lambda x: (-x[1], x[0]))


QUERIES = [
    ("Ancient provide wisdom modern dilemmas", dict(operator_or=True)),
    ("Human health", dict(operator_or=False)),
    ("empires rise", dict(operator_or=False)),
    ("sustainable energy climate", dict(operator_or=True)),
]


class TestMultiPartEquivalence:
    @pytest.mark.parametrize("sentence,kw", QUERIES)
    def test_parts_equal_combined(self, part_indexes, sentence, kw):
        p0, p1, combined, _ = part_indexes
        got = _search_parts_merged(p0, p1, sentence, top_k=100000, **kw)
        want = [
            (r["row_id"], r["score"])
            for r in combined.bm25_search(sentence, top_k=100000, **kw).collect()
        ]
        assert [g[0] for g in got] == [w[0] for w in want]
        for (_, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) < 5e-4, (sentence, gs, ws)

    def test_partition_count_invariance(self, spark, tmp_path_factory):
        """Same corpus built at 1 part vs 8 parts -> identical scores."""
        from tantivy_search_spark.config import IndexConfig
        from tantivy_search_spark.index.builder import IndexBuilder
        from tantivy_search_spark.search.engine import SearchIndex

        base = tmp_path_factory.mktemp("invariance")
        rows = part0_rows(0) + part1_rows(10)
        results = []
        for rpp in (30, 4):
            cfg = IndexConfig.from_json(["col1", "col2", "col3"], "{}")
            cfg.parts_per_shard = 2
            path = str(base / f"rpp{rpp}")
            IndexBuilder(spark, path, cfg, rows_per_part=rpp).build(
                spark.createDataFrame(rows), id_col="doc_id")
            ix = SearchIndex(spark, path)
            results.append([
                (r["row_id"], round(r["score"], 6))
                for r in ix.bm25_search("human challenges global",
                                        operator_or=True, top_k=100).collect()
            ])
        assert results[0] == results[1]
        assert len(results[0]) > 0


class TestCorpusBGoldenCounts:
    def test_standard_or_count(self, part_indexes):
        _, _, combined, _ = part_indexes
        got = combined.bm25_search("Ancient provide wisdom modern dilemmas",
                                   top_k=100000, operator_or=True)
        assert got.count() == 6

    def test_standard_and_count(self, part_indexes):
        _, _, combined, _ = part_indexes
        got = combined.bm25_search("Human health", top_k=100000,
                                   operator_or=False)
        assert got.count() == 2

    def _per_part_filtered_count(self, part_indexes, sentence, bitmap, **kw):
        """Reference scheme: local 0-based row_ids per part, same alive
        bitmap applied to each part, counts summed (test_util.rs:516-648)."""
        p0, _, _, p1_local = part_indexes
        stats = _merged_stats(p0, p1_local, sentence)
        n0 = p0.bm25_search(sentence, statistics=stats, top_k=100000,
                            alive_bitmap=bitmap, **kw).count()
        n1 = p1_local.bm25_search(sentence, statistics=stats, top_k=100000,
                                  alive_bitmap=bitmap, **kw).count()
        return n0 + n1

    def test_standard_or_filtered(self, part_indexes):
        assert self._per_part_filtered_count(
            part_indexes, "Ancient provide wisdom modern dilemmas",
            bytes([80]), operator_or=True) == 2

    def test_standard_and_filtered(self, part_indexes):
        assert self._per_part_filtered_count(
            part_indexes, "Human health", bytes([16]),
            operator_or=False) == 1

    def test_nlq_or_count(self, part_indexes):
        _, _, combined, _ = part_indexes
        got = combined.bm25_search("Ancient OR (education access)",
                                   top_k=100000, operator_or=True,
                                   enable_nlq=True)
        assert got.count() == 6

    def test_nlq_and_count(self, part_indexes):
        _, _, combined, _ = part_indexes
        got = combined.bm25_search("Ancient OR (education access)",
                                   top_k=100000, operator_or=False,
                                   enable_nlq=True)
        assert got.count() == 3

    def test_nlq_filtered(self, part_indexes):
        for op_or in (True, False):
            assert self._per_part_filtered_count(
                part_indexes, "Ancient OR (education access)", bytes([16]),
                operator_or=op_or, enable_nlq=True) == 1
