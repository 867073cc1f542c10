"""Granule-exists checks (``*_with_range``).

Reference semantics: ffi_query_term_with_range / ffi_query_terms_with_range
/ ffi_query_sentence_with_range / ffi_regex_term_with_range
(tests/unit_test/FunctionalFFI.cpp:80-109) — "any row_id in the inclusive
[lrange, rrange] window matching the query?" — with the boundary rules of
tests/unit_test/BoundaryIndexSearch.cpp:86-128: inverted ranges are False,
past-the-end granules are False, bounds are inclusive, no throw on
out-of-corpus or negative bounds.
"""

import numpy as np
import pytest

from tantivy_search_spark.bitmap import (
    bitmap_granule_hits,
    bitmap_range_any,
    row_ids_to_u8_bitmap,
)


class TestBitmapRangeAny:
    def test_brute_force_parity(self):
        rng = np.random.default_rng(7)
        for _ in range(50):
            ids = np.unique(rng.integers(0, 80, size=rng.integers(0, 20)))
            bm = row_ids_to_u8_bitmap(ids)
            s = set(ids.tolist())
            for lo in range(-3, 90, 7):
                for width in (0, 1, 5, 40):
                    hi = lo + width
                    want = any(lo <= i <= hi for i in s)
                    assert bitmap_range_any(bm, lo, hi) == want, (
                        ids, lo, hi)

    def test_edges(self):
        bm = row_ids_to_u8_bitmap([0, 7, 8, 63])
        assert bitmap_range_any(bm, 0, 0)
        assert bitmap_range_any(bm, 7, 7)
        assert bitmap_range_any(bm, 8, 8)
        assert bitmap_range_any(bm, 63, 63)
        assert not bitmap_range_any(bm, 1, 6)
        assert not bitmap_range_any(bm, 9, 62)
        assert not bitmap_range_any(bm, 64, 10_000)
        # inverted / negative / empty (BoundaryIndexSearch.cpp:92)
        assert not bitmap_range_any(bm, 100, 10)
        assert bitmap_range_any(bm, -1000, 0)
        assert not bitmap_range_any(bm, -10, -1)
        assert not bitmap_range_any(b"", 0, 100)
        # huge out-of-corpus window (BoundaryIndexSearch.cpp:107)
        assert not bitmap_range_any(bm, 4294960000, 4294961000)


class TestGranuleHits:
    """Vectorized sweep == scalar bitmap_range_any over every closed
    granule [g*step, g*step + step] (SkipIndexBenchmark.h:52-59:
    addRangeClosed — inclusive upper bound, adjacent granules overlap
    by one row)."""

    def test_matches_scalar_loop(self):
        rng = np.random.default_rng(11)
        for step in (8, 16, 64, 5, 13):  # incl. non-8-divisible paths
            for _ in range(20):
                total = int(rng.integers(1, 300))
                ids = np.unique(rng.integers(
                    0, max(total + 10, 2), size=rng.integers(0, 30)))
                bm = row_ids_to_u8_bitmap(ids)
                got = bitmap_granule_hits(bm, step, total)
                n_gran = (total + step - 1) // step
                want = np.array(
                    [bitmap_range_any(bm, g * step, g * step + step)
                     for g in range(n_gran)], dtype=bool)
                assert got.shape == want.shape
                assert (got == want).all(), (ids, step, total)

    def test_closed_upper_bound(self):
        # a hit exactly at row step lights granule 0 AND granule 1
        bm = row_ids_to_u8_bitmap([8])
        hits = bitmap_granule_hits(bm, 8, 24)
        assert hits.tolist() == [True, True, False]

    def test_empty(self):
        assert bitmap_granule_hits(b"", 8, 0).size == 0
        assert not bitmap_granule_hits(b"", 8, 100).any()

    def test_engine_sweep(self, corpus_a_index):
        hits = corpus_a_index.query_term_granules("col1", "Ancient", 8)
        # corpus A has 5 docs -> 1 granule; rows 0 and 4 match
        assert hits.tolist() == [True]
        hits2 = corpus_a_index.query_term_granules(
            "col1", "Ancient", 8, total_rows=40)
        assert hits2.tolist() == [True, False, False, False, False]

    def test_engine_sweep_variants(self, corpus_a_index):
        """terms / sentence / regex sweeps agree with their scalar
        with_range twins granule-by-granule."""
        ix = corpus_a_index
        probe = ["Ancient", "Social", "Chemical"]
        s = "Military strategies evolve."
        pairs = [
            (ix.query_terms_granules("col1", probe, 8, 40),
             lambda g: ix.query_terms_with_range(
                 "col1", probe, g * 8, g * 8 + 8)),
            (ix.query_sentence_granules("col1", s, 8, 40),
             lambda g: ix.query_sentence_with_range(
                 "col1", s, g * 8, g * 8 + 8)),
            (ix.regex_term_granules("col1", "%ncient%", 8, 40),
             lambda g: ix.regex_term_with_range(
                 "col1", "%ncient%", g * 8, g * 8 + 8)),
        ]
        for hits, scalar in pairs:
            assert hits.tolist() == [scalar(g) for g in range(5)]


class TestWithRangeQueries:
    """Corpus A: col1 'Ancient' in rows {0, 4}; 'Social' in {2};
    col2 'judgment'/'Judgment' in rows {1, 4}."""

    def test_term(self, corpus_a_index):
        ix = corpus_a_index
        assert ix.query_term_with_range("col1", "Ancient", 0, 1)
        assert ix.query_term_with_range("col1", "Ancient", 4, 4)
        assert not ix.query_term_with_range("col1", "Ancient", 1, 3)
        assert not ix.query_term_with_range("col1", "Ancient", 5, 900)
        # inverted range is always False (FunctionalFFI boundary rule)
        assert not ix.query_term_with_range("col1", "Ancient", 4, 0)
        # negative lrange clamps, inclusive upper bound
        assert ix.query_term_with_range("col1", "Ancient", -1000, 0)
        assert not ix.query_term_with_range("col1", "missingterm", 0, 900)

    def test_terms(self, corpus_a_index):
        ix = corpus_a_index
        probe = ["Ancient", "Social", "Chemical"]  # rows 0, 2, 4
        assert ix.query_terms_with_range("col1", probe, 0, 1)
        assert not ix.query_terms_with_range("col1", probe, 1, 1)
        assert ix.query_terms_with_range("col1", probe, 2, 2)
        assert not ix.query_terms_with_range("col1", probe, 3, 3)
        assert ix.query_terms_with_range("col1", probe, 3, 4)

    def test_sentence(self, corpus_a_index):
        ix = corpus_a_index
        # token-OR semantics: any analyzed token hit counts
        s = "Military strategies evolve with technological advancements."
        assert ix.query_sentence_with_range("col1", s, 3, 3)  # military
        assert not ix.query_sentence_with_range(
            "col1", "zzz qqq xyzzy", 0, 900)

    def test_regex(self, corpus_a_index):
        ix = corpus_a_index
        assert ix.regex_term_with_range("col1", "%ncient%", 0, 0)
        assert ix.regex_term_with_range("col1", "%ncient%", 4, 8)
        assert not ix.regex_term_with_range("col1", "%ncient%", 1, 3)
        assert not ix.regex_term_with_range("col1", "%zzzzz%", 0, 900)

    def test_matches_bitmap_per_granule(self, corpus_a_index):
        """with_range over a granule grid == granule-restricted bitmap."""
        from tantivy_search_spark.bitmap import u8_bitmap_to_row_ids
        ix = corpus_a_index
        bm = ix.query_term_bitmap("col1", "Ancient")
        hits = set(u8_bitmap_to_row_ids(bm).tolist())
        for lo in range(0, 8, 2):
            want = any(lo <= h <= lo + 1 for h in hits)
            assert ix.query_term_with_range(
                "col1", "Ancient", lo, lo + 1) == want

    def test_local_tier_parity(self, corpus_a_index):
        from tantivy_search_spark.search.engine import SearchIndex
        local = SearchIndex.open_local(corpus_a_index.index_path)
        for lo in range(0, 6):
            assert (local.query_term_with_range("col1", "Ancient", lo, lo)
                    == corpus_a_index.query_term_with_range(
                        "col1", "Ancient", lo, lo))
        assert local.regex_term_with_range("col1", "%ncient%", 4, 4)
        assert not local.query_terms_with_range(
            "col1", ["Ancient"], 1, 3)

    def test_deletes_mask_hits(self, spark, tmp_path):
        """A tombstoned row must stop reporting granule hits."""
        from corpora import corpus_a_rows
        from tantivy_search_spark.config import IndexConfig
        from tantivy_search_spark.index.builder import IndexBuilder
        from tantivy_search_spark.search.engine import SearchIndex

        path = str(tmp_path / "idx_range_del")
        cfg = IndexConfig.from_json(["col1", "col2", "col3"], "{}")
        cfg.parts_per_shard = 2
        cfg.n_buckets = 8
        df = spark.createDataFrame(corpus_a_rows())
        IndexBuilder(spark, path, cfg, rows_per_part=2).build(
            df, id_col="doc_id")
        ix = SearchIndex(spark, path)
        assert ix.query_term_with_range("col1", "Ancient", 0, 0)
        ix.delete_row_ids([0])
        assert not ix.query_term_with_range("col1", "Ancient", 0, 0)
        assert ix.query_term_with_range("col1", "Ancient", 4, 4)
