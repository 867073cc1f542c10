"""bm25_search_batch == per-query bm25_search, query by query.

The batch path shares one postings scan + one per-doc aggregation across
all queries (the cluster-scale throughput design); these tests pin it to
the sequential exact path on corpus A (reference mocked docs,
/root/reference/src/common/test_util.rs:32-59).
"""

import pytest


BATCH = [
    ("Ancient empires rise and fall", False),
    ("Ancient empires rise and fall", True),
    ("ancient", True),
    ("moral horizons", False),
    ("artistic expressions humanity", True),
    ("nonexistent gibberish tokens", True),
]


def _rows(df):
    return [(r["row_id"], round(r["score"], 4)) for r in df.collect()]


class TestBatchSearch:
    def test_batch_equals_sequential(self, corpus_a_index):
        ix = corpus_a_index
        batch = ix.bm25_search_batch(BATCH, top_k=5).collect()
        by_q = {}
        for r in batch:
            by_q.setdefault(r["query_id"], []).append(
                (r["row_id"], round(r["score"], 4)))
        for qid, (s, op_or) in enumerate(BATCH):
            want = _rows(ix.bm25_search(s, top_k=5, operator_or=op_or))
            assert by_q.get(qid, []) == want, f"query {qid}: {s!r} or={op_or}"

    def test_batch_single_column(self, corpus_a_index):
        ix = corpus_a_index
        batch = ix.bm25_search_batch(
            [("ancient", True)], column_names=["col2"], top_k=10).collect()
        want = _rows(ix.bm25_search("ancient", column_names=["col2"],
                                    top_k=10, operator_or=True))
        got = [(r["row_id"], round(r["score"], 4)) for r in batch]
        assert got == want

    def test_batch_nlq(self, corpus_a_index):
        ix = corpus_a_index
        qs = [("col2:ancient OR (moral horizons)", False),
              ("ancient rise fall", False)]
        batch = ix.bm25_search_batch(qs, top_k=5, enable_nlq=True).collect()
        by_q = {}
        for r in batch:
            by_q.setdefault(r["query_id"], []).append(
                (r["row_id"], round(r["score"], 4)))
        for qid, (s, op_or) in enumerate(qs):
            want = _rows(ix.bm25_search(s, top_k=5, operator_or=op_or,
                                        enable_nlq=True))
            assert by_q.get(qid, []) == want

    def test_batch_nlq_nested_or_flattens_equal(self, corpus_a_index):
        """OR-associative nesting flattens onto the fast kernel (the
        sequential side scores through the compile path, so equality
        cross-checks the flatten); And-of-Or must NOT flatten — the
        kernel sums every matched group and DNF distribution would
        double-count shared atoms."""
        from tantivy_search_spark.search import querytree as qt
        ix = corpus_a_index
        an = ix._analyzers()
        cols = ix.config.columns
        # column-qualified conjunction: on a multi-column index a BARE
        # conjunction expands to And-of-per-column-Ors, which correctly
        # stays on the compile path
        nested_or = ("col2:ancient OR (col2:moral OR "
                     "(col2:artistic col2:expressions))")
        and_of_or = "ancient (moral OR horizons)"
        t1 = qt.parse_nlq(nested_or, cols, an, conjunction_by_default=True)
        t2 = qt.parse_nlq(and_of_or, cols, an, conjunction_by_default=True)
        assert qt.flat_groups(t1) is not None
        assert qt.flat_groups(t2) is None
        qs = [(nested_or, False), (and_of_or, False)]
        batch = ix.bm25_search_batch(qs, top_k=5, enable_nlq=True).collect()
        by_q = {}
        for r in batch:
            by_q.setdefault(r["query_id"], []).append(
                (r["row_id"], round(r["score"], 4)))
        for qid, (s, op_or) in enumerate(qs):
            want = _rows(ix.bm25_search(s, top_k=5, operator_or=op_or,
                                        enable_nlq=True))
            assert by_q.get(qid, []) == want, s

    def test_batch_nlq_mustnot_takes_flat_kernel(self, corpus_a_index):
        """Top-level '-term' exclusions ride the flat kernel as
        matching-only columns (no score contribution, AND-NOT into the
        query match); equality vs the sequential compile path pins the
        semantics, including exclusion of an AND group."""
        ix = corpus_a_index
        qs = [("col2:ancient -col2:rise", False),
              ("col2:moral OR col2:ancient -col2:empires", False),
              ("col2:ancient -(col2:moral col2:horizons)", False),
              ("col2:ancient^2 -col2:rise", False)]
        batch = ix.bm25_search_batch(qs, top_k=5, enable_nlq=True).collect()
        by_q = {}
        for r in batch:
            by_q.setdefault(r["query_id"], []).append(
                (r["row_id"], round(r["score"], 4)))
        matched_any = False
        for qid, (s, op_or) in enumerate(qs):
            want = _rows(ix.bm25_search(s, top_k=5, operator_or=op_or,
                                        enable_nlq=True))
            assert by_q.get(qid, []) == want, s
            matched_any = matched_any or bool(want)
        assert matched_any  # the exclusions must not blank every query

    def test_batch_nlq_boosts_take_flat_kernel(self, corpus_a_index):
        """Boost factors are linear in the score, so flat_groups_weighted
        distributes them onto atom weights and boosted batches stay on
        the fast kernel (score weight matrix != match count matrix);
        equality vs the sequential compile path pins the math."""
        from tantivy_search_spark.search import querytree as qt
        ix = corpus_a_index
        an = ix._analyzers()
        qs = [("col2:ancient^2 col2:rise", False),
              ("col2:ancient OR (col2:moral col2:horizons)^3", False),
              ("col1:ancient^2 col1:ancient", True)]
        for s, _ in qs:
            t = qt.parse_nlq(s, ix.config.columns, an,
                             conjunction_by_default=True)
            assert qt.flat_groups_weighted(t) is not None, s
            assert qt.flat_groups(t) is None, s  # WAND view unchanged
        batch = ix.bm25_search_batch(qs, top_k=5, enable_nlq=True).collect()
        by_q = {}
        for r in batch:
            by_q.setdefault(r["query_id"], []).append(
                (r["row_id"], round(r["score"], 4)))
        for qid, (s, op_or) in enumerate(qs):
            want = _rows(ix.bm25_search(s, top_k=5, operator_or=op_or,
                                        enable_nlq=True))
            assert by_q.get(qid, []) == want, s

    def test_batch_zero_boost_takes_legacy_kernel(self, corpus_a_index):
        """'^0' zeroes a subtree's score weight, breaking the slim
        kernel's score>0 == matched inference — such plans must route to
        the legacy full-width match path and still equal the sequential
        compile path (a zero-boosted AND group can gate matching while
        contributing nothing to the score)."""
        ix = corpus_a_index
        qs = [("col2:ancient^0 col2:rise", False),
              ("col2:moral OR (col2:ancient col2:empires)^0", False)]
        batch = ix.bm25_search_batch(qs, top_k=5, enable_nlq=True).collect()
        by_q = {}
        for r in batch:
            by_q.setdefault(r["query_id"], []).append(
                (r["row_id"], round(r["score"], 4)))
        matched_any = False
        for qid, (s, op_or) in enumerate(qs):
            want = _rows(ix.bm25_search(s, top_k=5, operator_or=op_or,
                                        enable_nlq=True))
            assert by_q.get(qid, []) == want, s
            matched_any = matched_any or bool(want)
        assert matched_any

    def test_batch_all_empty(self, corpus_a_index):
        out = corpus_a_index.bm25_search_batch(
            [("", False), ("", True)], top_k=5)
        assert out.count() == 0

    def test_batch_with_injected_statistics(self, corpus_a_index):
        """Q9 semantics on the batch path: externally injected global
        Statistics must flow into batch scoring exactly as in the
        sequential path (the multi-part distributed-correctness hook)."""
        from tantivy_search_spark.search.engine import Statistics

        ix = corpus_a_index
        # double every df and N: scores must shift identically in both
        # code paths (values differ from local stats, proving injection)
        toks = {c: ix.config.analyzer(c)("ancient rise fall")
                for c in ix.config.columns}
        local = ix.local_statistics(toks)
        fake = Statistics(
            docs_freq=[(t, c, df * 2) for (t, c, df) in local.docs_freq],
            total_num_tokens={c: n * 2 for c, n in
                              local.total_num_tokens.items()},
            total_num_docs=local.total_num_docs * 2,
        )
        want = _rows(ix.bm25_search("ancient rise fall", top_k=10,
                                    operator_or=True, statistics=fake))
        plain = _rows(ix.bm25_search("ancient rise fall", top_k=10,
                                     operator_or=True))
        assert want != plain  # injection actually changed the scores
        got = [(r["row_id"], round(r["score"], 4)) for r in
               ix.bm25_search_batch([("ancient rise fall", True)], top_k=10,
                                    statistics=fake).collect()]
        assert got == want

    def test_batch_many_atoms_stays_correct(self, corpus_a_index):
        """A workload with hundreds of distinct atoms: the per-doc agg is
        a fixed-width map build (the old 2-expressions-per-atom aggregate
        blew janino's 64KB codegen limit here), and per-query results
        must still equal the sequential path."""
        import itertools

        ix = corpus_a_index
        vocab = [r["term"] for r in
                 ix._stats.select("term").distinct().orderBy("term")
                 .limit(120).collect()]
        # 40 queries x 3 distinct terms -> up to ~360 atoms over 3 columns
        qs = [(" ".join(vocab[i:i + 3]), True)
              for i in range(0, 117, 3)] + [("ancient rise", False)]
        batch = ix.bm25_search_batch(qs, top_k=3).collect()
        by_q = {}
        for r in batch:
            by_q.setdefault(r["query_id"], []).append(
                (r["row_id"], round(r["score"], 4)))
        for qid in (0, 7, 19, 38, len(qs) - 1):  # spot-check across the set
            s, op_or = qs[qid]
            want = _rows(ix.bm25_search(s, top_k=3, operator_or=op_or))
            assert by_q.get(qid, []) == want, f"query {qid}: {s!r}"

    def test_batch_doc_chunking_exact(self, corpus_a_index):
        """With the dense-matrix budget forced to minimum, the batch
        scorer processes docs in many small chunks — results must equal
        the unchunked run exactly (round-3 memory-bounding fix)."""
        ix = corpus_a_index
        qs = [("Ancient empires rise and fall", True),
              ("moral horizons", False), ("ancient", True)]
        base = sorted(
            (r["query_id"], r["row_id"], round(r["score"], 4))
            for r in ix.bm25_search_batch(qs, top_k=5).collect())
        old = ix.BATCH_MATRIX_BUDGET
        ix.BATCH_MATRIX_BUDGET = 1  # rows_chunk floors at 32
        try:
            chunked = sorted(
                (r["query_id"], r["row_id"], round(r["score"], 4))
                for r in ix.bm25_search_batch(qs, top_k=5).collect())
        finally:
            ix.BATCH_MATRIX_BUDGET = old
        assert chunked == base

    def test_repeated_batches_release_broadcasts(self, corpus_a_index):
        """The broadcast pool must hold only the most recent query's
        broadcasts (older ones unpersisted, not accumulated)."""
        ix = corpus_a_index
        for _ in range(3):
            ix.bm25_search_batch([("ancient rise", True)], top_k=3).collect()
        assert len(ix._bcast_pool) <= 8

    def test_batch_alive_filter(self, corpus_a_index):
        from tantivy_search_spark.bitmap import row_ids_to_u8_bitmap

        ix = corpus_a_index
        bm = row_ids_to_u8_bitmap([0, 4])
        batch = ix.bm25_search_batch(
            [("ancient rise fall", True)], top_k=5,
            alive_bitmap=bm).collect()
        want = _rows(ix.bm25_search("ancient rise fall", top_k=5,
                                    operator_or=True, alive_bitmap=bm))
        got = [(r["row_id"], round(r["score"], 4)) for r in batch]
        assert got == want
        assert all(rid in (0, 4) for rid, _ in got)


class TestF32PrefilterTies:
    """Adversarial pin for the float32 score prefilter (round 4): a
    mass tie at the top-k boundary — scores equal beyond float32
    resolution — must still cut by exact float64 (score desc, row_id
    asc), identical to the sequential path.  The tie forces the
    epsilon-guarded candidate superset to its worst case (every matched
    doc survives the prefilter), exercising the full exact-rescore
    branch."""

    def test_mass_tie_at_k_boundary(self, spark, tmp_path):
        from tantivy_search_spark.config import IndexConfig
        from tantivy_search_spark.index.builder import IndexBuilder
        from tantivy_search_spark.search.engine import SearchIndex

        # 120 docs with identical token multisets (permuted order):
        # identical tf / doclen => bit-identical BM25 scores
        words = ["tie", "score", "alpha", "beta", "gamma"]
        rows = []
        for i in range(120):
            perm = words[i % 5:] + words[:i % 5]
            rows.append({"doc_id": i, "text": " ".join(perm)})
        # plus distinct higher-scoring docs that must stay on top
        rows.append({"doc_id": 1000, "text": "tie tie score tie"})
        rows.append({"doc_id": 1001, "text": "tie score tie score"})
        df = spark.createDataFrame(rows)
        path = str(tmp_path / "tie_idx")
        cfg = IndexConfig.from_json(["text"], "{}")
        cfg.parts_per_shard = 2
        IndexBuilder(spark, path, cfg, rows_per_part=16).build(
            df, id_col="doc_id")
        ix = SearchIndex(spark, path)
        qs = [("tie score", True), ("tie score", False)]
        batch = ix.bm25_search_batch(qs, top_k=10).collect()
        by_q = {}
        for r in batch:
            by_q.setdefault(r["query_id"], []).append(
                (r["row_id"], r["score"]))
        for qid, (s, op_or) in enumerate(qs):
            want = [(r["row_id"], r["score"]) for r in
                    ix.bm25_search(s, top_k=10, operator_or=op_or).collect()]
            assert by_q.get(qid, []) == want, f"query {qid}"
            # ties broken by ascending row_id among the equal-score docs
            tie_rows = [rid for rid, _ in want if rid < 1000]
            assert tie_rows == sorted(tie_rows)


class TestBatchAuto:
    """bm25_search_batch_auto: one entry point that serves small
    corpora from the in-process tier and routes big ones to the
    packed-kernel Spark job — row-identical either way."""

    QS = [("ancient empires", True), ("moral horizons", False),
          ("ancient", True), ("nonexistent gibberish", True)]

    def _rows(self, df):
        return sorted((r["query_id"], r["row_id"], round(r["score"], 6))
                      for r in df.collect())

    def test_auto_equals_batch_small_corpus(self, corpus_a_index):
        ix = corpus_a_index
        auto = self._rows(ix.bm25_search_batch_auto(self.QS, top_k=5))
        dist = self._rows(ix.bm25_search_batch(self.QS, top_k=5))
        assert auto == dist and auto

    def test_auto_routes_distributed_past_threshold(self, corpus_a_index,
                                                    monkeypatch):
        ix = corpus_a_index
        monkeypatch.setattr(type(ix), "AUTO_LOCAL_MAX_BYTES", 0)
        auto = self._rows(ix.bm25_search_batch_auto(self.QS, top_k=5))
        dist = self._rows(ix.bm25_search_batch(self.QS, top_k=5))
        assert auto == dist and auto

    def test_auto_nlq(self, corpus_a_index):
        ix = corpus_a_index
        qs = [("col2:ancient OR (moral horizons)", False),
              ('"ancient empires" -moral', False)]
        auto = self._rows(ix.bm25_search_batch_auto(qs, top_k=5,
                                                    enable_nlq=True))
        dist = self._rows(ix.bm25_search_batch(qs, top_k=5,
                                               enable_nlq=True))
        assert auto == dist
