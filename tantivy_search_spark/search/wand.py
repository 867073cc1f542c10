"""Block-max WAND pruning for single-column BM25 top-k.

The reference relies on forked-Tantivy ``weight.for_each_pruning`` —
block-max WAND with a rising heap threshold (SURVEY.md §4, north_star
requirement).  Spark rebuild: posting shards are doc-range aligned
(shard = part_id // parts_per_shard for every term), so WAND runs
independently per shard inside one ``applyInPandas`` group:

  phase 1  score the rarest query term fully — its kth best score is a
           valid lower bound θ on the final kth best total (any doc's
           total >= its single-term score).
  phase 2  for every other term, skip each 128-doc block whose upper
           bound  blockmax(term, block) + Σ_{other terms} shardmax
           cannot reach θ; decode only surviving blocks (skip-pointer
           subset decode).  For AND queries additionally drop blocks
           whose doc range cannot intersect the rarest term's doc set.
  phase 3  aggregate decoded contributions per doc, local top-k, then
           global orderBy(score desc, row_id).limit(k) merges shards —
           exactly Tantivy's per-segment heap + merge_fruits shape.

Pruning never changes results for OR queries (bounds are conservative)
and the AND path only drops blocks provably outside the intersection;
tests/test_wand.py asserts equality against the exact path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from tantivy_search_spark import bm25
from tantivy_search_spark.bitmap import mask_for_row_ids
from tantivy_search_spark.fieldnorm import FIELD_NORMS_TABLE
from tantivy_search_spark.index import layout


def make_wand_scorer(
    tokens: list[str],
    idf_map: dict[str, float],
    avgdl: float,
    k1: float,
    b: float,
    block_size: int,
    top_k: int,
    and_mode: bool,
    alive_bitmap: bytes | None,
    tombstones: np.ndarray,
):
    """Build the applyInPandas function: one shard's posting rows ->
    (doc_id, score) rows for that shard's local top-k candidates."""
    n_tokens = len(set(tokens))

    def norm_of(norm_ids: np.ndarray) -> np.ndarray:
        return bm25.doc_norm(FIELD_NORMS_TABLE[norm_ids], avgdl, k1, b)

    def score_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        rows_by_term: dict[str, list] = {}
        for r in pdf.itertuples(index=False):
            rows_by_term.setdefault(r.term, []).append(r)
        if and_mode and len(rows_by_term) < n_tokens:
            return pd.DataFrame({"doc_id": [], "score": []})

        # per-term shard-level max score bound from block metadata only
        shard_max: dict[str, float] = {}
        min_norm_global: dict[str, float] = {}
        for term, rows in rows_by_term.items():
            idf_t = idf_map[term]
            best = 0.0
            for r in rows:
                mt = np.asarray(r.block_max_tf)
                mn = norm_of(np.asarray(r.block_min_norm, dtype=np.int64))
                best = max(best, float(
                    np.max(idf_t * (k1 + 1) * mt / (mt + mn))))
            shard_max[term] = best

        # phase 1: fully score the rarest term (fewest postings here)
        order = sorted(rows_by_term, key=lambda t: sum(r.df for r in rows_by_term[t]))
        rare = order[0]
        acc_docs: list[np.ndarray] = []
        acc_scores: list[np.ndarray] = []
        acc_terms: list[np.ndarray] = []

        def apply_masks(d, tf, nm):
            mask = np.ones(d.shape[0], dtype=bool)
            if tombstones.size:
                mask &= ~np.isin(d, tombstones)
            if alive_bitmap is not None:
                mask &= mask_for_row_ids(d, alive_bitmap)
            return d[mask], tf[mask], nm[mask]

        rare_docs_all = []
        for r in rows_by_term[rare]:
            d, tf, nm = layout.decode_blocks(
                r.block_first, r.deltas, r.tfs, r.norms, block_size)
            d, tf, nm = apply_masks(d, tf, nm)
            if d.size == 0:
                continue
            s = bm25.term_score(tf, idf_map[rare], norm_of(nm), k1)
            acc_docs.append(d)
            acc_scores.append(s)
            acc_terms.append(np.zeros(d.size, dtype=np.int8))
            rare_docs_all.append(d)
        if and_mode and not rare_docs_all:
            return pd.DataFrame({"doc_id": [], "score": []})
        # sorted: the AND-mode block-overlap test below searchsorted()s
        # into this, and input rows arrive in arbitrary order
        rare_docs = (np.sort(np.concatenate(rare_docs_all))
                     if rare_docs_all else np.empty(0, dtype=np.int64))

        # θ: kth best single-term score from the rarest term (0 if fewer)
        if acc_scores:
            flat = np.concatenate(acc_scores)
            theta = float(np.partition(flat, -top_k)[-top_k]) \
                if flat.size >= top_k else 0.0
        else:
            theta = 0.0
        if and_mode:
            theta = 0.0  # AND totals need every term; bound by range only

        # terms processed in ascending-df order; a doc FIRST appearing at
        # term i can still gain at most sum of the LATER terms' maxima,
        # so the new-entrant bound uses suffix sums — far tighter than
        # an all-other-terms sum when the query anchors on a selective
        # term and the tail terms are hot (idf ~0.04 keywords): their
        # blocks then decode only where they overlap known candidates.
        suffix = {}
        run = 0.0
        for t in reversed(order):
            suffix[t] = run
            run += shard_max[t]
        # candidate docs accumulated so far (sorted); blocks overlapping
        # them must decode to keep candidate totals exact
        cand = rare_docs

        for ti, term in enumerate(order[1:], start=1):
            idf_t = idf_map[term]
            new_docs = []
            for r in rows_by_term[term]:
                first = np.asarray(r.block_first, dtype=np.int64)
                last = np.asarray(r.block_last, dtype=np.int64)
                mt = np.asarray(r.block_max_tf)
                mn = norm_of(np.asarray(r.block_min_norm, dtype=np.int64))
                bmax = idf_t * (k1 + 1) * mt / (mt + mn)
                # new-entrant bound: could a doc seen first here still
                # reach theta with only later terms' help?
                keep = (bmax + suffix[term]) >= theta
                if cand.size:
                    lo = np.searchsorted(cand, first, side="left")
                    hi = np.searchsorted(cand, last, side="right")
                    overlap = hi > lo
                    keep = (keep | overlap) if not and_mode else overlap
                elif and_mode:
                    keep &= False
                if not keep.any():
                    continue
                d, tf, nm = layout.decode_blocks(
                    r.block_first, r.deltas, r.tfs, r.norms, block_size,
                    keep_blocks=keep)
                d, tf, nm = apply_masks(d, tf, nm)
                if d.size == 0:
                    continue
                s = bm25.term_score(tf, idf_t, norm_of(nm), k1)
                acc_docs.append(d)
                acc_scores.append(s)
                acc_terms.append(np.full(d.size, ti, dtype=np.int8))
                new_docs.append(d)
            if not and_mode and new_docs:
                cand = np.union1d(cand, np.concatenate(new_docs))

        if not acc_docs:
            return pd.DataFrame({"doc_id": [], "score": []})
        docs = np.concatenate(acc_docs)
        scores = np.concatenate(acc_scores)
        terms = np.concatenate(acc_terms)
        uniq, inv = np.unique(docs, return_inverse=True)
        tot = np.zeros(uniq.size)
        np.add.at(tot, inv, scores)
        if and_mode:
            nterm = np.zeros(uniq.size, dtype=np.int32)
            # count distinct terms per doc (terms arrive grouped by term)
            seen = np.zeros((uniq.size,), dtype=np.int64)
            for ti in np.unique(terms):
                sel = np.unique(inv[terms == ti])
                nterm[sel] += 1
            keep_docs = nterm == n_tokens
            uniq, tot = uniq[keep_docs], tot[keep_docs]
        if uniq.size > top_k:
            # local heap: keep top_k by (score desc, doc asc)
            idx = np.lexsort((uniq, -tot))[:top_k]
            uniq, tot = uniq[idx], tot[idx]
        return pd.DataFrame({"doc_id": uniq, "score": tot})

    return score_shard
