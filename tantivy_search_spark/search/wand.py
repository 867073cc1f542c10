"""Block-max WAND pruning for BM25 top-k.

The reference relies on forked-Tantivy ``weight.for_each_pruning`` —
block-max WAND with a rising heap threshold (SURVEY.md §4, north_star
requirement).  Spark rebuild: posting shards are doc-range aligned
(shard = part_id // parts_per_shard for every term and column), so
WAND runs independently per shard inside one ``applyInPandas`` group:

  phase 1  score the rarest query atom fully — its kth best score is a
           valid lower bound θ on the final kth best total (any doc's
           total >= its single-atom score).
  phase 2  for every other atom, skip each 128-doc block whose upper
           bound  blockmax(atom, block) + Σ_{later atoms} shardmax
           cannot reach θ; decode only surviving blocks (skip-pointer
           subset decode).  For AND queries additionally drop blocks
           whose doc range cannot intersect the rarest atom's doc set.
  phase 3  aggregate decoded contributions per doc, local top-k, then
           global orderBy(score desc, row_id).limit(k) merges shards —
           exactly Tantivy's per-segment heap + merge_fruits shape.

Round 3 generalizations:
* atoms are (col, term) pairs — multi-column OR trees prune with
  per-column block-max bounds and per-column norms/avgdl;
* tombstones arrive either as a small broadcast array or, for delete
  sets past the broadcast cap, per shard through a cogroup (each task
  sees only its own doc-range's tombstones — no driver
  materialization, no full-set broadcast).  Tombstone masking happens
  before θ and before the local top-k, so pruning stays exact under
  deletes of any size.

Pruning never changes results for OR queries (bounds are conservative)
and the AND path only drops blocks provably outside the intersection;
tests/test_wand.py asserts equality against the exact path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from tantivy_search_spark import bm25
from tantivy_search_spark.bitmap import mask_for_row_ids
from tantivy_search_spark.fieldnorm import FIELD_NORMS_TABLE
from tantivy_search_spark.index import layout


def _score_and_mode(rows_by_atom, order, idf_map, norm_of, apply_masks,
                    rare_docs, acc_docs, acc_scores, acc_atoms,
                    block_size, n_atoms, top_k, k1):
    """AND-mode phase 2/3: every atom must match, so candidates are
    exactly the rare atom's docs — decode only blocks whose doc range
    intersects them, then keep docs matched by all atoms."""
    for ai, key in enumerate(order[1:], start=1):
        idf_t = idf_map[key]
        for r in rows_by_atom[key]:
            first = np.asarray(r.block_first, dtype=np.int64)
            last = np.asarray(r.block_last, dtype=np.int64)
            if rare_docs.size:
                lo = np.searchsorted(rare_docs, first, side="left")
                hi = np.searchsorted(rare_docs, last, side="right")
                keep = hi > lo
            else:
                keep = np.zeros(first.size, dtype=bool)
            if not keep.any():
                continue
            d, tf, nm = layout.decode_blocks(
                r.block_first, r.deltas, r.tfs, r.norms, block_size,
                keep_blocks=keep)
            d, tf, nm = apply_masks(d, tf, nm)
            if d.size == 0:
                continue
            s = bm25.term_score(tf, idf_t, norm_of(nm, key[0]), k1)
            acc_docs.append(d)
            acc_scores.append(s)
            acc_atoms.append(np.full(d.size, ai, dtype=np.int8))

    if not acc_docs:
        return pd.DataFrame({"doc_id": [], "score": []})
    docs = np.concatenate(acc_docs)
    scores = np.concatenate(acc_scores)
    atom_ids = np.concatenate(acc_atoms)
    uniq, inv = np.unique(docs, return_inverse=True)
    tot = np.zeros(uniq.size)
    np.add.at(tot, inv, scores)
    natom = np.zeros(uniq.size, dtype=np.int32)
    for ai in np.unique(atom_ids):
        sel = np.unique(inv[atom_ids == ai])
        natom[sel] += 1
    keep_docs = natom == n_atoms
    uniq, tot = uniq[keep_docs], tot[keep_docs]
    if uniq.size > top_k:
        idx = np.lexsort((uniq, -tot))[:top_k]
        uniq, tot = uniq[idx], tot[idx]
    return pd.DataFrame({"doc_id": uniq, "score": tot})


def make_wand_scorer(
    atoms: list[tuple[str, str]],
    idf_map: dict[tuple[str, str], float],
    avgdl_map: dict[str, float],
    k1: float,
    b: float,
    block_size: int,
    top_k: int,
    and_mode: bool,
    alive_bitmap: bytes | None,
):
    """Build the shard scorer: (posting rows of one shard, that shard's
    tombstone ids) -> (doc_id, score) rows for the shard's local top-k
    candidates.  ``atoms`` are (col, term) scoring atoms; AND mode
    requires every atom to match (single-column AND queries)."""
    n_atoms = len(set(atoms))

    def norm_of(norm_ids: np.ndarray, col: str) -> np.ndarray:
        return bm25.doc_norm(FIELD_NORMS_TABLE[norm_ids],
                             avgdl_map[col], k1, b)

    def score_shard(pdf: pd.DataFrame,
                    tombstones: np.ndarray) -> pd.DataFrame:
        rows_by_atom: dict[tuple[str, str], list] = {}
        for r in pdf.itertuples(index=False):
            key = (r.col, r.term)
            if key in idf_map:
                rows_by_atom.setdefault(key, []).append(r)
        if not rows_by_atom or (and_mode and len(rows_by_atom) < n_atoms):
            return pd.DataFrame({"doc_id": [], "score": []})

        # per-atom shard-level max score bound from block metadata only
        shard_max: dict[tuple[str, str], float] = {}
        for key, rows in rows_by_atom.items():
            idf_t = idf_map[key]
            best = 0.0
            for r in rows:
                mt = np.asarray(r.block_max_tf)
                mn = norm_of(np.asarray(r.block_min_norm, dtype=np.int64),
                             key[0])
                best = max(best, float(
                    np.max(idf_t * (k1 + 1) * mt / (mt + mn))))
            shard_max[key] = best

        # phase 1: fully score the rarest atom (fewest postings here)
        order = sorted(rows_by_atom,
                       key=lambda a: sum(r.df for r in rows_by_atom[a]))
        rare = order[0]
        acc_docs: list[np.ndarray] = []
        acc_scores: list[np.ndarray] = []
        acc_atoms: list[np.ndarray] = []

        def apply_masks(d, tf, nm):
            mask = np.ones(d.shape[0], dtype=bool)
            if tombstones.size:
                mask &= ~np.isin(d, tombstones)
            if alive_bitmap is not None:
                mask &= mask_for_row_ids(d, alive_bitmap)
            return d[mask], tf[mask], nm[mask]

        rare_docs_all = []
        for r in rows_by_atom[rare]:
            d, tf, nm = layout.decode_blocks(
                r.block_first, r.deltas, r.tfs, r.norms, block_size)
            d, tf, nm = apply_masks(d, tf, nm)
            if d.size == 0:
                continue
            s = bm25.term_score(tf, idf_map[rare], norm_of(nm, rare[0]), k1)
            acc_docs.append(d)
            acc_scores.append(s)
            acc_atoms.append(np.zeros(d.size, dtype=np.int8))
            rare_docs_all.append(d)
        if and_mode and not rare_docs_all:
            return pd.DataFrame({"doc_id": [], "score": []})
        # sorted: the AND-mode block-overlap test below searchsorted()s
        # into this, and input rows arrive in arbitrary order
        rare_docs = (np.sort(np.concatenate(rare_docs_all))
                     if rare_docs_all else np.empty(0, dtype=np.int64))

        # θ: kth best single-atom score from the rarest atom (0 if fewer)
        if acc_scores:
            flat = np.concatenate(acc_scores)
            theta = float(np.partition(flat, -top_k)[-top_k]) \
                if flat.size >= top_k else 0.0
        else:
            theta = 0.0
        if and_mode:
            theta = 0.0  # AND totals need every atom; bound by range only

        # non-pivot atoms in DESCENDING shard-max order: high-impact
        # atoms first pump the accumulated totals (and with them θ),
        # and leave the hot low-idf tails — which own most blocks — a
        # near-zero suffix bound, so their blocks prune hardest.  A doc
        # FIRST appearing at atom i can still gain at most the suffix
        # sum of the atoms after i.
        rest = sorted(order[1:], key=lambda a: -shard_max[a])
        order = [rare] + rest
        suffix = {}
        run = 0.0
        for a in reversed(order):
            suffix[a] = run
            run += shard_max[a]

        if and_mode:
            return _score_and_mode(
                rows_by_atom, order, idf_map, norm_of, apply_masks,
                rare_docs, acc_docs, acc_scores, acc_atoms, block_size,
                n_atoms, top_k, k1)

        # OR mode: candidates carry their accumulated totals so far.
        # A candidate whose best possible final total
        #   acc + shard_max[current] + suffix[current]
        # is strictly below θ is DEAD — its exact total can no longer
        # reach the shard top-k (≥ top_k docs already have totals ≥ θ),
        # so blocks overlapping only dead candidates skip.  θ itself
        # rises to the kth best accumulated total after every atom
        # (totals only grow, so it stays a valid lower bound).  These
        # two together are what make pruning bite on selective queries:
        # the old any-candidate-overlap rule decoded ~99% of hot-atom
        # blocks because phase-1 docs scatter across the shard's range.
        cand = rare_docs
        acc = np.zeros(cand.size)
        if acc_scores:
            # rare-atom scores, aligned to the sorted candidate order
            d0 = np.concatenate(acc_docs)
            s0 = np.concatenate(acc_scores)
            acc[np.searchsorted(cand, d0)] += s0

        for key in order[1:]:
            idf_t = idf_map[key]
            bound = shard_max[key] + suffix[key]
            live = cand[acc + bound >= theta] if cand.size else cand
            new_docs, new_scores = [], []
            for r in rows_by_atom[key]:
                first = np.asarray(r.block_first, dtype=np.int64)
                last = np.asarray(r.block_last, dtype=np.int64)
                mt = np.asarray(r.block_max_tf)
                mn = norm_of(np.asarray(r.block_min_norm, dtype=np.int64),
                             key[0])
                bmax = idf_t * (k1 + 1) * mt / (mt + mn)
                # new-entrant bound: could a doc seen first here still
                # reach theta with only later atoms' help?
                keep = (bmax + suffix[key]) >= theta
                if live.size:
                    lo = np.searchsorted(live, first, side="left")
                    hi = np.searchsorted(live, last, side="right")
                    keep |= hi > lo
                if not keep.any():
                    continue
                d, tf, nm = layout.decode_blocks(
                    r.block_first, r.deltas, r.tfs, r.norms, block_size,
                    keep_blocks=keep)
                d, tf, nm = apply_masks(d, tf, nm)
                if d.size == 0:
                    continue
                s = bm25.term_score(tf, idf_t, norm_of(nm, key[0]), k1)
                pos = np.searchsorted(cand, d)
                pos_c = np.minimum(pos, max(cand.size - 1, 0))
                in_cand = (cand[pos_c] == d) if cand.size \
                    else np.zeros(d.size, dtype=bool)
                acc[pos[in_cand]] += s[in_cand]
                if (~in_cand).any():
                    new_docs.append(d[~in_cand])
                    new_scores.append(s[~in_cand])
            if new_docs:
                nd = np.concatenate(new_docs)
                ns = np.concatenate(new_scores)
                cand = np.concatenate([cand, nd])
                acc = np.concatenate([acc, ns])
                srt = np.argsort(cand, kind="stable")
                cand, acc = cand[srt], acc[srt]
            if acc.size >= top_k:
                theta = max(theta, float(
                    np.partition(acc, -top_k)[-top_k]))

        if not cand.size:
            return pd.DataFrame({"doc_id": [], "score": []})
        uniq, tot = cand, acc
        if uniq.size > top_k:
            # local heap: keep top_k by (score desc, doc asc)
            idx = np.lexsort((uniq, -tot))[:top_k]
            uniq, tot = uniq[idx], tot[idx]
        return pd.DataFrame({"doc_id": uniq, "score": tot})

    return score_shard


def with_broadcast_tombstones(score_shard, tombstones: np.ndarray):
    """groupBy(shard).applyInPandas adapter: the (small) tombstone array
    ships in the closure."""
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return score_shard(pdf, tombstones)
    return fn


def with_cogrouped_tombstones(score_shard):
    """cogroup(shard).applyInPandas adapter for delete sets past the
    broadcast cap: the right side carries only this shard's tombstoned
    doc_ids (each id shuffles to exactly one shard)."""
    def fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0:
            return pd.DataFrame({"doc_id": [], "score": []})
        tomb = np.unique(right["doc_id"].to_numpy(dtype=np.int64)) \
            if len(right) else np.empty(0, dtype=np.int64)
        return score_shard(left, tomb)
    return fn
