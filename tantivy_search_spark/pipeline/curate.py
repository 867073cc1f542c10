"""Corpus curation: the composed training-data pipeline.

One declarative plan chaining the pipeline operators a 100 TB
pre-training run needs — exact dedup (keep-first), quality floor,
language allowlist — so Catalyst fuses the stages: one scan of the
corpus feeds all three, the dedup groupBy is the only wide shuffle,
and the quality/language predicates evaluate in codegen next to it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tantivy_search_spark.pipeline.dedup import (
    _norm_text,
    fuzzy_duplicate_ids,
)
from tantivy_search_spark.pipeline.text import (
    lang_marker_columns,
    quality_columns,
)


def curate_corpus(
    df: DataFrame,
    text_col: str = "text",
    min_quality: float = 0.3,
    languages: tuple[str, ...] = ("en",),
    fuzzy: bool = False,
    fuzzy_w: int = 3,
    fuzzy_n_perm: int = 16,
    fuzzy_bands: int = 4,
    fuzzy_threshold: float = 0.5,
    fuzzy_family: str = "md5",
) -> DataFrame:
    """Surviving docs with their curation features.

    Keep a doc iff it is the canonical copy of its content group
    (keep-first exact dedup), its quality score clears ``min_quality``,
    and its marker-based language id is in ``languages``.
    Returns (doc_id, quality, pred_lang, group_size).

    ``fuzzy=True`` adds near-duplicate removal: MinHash-LSH candidate
    pairs at ``fuzzy_threshold`` Jaccard → connected components → only
    each cluster's minimum doc_id survives.  Fuzzy clustering runs on
    the FULL corpus (duplicates are duplicates regardless of quality),
    so a doc whose cluster canonical fails the quality/language filters
    is still dropped as a duplicate — document-level filters and
    duplicate identity are independent axes, as in production
    pretraining pipelines.

    Plan shape for 100 TB: quality and language are plain Column
    expressions fused into ONE corpus scan (no per-feature re-scan or
    doc_id join); the only wide operations are the dedup groupBy on the
    content hash and the group join back — and the quality/language
    predicates filter the features side BEFORE that join.  The fuzzy
    stage adds the banded LSH self-join (ids only) and the O(log n)
    component rounds over the (tiny) pair set, then one left-anti-style
    join of survivors against cluster non-minima.
    """
    _, pred = lang_marker_columns(text_col)
    q = quality_columns(text_col)["quality"]
    feats = df.select(
        "doc_id",
        F.md5(_norm_text(text_col)).alias("content_md5"),
        q.alias("quality"),
        pred.alias("pred_lang"),
    )
    groups = feats.groupBy("content_md5").agg(
        F.min("doc_id").alias("canonical_doc_id"),
        F.count("*").alias("group_size"),
    )
    out = (
        feats.where((F.col("quality") >= min_quality)
                    & F.col("pred_lang").isin(list(languages)))
        .join(groups, "content_md5")
        .where(F.col("doc_id") == F.col("canonical_doc_id"))
        .select("doc_id", "quality", "pred_lang", "group_size")
    )
    if fuzzy:
        # rep-level clustering (exact-dup groups collapse before LSH
        # banding; see dedup.fuzzy_duplicate_ids) — the expanded pair
        # set, quadratic in duplicate-cluster size, is never built
        dup_ids = fuzzy_duplicate_ids(
            df.select("doc_id", text_col), text_col=text_col, w=fuzzy_w,
            n_perm=fuzzy_n_perm, bands=fuzzy_bands,
            threshold=fuzzy_threshold, family=fuzzy_family)
        out = out.join(dup_ids, "doc_id", "left_anti")
    return out
