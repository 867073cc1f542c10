"""Corpus curation: the composed training-data pipeline.

One declarative plan chaining the pipeline operators a 100 TB
pre-training run needs — exact dedup (keep-first), quality floor,
language allowlist — so Catalyst fuses the stages: one scan of the
corpus feeds all three, the dedup groupBy is the only wide shuffle,
and the quality/language predicates evaluate in codegen next to it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tantivy_search_spark.pipeline.dedup import exact_dedup
from tantivy_search_spark.pipeline.text import lang_id_markers, quality_score


def curate_corpus(
    df: DataFrame,
    text_col: str = "text",
    min_quality: float = 0.3,
    languages: tuple[str, ...] = ("en",),
) -> DataFrame:
    """Surviving docs with their curation features.

    Keep a doc iff it is the canonical copy of its content group
    (keep-first exact dedup), its quality score clears ``min_quality``,
    and its marker-based language id is in ``languages``.
    Returns (doc_id, quality, pred_lang, group_size).
    """
    dedup = exact_dedup(df, text_col).select(
        "doc_id", "is_duplicate", "group_size")
    quality = quality_score(df, text_col).select("doc_id", "quality")
    lang = lang_id_markers(df, text_col).select("doc_id", "pred_lang")
    return (
        dedup.where(~F.col("is_duplicate"))
        .join(quality, "doc_id")
        .join(lang, "doc_id")
        .where((F.col("quality") >= min_quality)
               & F.col("pred_lang").isin(list(languages)))
        .select("doc_id", "quality", "pred_lang", "group_size")
    )
