"""BM25 scoring math (Tantivy 0.21 semantics), pure numpy.

Formula (reference behavior, SURVEY.md §2.4; parameters k1=1.2, b=0.75
per BASELINE.json):

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    norm(d)     = k1 * (1 - b + b * |d| / avgdl)
    score(d, q) = sum_t idf(t) * (k1 + 1) * tf / (tf + norm(d))

where |d| is the u8-quantized fieldnorm (fieldnorm.quantize_len) and
avgdl = total_num_tokens / total_num_docs on RAW token counts — exactly
how the reference derives them from injected global Statistics
(/root/reference/src/search/implements/api_myscale/bm25_inner_search.rs:36-58,
api_get_total_num_tokens.rs:9-36).

All functions are vectorized over candidate arrays so they can run inside
Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import math

import numpy as np

K1_DEFAULT = 1.2
B_DEFAULT = 0.75


def idf(df: np.ndarray | float, n_docs: float) -> np.ndarray:
    """Tantivy/Lucene BM25 idf: ln(1 + (N - df + 0.5)/(df + 0.5))."""
    df = np.asarray(df, dtype=np.float64)
    return np.log1p((n_docs - df + 0.5) / (df + 0.5))


def doc_norm(
    quantized_len: np.ndarray,
    avgdl: float,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> np.ndarray:
    """k1 * (1 - b + b * |d|/avgdl); |d| must already be quantized."""
    dl = np.asarray(quantized_len, dtype=np.float64)
    if avgdl <= 0:
        avgdl = 1.0
    return k1 * (1.0 - b + b * dl / avgdl)


def term_score(
    tf: np.ndarray,
    idf_t: np.ndarray | float,
    norm_d: np.ndarray,
    k1: float = K1_DEFAULT,
) -> np.ndarray:
    """Per-(doc, term) BM25 contribution."""
    tf = np.asarray(tf, dtype=np.float64)
    return np.asarray(idf_t, dtype=np.float64) * (k1 + 1.0) * tf / (tf + norm_d)


def max_term_score(idf_t: float, max_tf: float, min_norm: float, k1: float = K1_DEFAULT) -> float:
    """Upper bound of a term's contribution for a posting block — the
    block-max metadata used for WAND pruning.  tf/(tf+c) is increasing in
    tf and decreasing in c, so (max_tf, min_norm) bounds the block."""
    if max_tf <= 0:
        return 0.0
    return idf_t * (k1 + 1.0) * max_tf / (max_tf + min_norm)


def score_to_3dp(x: float) -> float:
    """Golden comparisons in the reference assert equality to 3 decimals."""
    return math.floor(x * 1000 + 0.5) / 1000.0
