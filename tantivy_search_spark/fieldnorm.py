"""Tantivy-compatible u8 fieldnorm (doc-length) quantization.

Tantivy stores one byte per (doc, field) and decodes through a fixed
256-entry table (Lucene SmallFloat ``byte4`` scheme: identity for values
< 40, then a 4-values-per-octave exponential ramp).  BM25's per-doc length
|d| is the *quantized* length, so score-identical output requires the same
table (reference: forked tantivy ``src/fieldnorm/code.rs``; consumed via
BM25 weights — see /root/reference/src/search/implements/api_myscale/
bm25_inner_search.rs and SURVEY.md §4.3).

The table below is generated, not copied: identity 0..=39, then groups of
4 entries whose step doubles every group — the standard Lucene/Tantivy
byte4 small-float code.  Goldens in tests/test_bm25_goldens.py (scores to
7 significant digits) pin the identity region; the exponential region is
pinned by test_fieldnorm.py structural checks.
"""

from __future__ import annotations

import numpy as np

_IDENTITY = 40  # values 0..39 encode exactly
_GROUP = 4  # 4 mantissa steps per octave


def _build_table() -> np.ndarray:
    table = np.zeros(256, dtype=np.int64)
    table[:_IDENTITY] = np.arange(_IDENTITY)
    val = _IDENTITY
    step = 2
    i = _IDENTITY
    while i < 256:
        for _ in range(_GROUP):
            if i >= 256:
                break
            table[i] = val
            val += step
            i += 1
        step *= 2
    return table


#: FIELD_NORMS_TABLE[id] -> decoded doc length (u32 in the reference)
FIELD_NORMS_TABLE: np.ndarray = _build_table()


def fieldnorm_to_id(fieldnorm: np.ndarray | int) -> np.ndarray:
    """Vectorized encode: largest table id whose value <= fieldnorm.

    Mirrors tantivy's ``binary_search(..).unwrap_or_else(|idx| idx - 1)``.
    """
    arr = np.asarray(fieldnorm, dtype=np.int64)
    ids = np.searchsorted(FIELD_NORMS_TABLE, arr, side="right") - 1
    return np.clip(ids, 0, 255).astype(np.uint8)


def id_to_fieldnorm(ids: np.ndarray | int) -> np.ndarray:
    """Vectorized decode: table lookup."""
    return FIELD_NORMS_TABLE[np.asarray(ids, dtype=np.int64)]


def quantize_len(doclen: np.ndarray | int) -> np.ndarray:
    """Round-trip a raw token count through the u8 codec (|d| used by BM25)."""
    return id_to_fieldnorm(fieldnorm_to_id(doclen))
