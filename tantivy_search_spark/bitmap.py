"""u8 row-id bitmap codec + ClickHouse LIKE -> regex conversion.

Semantics-matched (byte-level goldens in tests/test_bitmap.py) to
/root/reference/src/search/utils/convert_utils.rs:
* bitmaps are LSB-first byte bitsets keyed by row_id (bit ``row_id % 8``
  of byte ``row_id // 8``), sized to the max row_id;
* LIKE conversion: ``%`` -> ``.*``, ``_`` -> ``.``, backslash escapes
  ``\\%``/``\\_``/``\\\\``, and regex-special chars are quoted.

Implemented fresh in numpy (vectorized) — used at the API edge only;
inside the engine row-id sets stay DataFrames.
"""

from __future__ import annotations

import numpy as np

_REGEX_SPECIAL = set(".+*?^$()[]{}|")


def like_to_regex(like_pattern: str) -> str:
    """ClickHouse LIKE pattern -> regex (full behavioral parity)."""
    out: list[str] = []
    escape = False
    for c in like_pattern:
        if c == "\\" and not escape:
            escape = True
        elif c == "\\" and escape:
            out.append("\\\\")
            escape = False
        elif c == "%" and not escape:
            out.append(".*")
        elif c == "_" and not escape:
            out.append(".")
        elif c in ("%", "_") and escape:
            out.append(c)
            escape = False
        else:
            if c in _REGEX_SPECIAL:
                out.append("\\")
            out.append(c)
            escape = False
    return "".join(out)


def row_ids_to_u8_bitmap(row_ids) -> bytes:
    """Sorted-or-not row id iterable -> LSB-first byte bitset.

    Packs via a byte-per-bit scatter + ``np.packbits`` rather than
    ``np.bitwise_or.at`` (ufunc.at is an unbuffered scalar loop, ~10x
    slower on multi-million-id hot terms); duplicate ids are naturally
    idempotent, so callers need not unique/sort first."""
    arr = (row_ids if isinstance(row_ids, np.ndarray)
           else np.asarray(list(row_ids), dtype=np.int64))
    if arr.size == 0:
        return b""
    n_bytes = int(arr.max()) // 8 + 1
    bits = np.zeros(n_bytes * 8, dtype=np.uint8)
    bits[arr] = 1
    return np.packbits(bits, bitorder="little").tobytes()


def u8_bitmap_to_row_ids(bitmap: bytes | bytearray | np.ndarray) -> np.ndarray:
    """LSB-first byte bitset -> sorted row id array."""
    arr = np.frombuffer(bytes(bitmap), dtype=np.uint8)
    if arr.size == 0:
        return np.empty(0, dtype=np.int64)
    bits = np.unpackbits(arr, bitorder="little")
    return np.nonzero(bits)[0].astype(np.int64)


def is_row_id_exist(row_id: int, bitmap: bytes) -> bool:
    idx = row_id // 8
    if idx >= len(bitmap):
        return False
    return bool(bitmap[idx] & (1 << (row_id % 8)))


def bitmap_range_any(bitmap: bytes | bytearray | np.ndarray,
                     lrange: int, rrange: int) -> bool:
    """Any set bit with ``lrange <= row_id <= rrange`` (both inclusive)?

    The granule-intersect primitive behind the ``*_with_range`` APIs
    (reference ``ffi_query_term_with_range`` et al., exercised in
    tests/unit_test/FunctionalFFI.cpp:80-109): ClickHouse calls the
    exists check once per skip-index granule against one cached query
    bitmap, so this touches only the ``(rrange-lrange)/8 + 2`` bytes
    the granule spans.  Inverted/empty ranges are False, negative
    ``lrange`` clamps to 0, past-the-end ranges are False
    (BoundaryIndexSearch.cpp:92-108 semantics)."""
    if rrange < lrange or rrange < 0:
        return False
    lo = max(int(lrange), 0)
    hi = int(rrange)
    n_bits = len(bitmap) * 8
    if n_bits == 0 or lo >= n_bits:
        return False
    hi = min(hi, n_bits - 1)
    b0, b1 = lo // 8, hi // 8
    chunk = np.frombuffer(bytes(bitmap[b0:b1 + 1]), dtype=np.uint8).copy()
    chunk[0] &= (0xFF << (lo % 8)) & 0xFF
    chunk[-1] &= 0xFF >> (7 - hi % 8)
    return bool(chunk.any())


def bitmap_granule_hits(bitmap: bytes | bytearray | np.ndarray,
                        step: int, total_rows: int) -> np.ndarray:
    """Vectorized skip-index sweep: one bool per granule ``g`` with the
    closed row window ``[g*step, g*step + step]``.

    Mirrors the reference benchmark's granule loop
    (benchmark/SkipIndexBenchmark.h:52-59: ``addRangeClosed(row_id,
    row_id + index_granularity)`` — the upper bound is INCLUSIVE, so
    adjacent granules overlap by one row).  Granules start at every
    ``g*step < total_rows``.  For 8-divisible steps this is a single
    reshape + ``any`` over the packed bytes plus a boundary-bit OR; a
    non-divisible step falls back to per-granule ``bitmap_range_any``.
    """
    if step <= 0:
        raise ValueError(f"step must be positive, got {step}")
    n_gran = max((total_rows + step - 1) // step, 0)
    if n_gran == 0:
        return np.zeros(0, dtype=bool)
    if step % 8 != 0:
        return np.fromiter(
            (bitmap_range_any(bitmap, g * step, g * step + step)
             for g in range(n_gran)), dtype=bool, count=n_gran)
    arr = np.frombuffer(bytes(bitmap), dtype=np.uint8)
    byte_step = step // 8
    padded = np.zeros(n_gran * byte_step, dtype=np.uint8)
    n = min(arr.size, padded.size)
    padded[:n] = arr[:n]
    hits = padded.reshape(n_gran, byte_step).any(axis=1)
    # closed upper bound: row (g+1)*step is bit 0 of the next granule's
    # first byte
    nxt = np.arange(1, n_gran + 1) * byte_step
    in_range = nxt < arr.size
    hits[in_range] |= (arr[nxt[in_range]] & 1).astype(bool)
    return hits


def mask_for_row_ids(row_ids: np.ndarray, bitmap: bytes) -> np.ndarray:
    """Vectorized alive-bitmap membership test for an int64 row-id array."""
    if len(bitmap) == 0:
        return np.zeros(row_ids.shape, dtype=bool)
    bm = np.frombuffer(bitmap, dtype=np.uint8)
    idx = row_ids // 8
    in_range = idx < bm.size
    out = np.zeros(row_ids.shape, dtype=bool)
    safe = np.where(in_range, idx, 0)
    out[in_range] = (bm[safe[in_range]] >> (row_ids[in_range] % 8).astype(np.uint8)) & 1 == 1
    return out
