"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Schema matches BASELINE.json input_hint exactly:
    repo: string, path: string, commit: string, lang: string, content: string

Generation is fully distributed (mapInPandas over spark.range) and
row-deterministic: every field derives from the row id via stateless
integer mixing, so the corpus is identical regardless of partitioning,
parallelism, or generation order — the property the resumability and
scaling harnesses rely on.  The token pool is heavy in "if"/"return"/
"def"/"for" to exercise hot-term skew handling, sizes 10..2000 tokens.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

# weighted pool: repetition count = relative frequency (hot code terms
# dominate, like real code corpora)
_POOL_SPEC = [
    ("if", 120), ("return", 80), ("def", 60), ("for", 60), ("self", 55),
    ("import", 40), ("in", 90), ("the", 50), ("None", 35), ("else", 30),
    ("class", 25), ("while", 15), ("try", 12), ("except", 12),
    ("lambda", 8), ("yield", 6), ("assert", 10), ("raise", 9),
    ("print", 14), ("len", 18), ("range", 16), ("data", 22), ("value", 20),
    ("result", 18), ("index", 14), ("key", 16), ("node", 10), ("count", 12),
    ("buffer", 7), ("stream", 8), ("parse", 9), ("token", 11), ("hash", 9),
    ("merge", 7), ("split", 8), ("append", 13), ("update", 10), ("config", 8),
    ("error", 11), ("state", 9), ("next", 10), ("init", 7), ("args", 12),
    ("kwargs", 8), ("path", 10), ("file", 11), ("line", 9), ("char", 5),
    ("byte", 5), ("width", 4), ("height", 4), ("offset", 6), ("limit", 6),
    ("query", 7), ("field", 7), ("score", 6), ("sort", 6), ("filter", 7),
    ("reduce", 4), ("map", 8), ("zip", 4), ("enumerate", 5), ("isinstance", 5),
    ("True", 20), ("False", 18), ("not", 25), ("and", 30), ("or", 24),
]
_POOL = np.array(
    [w for w, n in _POOL_SPEC for _ in range(n)], dtype=object)
_LANGS = np.array(["py", "java", "rs", "go", "cpp", "js"], dtype=object)

_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xBF58476D1CE4E5B9)


def _mix(x: np.ndarray) -> np.ndarray:
    """splitmix64-style stateless mixer (vectorized, deterministic)."""
    x = (x + _MIX1).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x *= _MIX2
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _gen_batch(ids: np.ndarray, seed: int,
               ident_frac: float = 0.0, ident_vocab: int = 200_000,
               min_tokens: int = 10, max_tokens: int = 2000,
               ) -> pd.DataFrame:
    s = np.uint64(seed)
    h = _mix(ids.astype(np.uint64) ^ s)
    n_tokens = (min_tokens + (h % np.uint64(
        max_tokens - min_tokens + 1))).astype(np.int64)
    pool_n = np.uint64(_POOL.shape[0])

    offsets = np.concatenate(([0], np.cumsum(n_tokens)))
    total = int(offsets[-1])
    # token index = mix(id * 2^20 + position) — stateless, order-free
    row_rep = np.repeat(ids.astype(np.uint64), n_tokens)
    pos = (np.arange(total, dtype=np.uint64)
           - np.repeat(offsets[:-1].astype(np.uint64), n_tokens))
    th = _mix((row_rep << np.uint64(20)) ^ pos ^ s)
    tok_idx = (th % pool_n).astype(np.int64)
    words = _POOL[tok_idx]
    if ident_frac > 0.0:
        # realistic code vocabulary: hot keywords + a zipf-ish long tail
        # of identifiers (vNNN..).  Zipf via squaring a uniform draw —
        # low ids occur far more often, giving every selectivity tier.
        th2 = _mix(th ^ np.uint64(0xC0FFEE))
        is_ident = (th2 % np.uint64(1000)) < np.uint64(int(ident_frac * 1000))
        u = ((th2 >> np.uint64(10)) % np.uint64(1_000_003)).astype(
            np.float64) / 1_000_003.0
        ident_id = (u * u * ident_vocab).astype(np.int64)
        idents = np.char.add("v", ident_id.astype(str)).astype(object)
        words = np.where(is_ident, idents, words)

    contents = []
    for i in range(ids.shape[0]):
        contents.append(" ".join(words[offsets[i]:offsets[i + 1]]))

    lang = _LANGS[(h % np.uint64(len(_LANGS))).astype(np.int64)]
    repo = np.char.add(
        np.char.add("org", ((h >> np.uint64(8)) % np.uint64(97)).astype(str)),
        np.char.add("/repo", ((h >> np.uint64(16)) % np.uint64(331)).astype(str)),
    )
    path = np.array(
        [f"src/m{int(x % 13)}/f{int(i)}.{l}"
         for x, i, l in zip(h >> np.uint64(24), ids, lang)], dtype=object)
    commit = np.array(
        [hashlib.sha1(f"{seed}:{int(i)}".encode()).hexdigest()
         for i in ids], dtype=object)
    return pd.DataFrame(
        {"repo": repo.astype(object), "path": path, "commit": commit,
         "lang": lang, "content": contents})


def synth_code_corpus(
    spark: SparkSession, n_files: int, seed: int = 42,
    num_partitions: int | None = None,
    ident_frac: float = 0.0, ident_vocab: int = 200_000,
    min_tokens: int = 10, max_tokens: int = 2000,
    with_doc_id: bool = False,
) -> DataFrame:
    """Distributed deterministic corpus of `n_files` source files.

    ``ident_frac`` > 0 mixes in a zipf-distributed identifier tail
    (``ident_vocab`` distinct tokens) alongside the hot keyword pool —
    the realistic code-corpus shape where WAND/skip-index selectivity
    matters; 0 keeps the original all-hot vocabulary (the adversarial
    skew case the merge sharding is sized for).

    ``min_tokens``/``max_tokens`` bound the uniform per-doc length
    draw; (10, 200) approximates the reference benchmark's wiki_560w
    abstract corpus (short docs) for doc-count-normalized comparisons."""
    parts = num_partitions or spark.sparkContext.defaultParallelism

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            out = _gen_batch(ids, seed, ident_frac, ident_vocab,
                             min_tokens, max_tokens)
            if with_doc_id:
                out.insert(0, "doc_id", ids)
            yield out

    schema = "repo string, path string, commit string, lang string, content string"
    if with_doc_id:
        # the range id doubles as a pre-assigned doc_id: spark.range
        # partitions are contiguous non-overlapping ascending ranges, so
        # the result satisfies IndexBuilder's zero-shuffle 'stream'
        # contract directly (id_col="doc_id", no staging sort) — this
        # is how a real ingest with upstream-stable ids would run at
        # 100 TB, and it lets huge synthetic builds skip the corpus
        # materialization entirely
        schema = "doc_id long, " + schema
    return spark.range(0, n_files, 1, parts).mapInPandas(gen, schema)
