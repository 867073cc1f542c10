"""Similarity search over an embedding column (array<float>).

* brute_force_topk — exact cosine top-k per query (broadcast the query
  set; one pass over the corpus; TakeOrdered per query).  The baseline
  and the verification tier.
* lsh_buckets / lsh_topk — random-hyperplane LSH: deterministic
  pseudo-random hyperplanes from a seeded hash, bucket join instead of
  cross join — the 100 TB path (probes only matching buckets).
* ivf_topk — IVF-style: k-means-lite centroids via deterministic
  sampling, probe the n_probe nearest cells only.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window, functions as F


def _dvec(col):
    """float32 arrays -> double before any arithmetic: keeps results
    bit-comparable across engines (DuckDB oracle does the same cast)."""
    return F.transform(col, lambda x: x.cast("double"))


def _with_norm(df: DataFrame, id_col: str, vec_col: str, prefix: str):
    dv = _dvec(F.col(vec_col))
    return df.select(
        F.col(id_col).alias(f"{prefix}_id"),
        dv.alias(f"{prefix}_v"),
        F.sqrt(
            F.aggregate(dv, F.lit(0.0), lambda a, x: a + x * x)
        ).alias(f"{prefix}_nrm"),
    )


def _cosine(av, bv, an, bn):
    dot = F.aggregate(F.zip_with(av, bv, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    return dot / (an * bn)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank) — exact top-k.

    The query side is broadcast (small dim table); the corpus is scanned
    once; per-query ranking is a window over (query_id) which AQE keeps
    shuffle-light because the joined candidate set is |Q| * |corpus|
    partition-local rows."""
    c = _with_norm(corpus, id_col, vec_col, "n")
    q = _with_norm(queries, query_id_col, vec_col, "q")
    sims = (
        c.join(F.broadcast(q), F.col("n_id") != F.col("q_id"))
        .select(
            F.col("q_id").alias("query_id"),
            F.col("n_id").alias("neighbor_id"),
            F.round(
                _cosine(F.col("q_v"), F.col("n_v"),
                        F.col("q_nrm"), F.col("n_nrm")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


#: fixed-point scale for the md5 hash family: floor(x * 1e6) keeps
#: every dot product an exact integer in float64 (|sum| < 2^53), so
#: bucket bits match an ANSI-SQL replica bit-for-bit
_QSCALE = 1e6


def _md5_signs(dim: int, n_planes: int, n_tables: int,
               seed: int) -> np.ndarray:
    """(n_tables*n_planes, dim) Rademacher (+-1) hyperplanes derived
    from md5(seed:t:p:d) parity — the same 60-bit-md5-prefix family the
    minhash oracle uses, reproducible in DuckDB SQL."""
    import hashlib

    s = np.empty((n_tables * n_planes, dim), dtype=np.float64)
    for t in range(n_tables):
        for p in range(n_planes):
            for d in range(dim):
                h = hashlib.md5(
                    f"{seed}:{t}:{p}:{d}".encode()).hexdigest()
                s[t * n_planes + p, d] = \
                    1.0 if int(h[:15], 16) & 1 else -1.0
    return s


def lsh_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 42,
    dim: int = 64,
    carry_vector: bool = True,
    family: str = "md5",
) -> DataFrame:
    """Multi-table sign-random-projection buckets (one GEMM per Arrow
    batch — hyperplanes ship in the closure).

    ``family="md5"`` (default): Rademacher hyperplanes from md5 parity
    over fixed-point (floor(x*1e6)) components — every bucket bit is
    exact integer arithmetic, reproducible in the DuckDB oracle.
    ``family="gaussian"``: seeded-numpy gaussian hyperplanes on raw
    doubles (the classic SRP family; not SQL-replicable).

    Output: one row per (vector, table) with the table's bucket id.  At
    scale the corpus side is written partitioned by (table, bucket) so a
    query probes exactly n_tables files.  ``carry_vector=False`` emits
    only (vec_id, table, bucket): the big corpus side of an ANN join
    should shuffle ids, not n_tables copies of every embedding."""
    import pandas as pd
    from collections.abc import Iterator

    if family == "md5":
        planes = _md5_signs(dim, n_planes, n_tables, seed)
    else:
        planes = _hyperplanes(dim, n_planes * n_tables, seed)  # (T*P, d)
    quantize = family == "md5"
    weights = (2 ** np.arange(n_planes, dtype=np.int64))

    def buckets(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one GEMM per Arrow batch replaces n_tables*n_planes interpreted
        # higher-order-function dot products per row (~50x on 64-dim)
        for pdf in it:
            n = len(pdf)
            if not n:
                continue
            E = np.array(pdf[vec_col].to_list(), dtype=np.float64)
            if quantize:
                E = np.floor(E * _QSCALE)
            S = (E @ planes.T) > 0  # (n, T*P)
            B = (S.reshape(n, n_tables, n_planes)
                 * weights).sum(axis=2)  # (n, T)
            rep = np.repeat(np.arange(n), n_tables)
            out = {
                "vec_id": pdf[id_col].to_numpy()[rep],
                "table": np.tile(np.arange(n_tables, dtype=np.int32), n),
                "bucket": B.reshape(-1),
            }
            if carry_vector:
                out["embedding"] = pdf[vec_col].to_numpy()[rep]
            yield pd.DataFrame(out)

    src = df.select(F.col(id_col).alias(id_col),
                    _dvec(F.col(vec_col)).alias(vec_col))
    schema = "vec_id long, table int, bucket long"
    if carry_vector:
        schema += ", embedding array<double>"
    return src.mapInPandas(buckets, schema)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 42,
    dim: int = 64,
    family: str = "md5",
) -> DataFrame:
    """ANN top-k: candidates collide with the query in at least one of
    n_tables hash tables; candidates are scored exactly and ranked.
    With the default md5 hash family the whole pipeline (buckets ->
    candidates -> exact rerank) is deterministically replicable in the
    DuckDB oracle.

    Shuffle shape for 100 TB: the corpus side of the bucket join carries
    ONLY (vec_id, table, bucket) — n_tables x 20 bytes per vector, not
    n_tables x the embedding; candidate (query, neighbor) id pairs are
    deduped across tables FIRST, and corpus embeddings join in exactly
    once for scoring.  The query side (small) is broadcast with its
    vectors.  No cross join anywhere — the join key is (table, bucket).
    """
    corpus = corpus.withColumn("embedding", _dvec(F.col("embedding")))
    queries = queries.withColumn("embedding", _dvec(F.col("embedding")))
    cb = lsh_buckets(corpus, n_planes=n_planes, n_tables=n_tables,
                     seed=seed, dim=dim, carry_vector=False,
                     family=family)
    qb = lsh_buckets(queries, n_planes=n_planes, n_tables=n_tables,
                     seed=seed, dim=dim, carry_vector=False,
                     family=family)
    cand_ids = (
        cb.select(F.col("vec_id").alias("neighbor_id"), "table", "bucket")
        .join(F.broadcast(qb.select(F.col("vec_id").alias("query_id"),
                                    "table", "bucket")),
              ["table", "bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    c = _with_norm(corpus, "vec_id", "embedding", "n") \
        .withColumnRenamed("n_id", "neighbor_id")
    q = _with_norm(queries, "vec_id", "embedding", "q") \
        .withColumnRenamed("q_id", "query_id")
    cand = (
        cand_ids.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id", "neighbor_id",
            F.round(_cosine(F.col("q_v"), F.col("n_v"),
                            F.col("q_nrm"), F.col("n_nrm")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return cand.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF-lite ANN: centroids = seeded hash-ordered corpus sample; every
    vector is assigned to its nearest centroid (one shuffle, keyed by
    cell); queries probe the n_probe nearest cells.

    Centroid sampling orders by md5(seed:vec_id) — deterministic (same
    seed -> same centroids), content-independent (so recall doesn't
    collapse when vec_ids correlate with content), and reproducible in
    ANSI SQL so the whole operator has a DuckDB oracle.  Cell
    assignment runs on fixed-point components (floor(x*1e6)): every
    squared distance is an exact integer in float64, so the
    argmin-with-cell-asc-ties matches the oracle exactly; the final
    cosine rerank uses the raw doubles."""
    corpus = corpus.withColumn("embedding", _dvec(F.col("embedding")))
    queries = queries.withColumn("embedding", _dvec(F.col("embedding")))
    cents = [
        (i, r["embedding"])
        for i, r in enumerate(
            corpus.orderBy(
                F.md5(F.concat_ws(
                    ":", F.lit(str(seed)),
                    F.col("vec_id").cast("string"))),
                F.col("vec_id")).limit(n_cells).collect()
        )
    ]

    import pandas as pd
    from collections.abc import Iterator

    C = np.floor(np.array([c for _, c in cents],
                          dtype=np.float64) * _QSCALE)  # (m, dim)
    c_sq = (C * C).sum(axis=1)

    def assign(id_out: str, vec_out: str, nrm_out: str, probes: int):
        # nearest-centroid via one GEMM per Arrow batch:
        # argmin ||v-c||^2 = ordering on (c.c - 2 v.c); ties broken by
        # cell index asc, matching the previous array_sort((d, cell))
        def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                n = len(pdf)
                if not n:
                    continue
                E = np.array(pdf["embedding"].to_list(), dtype=np.float64)
                Q = np.floor(E * _QSCALE)
                D = c_sq[None, :] - 2.0 * (Q @ C.T)  # (n, m) + const(v)
                order = np.argsort(D, axis=1, kind="stable")[:, :probes]
                nrm = np.sqrt((E * E).sum(axis=1))
                rep = np.repeat(np.arange(n), probes)
                yield pd.DataFrame({
                    id_out: pdf["vec_id"].to_numpy()[rep],
                    vec_out: pdf["embedding"].to_numpy()[rep],
                    nrm_out: nrm[rep],
                    "cell": order.reshape(-1).astype(np.int32),
                })
        return fn

    c = corpus.select("vec_id", "embedding").mapInPandas(
        assign("neighbor_id", "n_v", "n_nrm", 1),
        "neighbor_id long, n_v array<double>, n_nrm double, cell int")
    q = queries.select("vec_id", "embedding").mapInPandas(
        assign("query_id", "q_v", "q_nrm", n_probe),
        "query_id long, q_v array<double>, q_nrm double, cell int")
    cand = (
        c.join(q, "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                F.round(_cosine(F.col("q_v"), F.col("n_v"),
                                F.col("q_nrm"), F.col("n_nrm")), 6)
                .alias("cosine"))
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return cand.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
