"""Deduplication operators for training-data pipelines.

All hash functions are md5-derived 60-bit integers computed with
BUILT-IN Spark expressions (F.md5 / F.conv) — fully JVM/codegen, no
Python in any hot path, and bit-for-bit reproducible in ANSI SQL
(DuckDB oracle parity).

Operators:
* exact_dedup           — hash-groupBy on normalized content
* shingles              — w-word shingle arrays (basis for jaccard/minhash)
* ngram_jaccard_pairs   — pairwise Jaccard over shingle sets via
                          explode + self-join + count/union algebra
* minhash_signatures    — n_perm md5-salted minhashes per doc
* minhash_lsh_pairs     — banded LSH candidate pairs verified by true
                          Jaccard (the scale path: candidates only, no
                          full cross join)
* simhash_signatures    — 60-bit weighted simhash per doc
* simhash_pairs         — near-dup pairs within a Hamming radius using
                          chunk-blocking (pigeonhole) + bit_count verify
* connected_components  — pairs -> transitive duplicate clusters
                          (alternating large-star/small-star, O(log n)
                          shuffle rounds)
* dedup_assign          — per-document (cluster_id, is_duplicate)
                          verdict; filter ~is_duplicate for the
                          deduplicated corpus
* embedding_lsh_pairs   — embedding near-dup pairs via sign-LSH bucket
                          self-join + exact cosine verify (the scale
                          tier; embedding_cosine_pairs is the O(n^2)
                          verification tier)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

# 60-bit md5 prefix as a bigint: deterministic, portable to ANSI SQL as
#   CAST(CONCAT('0x', SUBSTR(MD5(x), 1, 15)) AS BIGINT)  (DuckDB)
def _h60(col):
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


#: DataFrames persisted by operators in this module; bounded to one
#: call's worth — each new persisting call swaps the previous set out
_PERSISTED: list = []


def _track_persist(df: DataFrame) -> DataFrame:
    _PERSISTED.append(df)
    return df


def _swap_persisted_pool() -> None:
    """Unpersist the previous call's cached frames (their lazy results,
    if still held, just recompute) so long-lived sessions don't leak
    executor storage one persist() per dedup call."""
    while _PERSISTED:
        try:
            _PERSISTED.pop().unpersist(blocking=False)
        except Exception:
            pass


def unpersist_cached() -> None:
    """Release every DataFrame this module still has persisted."""
    _swap_persisted_pool()


def _materialize(df: DataFrame) -> DataFrame:
    """persist + eager count: a frame consumed by several joins of ONE
    downstream action must be materialized BEFORE the action, or AQE's
    concurrently-launched broadcast-build jobs each race past the
    still-empty cache and recompute the whole subtree — for frames whose
    lineage contains a Python (mapInPandas) stage that multiplies the
    expensive pass AND explodes the python-worker pool (each concurrent
    stage demands its own workers; a fresh worker pays the ~2 s
    pandas/pyarrow import).  Measured on the sf0.1 bench corpus: the LSH
    candidate plan with lazy persists ran the shingle pass 4x
    (18-24 s cold); materialized it runs once (see BENCH notes).  The
    count is one cheap extra job; at cluster scale this is the standard
    checkpoint-the-fanout pattern for reused index artifacts."""
    df = _track_persist(df.persist())
    df.count()
    return df


def _norm_text(text_col: str):
    return F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per doc: content group id, canonical doc, dup flag (keep-first)."""
    withg = df.select(
        "doc_id", F.md5(_norm_text(text_col)).alias("content_md5")
    )
    groups = withg.groupBy("content_md5").agg(
        F.min("doc_id").alias("canonical_doc_id"),
        F.count("*").alias("group_size"),
    )
    return (
        withg.join(groups, "content_md5")
        .select(
            "doc_id",
            "content_md5",
            "canonical_doc_id",
            "group_size",
            (F.col("doc_id") != F.col("canonical_doc_id")).alias("is_duplicate"),
        )
    )


def shingle_rows(df: DataFrame, text_col: str = "text", w: int = 3) -> DataFrame:
    """Distinct (doc_id, shingle) rows, computed in Arrow C++ kernels.

    Semantics: lowercase, split on whitespace runs, drop empties; a
    w-token sliding window per doc ("a b c"-style space-joined); docs
    with fewer than w tokens contribute their whole (possibly empty)
    token string as one shingle — identical to the previous Spark
    higher-order-function formulation, which evaluated interpreted and
    cost ~40 us per shingle.  Here split/take/join/dictionary-encode all
    run on contiguous buffers (same design as udfs.term_doc_tf_arrow);
    the flat (doc_id, shingle) shape also skips the explode the
    consumers (minhash, jaccard) all did anyway.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    from collections.abc import Iterator

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            if not n:
                continue
            arr = pa.Array.from_pandas(pdf[text_col], type=pa.string())
            if arr.null_count:
                arr = pc.fill_null(arr, "")
            lists = pc.split_pattern_regex(pc.utf8_lower(arr), r"\s+")
            counts0 = np.asarray(pc.list_value_length(lists), dtype=np.int64)
            flat = pc.list_flatten(lists)
            keep = pc.not_equal(pc.binary_length(flat), 0)
            keep_np = np.asarray(keep, dtype=bool)
            doc_all = np.repeat(np.arange(n, dtype=np.int64), counts0)
            doc_idx = doc_all[keep_np]
            toks = pc.filter(flat, keep)
            counts = np.bincount(doc_idx, minlength=n).astype(np.int64)
            offsets = np.concatenate(([0], np.cumsum(counts)))
            total = int(offsets[-1])
            pos = np.arange(total, dtype=np.int64) - np.repeat(
                offsets[:-1], counts)
            fits = pos <= np.repeat(counts, counts) - w
            starts = np.flatnonzero(fits)
            parts = [pc.take(toks, pa.array(starts + k, type=pa.int64()))
                     for k in range(w)]
            sh = pc.binary_join_element_wise(*parts, " ")
            sh_doc = np.repeat(np.arange(n, dtype=np.int64),
                               np.maximum(counts - w + 1, 0))
            # distinct per doc, integer-only after dictionary encoding
            if len(sh):
                d = sh.dictionary_encode()
                codes = np.asarray(d.indices, dtype=np.int64)
                uniq = np.asarray(d.dictionary, dtype=object)
                uk = np.unique(codes * n + sh_doc)
                out_doc = uk % n
                out_sh = uniq[uk // n]
            else:
                out_doc = np.empty(0, dtype=np.int64)
                out_sh = np.empty(0, dtype=object)
            # short docs: single whole-text shingle (exact legacy semantics)
            short = np.flatnonzero(counts < w)
            if short.size:
                toks_np = np.asarray(toks, dtype=object)
                extra = [" ".join(toks_np[offsets[d]:offsets[d + 1]])
                         for d in short]
                out_doc = np.concatenate([out_doc, short])
                out_sh = np.concatenate(
                    [out_sh, np.asarray(extra, dtype=object)])
            ids = pdf["doc_id"].to_numpy()
            yield pd.DataFrame({"doc_id": ids[out_doc], "shingle": out_sh})

    return df.select("doc_id", text_col).mapInPandas(
        batches, "doc_id long, shingle string")


def shingles(df: DataFrame, text_col: str = "text", w: int = 3) -> DataFrame:
    """doc_id + array of distinct w-word shingles."""
    return shingle_rows(df, text_col, w).groupBy("doc_id").agg(
        F.collect_list("shingle").alias("shingles"))


#: default document-frequency cap for shingles entering the jaccard
#: self-join: a shingle shared by > this many docs (license headers,
#: boilerplate) contributes ~df^2 join rows and near-zero similarity
#: information, so it is dropped from BOTH the intersection and the
#: per-doc set sizes (consistent filtered-set semantics, mirrored in
#: the DuckDB oracle).  At the default, one adversarial hot shingle is
#: bounded to 25M join rows instead of |corpus|^2.
DEFAULT_MAX_SHINGLE_DF = 5_000


def hot_shingles(df: DataFrame, text_col: str = "text", w: int = 3,
                 max_df: int = DEFAULT_MAX_SHINGLE_DF) -> DataFrame:
    """The shingles a given cap would drop, with their df — run this to
    audit what ngram_jaccard_pairs excludes (no silent truncation)."""
    return (shingle_rows(df, text_col, w)
            .groupBy("shingle").agg(F.count("*").alias("df"))
            .where(F.col("df") > max_df))


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str = "text", w: int = 3, threshold: float = 0.5,
    max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF,
) -> DataFrame:
    """(a, b, jaccard) for all pairs with Jaccard >= threshold.

    Scale path: explode shingles -> self-join on shingle (co-occurrence
    counting) -> |A ∩ B| / (|A| + |B| - |A ∩ B|).  Shuffle is bounded by
    sum over shingles of df^2; shingles with df > ``max_shingle_df``
    are dropped before the join (see DEFAULT_MAX_SHINGLE_DF — audit the
    dropped set with :func:`hot_shingles`).  ``max_shingle_df=None``
    disables the cap (exact semantics, adversarial-skew-unsafe).
    """
    ex = shingle_rows(df, text_col, w)
    if max_shingle_df is not None:
        sdf = ex.groupBy("shingle").agg(F.count("*").alias("_df"))
        # anti-join keeps the plan broadcast-friendly: the hot set is by
        # definition tiny (few shingles can exceed the cap)
        ex = ex.join(
            sdf.where(F.col("_df") > max_shingle_df).select("shingle"),
            "shingle", "left_anti")
    sizes = ex.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        ex.alias("x")
        .join(ex.alias("y"), "shingle")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "a")
                   .withColumnRenamed("n", "na"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b")
              .withColumnRenamed("n", "nb"), "b")
        .select(
            "a", "b",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
            .alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", w: int = 3, n_perm: int = 16,
    family: str = "md5", shingle_df: DataFrame | None = None,
) -> DataFrame:
    """doc_id + minhash signature array (length n_perm).

    ``family="md5"``: permutation i = min over shingles of
    H60(i || ':' || shingle) — the salted-hash formulation;
    deterministic and expressible in plain SQL (the DuckDB oracle
    computes the identical md5), at the cost of n_perm md5s per shingle.
    ``family="xxhash"``: xxhash64(i, shingle) — ~10x cheaper per hash,
    the 100 TB production path; same banding math, no SQL oracle (no
    cross-engine xxhash64), so correctness rides on the md5 family's
    oracle plus the shared plumbing.

    ``shingle_df``: optional precomputed (doc_id, shingle) rows — lets
    callers that also need the verification shingle sets run the
    mapInPandas shingle pass ONCE (see _lsh_rep_pairs).
    """
    ex = shingle_df if shingle_df is not None else shingle_rows(
        df, text_col, w)
    # flat projection of n_perm hash columns keeps the hash work inside
    # whole-stage codegen (a nested transform/array_min formulation falls
    # back to interpreted evaluation — ~40x slower measured)
    if family == "xxhash":
        hash_cols = [F.xxhash64(F.lit(i), F.col("shingle")).alias(f"mh{i}")
                     for i in range(n_perm)]
    else:
        hash_cols = [
            _h60(F.concat(F.lit(str(i)), F.lit(":"), F.col("shingle")))
            .alias(f"mh{i}")
            for i in range(n_perm)
        ]
    hashed = ex.select("doc_id", *hash_cols)
    agg = hashed.groupBy("doc_id").agg(
        *[F.min(f"mh{i}").alias(f"mh{i}") for i in range(n_perm)])
    return agg.select(
        "doc_id",
        F.array(*[F.col(f"mh{i}") for i in range(n_perm)]).alias("minhash"),
    )


#: default cap on exact-content groups per LSH band bucket.  With exact
#: duplicates collapsed to one representative each, a bucket bigger than
#: this means > max distinct contents hash-agreeing on a whole band — a
#: giant templated near-dup family whose in-bucket self-join would emit
#: ~n^2 candidate rows.  Dropped buckets are auditable via
#: :func:`hot_band_buckets` (no silent truncation), mirroring the
#: hot-shingle cap of ngram_jaccard_pairs.
DEFAULT_MAX_BAND_BUCKET = 10_000


def _exact_members(df: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, rep): every doc mapped to the minimum doc_id of its
    exact-content group (md5 of whitespace/case-normalized text — the
    same key exact_dedup groups on)."""
    keyed = df.select(
        "doc_id", F.md5(_norm_text(text_col)).alias("_cmd5"))
    reps = keyed.groupBy("_cmd5").agg(F.min("doc_id").alias("rep"))
    return keyed.join(reps, "_cmd5").select("doc_id", "rep")


def _band_rows(sigs: DataFrame, n_perm: int, bands: int,
               max_band_bucket: int | None) -> DataFrame:
    """(doc_id, band, band_hash) rows from a signature frame, persisted
    + eagerly materialized (it feeds both sides of the candidate
    self-join AND the hot-bucket scan — see _materialize), with over-cap
    buckets dropped."""
    r = n_perm // bands
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.md5(F.array_join(F.slice(F.col("minhash"), b * r + 1, r),
                                       ",")).alias("band_hash"),
                ),
            )
        ).alias("bh"),
    ).select("doc_id", "bh.band", "bh.band_hash")
    banded = _materialize(banded)
    if max_band_bucket is not None:
        hot = (banded.groupBy("band", "band_hash")
               .agg(F.count("*").alias("_n"))
               .where(F.col("_n") > max_band_bucket)
               .select("band", "band_hash"))
        banded = banded.join(hot, ["band", "band_hash"], "left_anti")
    return banded


def _banded_sigs(src: DataFrame, text_col: str, w: int, n_perm: int,
                 bands: int, family: str,
                 max_band_bucket: int | None) -> DataFrame:
    """(doc_id, band, band_hash) rows computed from scratch (one-shot
    callers like hot_band_buckets; _lsh_rep_pairs builds its bands from
    the shared shingle pass instead)."""
    sigs = minhash_signatures(src, text_col, w, n_perm, family=family)
    return _band_rows(sigs, n_perm, bands, max_band_bucket)


def _lsh_rep_pairs(src: DataFrame, text_col: str, w: int, n_perm: int,
                   bands: int, threshold: float, family: str,
                   max_band_bucket: int | None) -> DataFrame:
    """Verified (a, b, jaccard) pairs over ``src`` (one doc per distinct
    content when the caller pre-collapsed exact groups).

    One Python stage, one shuffle, one materialization: the mapInPandas
    shingle pass feeds a single groupBy(doc_id) that computes BOTH the
    minhash signature (min over per-shingle hashes, flat codegen'd
    columns) AND the verification shingle set (collect_list over the
    already per-doc-distinct rows).  That per-doc frame is persisted +
    eagerly counted (see _materialize), then banding, the candidate
    self-join, and jaccard verification are all pure JVM plans over the
    cache — no second aggregation, no re-run of the Python pass."""
    rows = shingle_rows(src, text_col, w)
    if family == "xxhash":
        hash_cols = [F.xxhash64(F.lit(i), F.col("shingle")).alias(f"mh{i}")
                     for i in range(n_perm)]
    else:
        hash_cols = [
            _h60(F.concat(F.lit(str(i)), F.lit(":"), F.col("shingle")))
            .alias(f"mh{i}")
            for i in range(n_perm)
        ]
    per_doc = _materialize(
        rows.select("doc_id", "shingle", *hash_cols)
        .groupBy("doc_id")
        .agg(F.collect_list("shingle").alias("shingles"),
             *[F.min(f"mh{i}").alias(f"mh{i}") for i in range(n_perm)])
    )
    r = n_perm // bands
    banded = per_doc.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.md5(F.concat_ws(
                        ",", *[F.col(f"mh{b * r + j}").cast("string")
                               for j in range(r)])).alias("band_hash"),
                )
                for b in range(bands)
            ])
        ).alias("bh"),
    ).select("doc_id", "bh.band", "bh.band_hash")
    if max_band_bucket is not None:
        hot = (banded.groupBy("band", "band_hash")
               .agg(F.count("*").alias("_n"))
               .where(F.col("_n") > max_band_bucket)
               .select("band", "band_hash"))
        banded = banded.join(hot, ["band", "band_hash"], "left_anti")
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "band_hash"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .distinct()
    )
    sh = per_doc.select("doc_id", "shingles")
    return (
        cand.join(sh.withColumnRenamed("doc_id", "a")
                  .withColumnRenamed("shingles", "sa"), "a")
        .join(sh.withColumnRenamed("doc_id", "b")
              .withColumnRenamed("shingles", "sb"), "b")
        .select(
            "a", "b",
            (
                F.size(F.array_intersect("sa", "sb"))
                / F.size(F.array_union("sa", "sb"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def hot_band_buckets(
    df: DataFrame, text_col: str = "text", w: int = 3, n_perm: int = 16,
    bands: int = 4, family: str = "md5",
    max_band_bucket: int = DEFAULT_MAX_BAND_BUCKET,
) -> DataFrame:
    """The (band, band_hash, n) buckets a given cap would drop from
    minhash_lsh_pairs' candidate join — audit before raising the cap.
    ``n`` counts exact-content representatives (the banding input)."""
    _swap_persisted_pool()
    members = _exact_members(df.select("doc_id", text_col), text_col)
    src = df.select("doc_id", text_col).join(
        members.where(F.col("doc_id") == F.col("rep")).select("doc_id"),
        "doc_id")
    banded = _banded_sigs(src, text_col, w, n_perm, bands, family, None)
    return (banded.groupBy("band", "band_hash")
            .agg(F.count("*").alias("n"))
            .where(F.col("n") > max_band_bucket))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    w: int = 3,
    n_perm: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    family: str = "md5",
    max_band_bucket: int | None = DEFAULT_MAX_BAND_BUCKET,
    collapse_exact: bool = True,
    expansion: str = "star",
) -> DataFrame:
    """Banded-LSH candidate generation + exact Jaccard verification.

    rows_per_band = n_perm / bands; a pair becomes a candidate if any
    band of the signature matches exactly (join on (band, band_hash) —
    no cross join anywhere), then candidates are verified with true
    shingle Jaccard >= threshold.

    ``collapse_exact`` (default): exact-content groups are collapsed to
    one representative BEFORE signature banding.  Identical docs have
    identical signatures, so without this every band bucket holds the
    whole duplicate cluster and the self-join plus two shingle-array
    verification joins process m(m-1)/2 candidate rows per m-member
    cluster — quadratic *intermediate* work at 100 TB (boilerplate
    clusters run 10^6 docs).  Collapsed, the expensive stages are
    linear in distinct contents.

    ``expansion`` controls how exact-group membership re-enters the
    PAIR OUTPUT (collapse_exact only):

    * ``'star'`` (default): linear, connectivity-equivalent output —
      rep-level near-dup pairs as-is (reps are real doc ids), plus one
      (rep, member, 1.0) edge per non-rep member.  Connected
      components / dedup_assign / any clustering consumer get exactly
      the same clusters as the full pair set, in O(members + rep
      pairs) rows.  This is the 100 TB-safe default: the full
      expansion materializes m(m-1)/2 rows per m-member exact cluster
      (a 10^6-member boilerplate cluster alone is ~5*10^11 rows).
    * ``'full'``: every member-level pair, the literal all-pairs
      surface — members of one exact group pair at jaccard 1.0
      exactly, and a member-pair across two groups has the
      representatives' jaccard (identical normalized text => identical
      shingle sets).  Only for consumers that need the exhaustive pair
      list at bounded cluster sizes.

    ``max_band_bucket`` caps distinct contents per band bucket (see
    DEFAULT_MAX_BAND_BUCKET; audit drops with :func:`hot_band_buckets`,
    disable with None).
    """
    assert n_perm % bands == 0
    if expansion not in ("star", "full"):
        raise ValueError(
            f"expansion must be 'star' or 'full', got {expansion!r}")
    _swap_persisted_pool()
    base = df.select("doc_id", text_col)
    if not collapse_exact:
        return _lsh_rep_pairs(base, text_col, w, n_perm, bands, threshold,
                              family, max_band_bucket)
    # members feeds the rep filter plus several downstream joins; its
    # lineage is pure JVM (md5 + groupBy), so a lazy persist suffices —
    # _lsh_rep_pairs' per_doc materialization is the first action and
    # populates the cache, later joins reuse it (eager counts are
    # reserved for Python-lineage frames, see _materialize)
    members = _track_persist(_exact_members(base, text_col).persist())
    src = base.join(
        members.where(F.col("doc_id") == F.col("rep")).select("doc_id"),
        "doc_id")
    rep_pairs = _lsh_rep_pairs(src, text_col, w, n_perm, bands, threshold,
                               family, max_band_bucket)
    if expansion == "star":
        if threshold <= 1.0:
            # rep = min(group) so rep < member: a < b holds by
            # construction on the star edges
            within = (members.where(F.col("doc_id") != F.col("rep"))
                      .select(F.col("rep").alias("a"),
                              F.col("doc_id").alias("b"),
                              F.lit(1.0).alias("jaccard")))
            return rep_pairs.unionByName(within)
        return rep_pairs
    ma = members.select(F.col("rep").alias("a"), F.col("doc_id").alias("_da"))
    mb = members.select(F.col("rep").alias("b"), F.col("doc_id").alias("_db"))
    cross = (rep_pairs.join(ma, "a").join(mb, "b")
             .select(F.least("_da", "_db").alias("a"),
                     F.greatest("_da", "_db").alias("b"), "jaccard"))
    if threshold <= 1.0:
        within = (members.alias("x").join(members.alias("y"), "rep")
                  .where(F.col("x.doc_id") < F.col("y.doc_id"))
                  .select(F.col("x.doc_id").alias("a"),
                          F.col("y.doc_id").alias("b"),
                          F.lit(1.0).alias("jaccard")))
        cross = cross.unionByName(within)
    return cross


def simhash_signatures(
    df: DataFrame, text_col: str = "text", bits: int = 60
) -> DataFrame:
    """60-bit tf-weighted simhash per doc, pure JVM expressions.

    bit k set iff sum over distinct terms of tf * (+1 if bit k of
    H60(term) else -1) > 0.
    """
    toks = F.filter(F.split(_norm_text(text_col), " "),
                    lambda t: F.length(t) > 0)
    tf = df.select(
        "doc_id", F.explode(toks).alias("term")
    ).groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    h = tf.withColumn("h", _h60(F.col("term")))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), k).bitwiseAND(F.lit(1)) == 1,
                   F.col("tf")).otherwise(-F.col("tf"))
        ).alias(f"bit{k}")
        for k in range(bits)
    ]
    agg = h.groupBy("doc_id").agg(*bit_sums)
    sig = agg.select(
        "doc_id",
        sum(
            (F.when(F.col(f"bit{k}") > 0, F.lit(1)).otherwise(F.lit(0))
             .cast("long") * F.lit(2 ** k).cast("long"))
            for k in range(bits)
        ).alias("simhash"),
    )
    return sig


def simhash_pairs(
    df: DataFrame, text_col: str = "text", bits: int = 60,
    max_hamming: int = 3, chunks: int = 4,
    max_bucket: int | None = None,
    collapse_exact: bool = True,
    expansion: str = "star",
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming.

    Pigeonhole blocking: split the signature into `chunks` pieces; any
    pair within radius < chunks shares at least one exact chunk, so the
    join is on (chunk_idx, chunk_value) — never a cross join.

    ``max_bucket``: optional cap on docs per (chunk, value) bucket —
    the in-bucket self-join is quadratic in bucket size, so a hot chunk
    value (all-zeros signatures from boilerplate) can dominate the
    shuffle at corpus scale.  Dropped buckets mean missed pairs: audit
    with a groupBy count before raising, same contract as
    DEFAULT_MAX_BAND_BUCKET / hot_band_buckets on the MinHash path.
    Default None keeps exact pigeonhole semantics (mirrored by the SQL
    oracle).

    ``collapse_exact`` (default): same duplicate-cluster linearization
    as :func:`minhash_lsh_pairs` — simhash derives from the identical
    ``_norm_text`` normalization, so exact-content groups share one
    signature; collapsing them to a representative before the chunk
    self-join keeps the expensive stages linear in distinct contents.

    ``expansion``: same contract as :func:`minhash_lsh_pairs` —
    ``'star'`` (default) emits rep-level pairs plus one (rep, member,
    hamming 0) edge per non-rep member (connectivity-equivalent,
    linear output); ``'full'`` re-expands every member-level pair
    (within-group pairs at hamming 0, cross-group member pairs at the
    representatives' hamming — row-identical to the uncollapsed
    join)."""
    if expansion not in ("star", "full"):
        raise ValueError(
            f"expansion must be 'star' or 'full', got {expansion!r}")
    if collapse_exact:
        base = df.select("doc_id", text_col)
        _swap_persisted_pool()
        members = _track_persist(_exact_members(base, text_col).persist())
        src = base.join(
            members.where(F.col("doc_id") == F.col("rep")).select("doc_id"),
            "doc_id")
        rep_pairs = simhash_pairs(src, text_col, bits, max_hamming,
                                  chunks, max_bucket, collapse_exact=False)
        if expansion == "star":
            within = (members.where(F.col("doc_id") != F.col("rep"))
                      .select(F.col("rep").alias("a"),
                              F.col("doc_id").alias("b"),
                              F.lit(0).cast("int").alias("hamming")))
            return rep_pairs.unionByName(within)
        ma = members.select(F.col("rep").alias("a"),
                            F.col("doc_id").alias("_da"))
        mb = members.select(F.col("rep").alias("b"),
                            F.col("doc_id").alias("_db"))
        cross = (rep_pairs.join(ma, "a").join(mb, "b")
                 .select(F.least("_da", "_db").alias("a"),
                         F.greatest("_da", "_db").alias("b"), "hamming"))
        within = (members.alias("x").join(members.alias("y"), "rep")
                  .where(F.col("x.doc_id") < F.col("y.doc_id"))
                  .select(F.col("x.doc_id").alias("a"),
                          F.col("y.doc_id").alias("b"),
                          F.lit(0).cast("int").alias("hamming")))
        return cross.unionByName(within)
    sig = simhash_signatures(df, text_col, bits)
    step = bits // chunks
    mask = (1 << step) - 1
    pieces = sig.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("chunk"),
                F.shiftright(F.col("simhash"), i * step)
                .bitwiseAND(F.lit(mask)).alias("val"),
            )
            for i in range(chunks)
        ])).alias("p"),
    ).select("doc_id", "simhash", "p.chunk", "p.val")
    if max_bucket is not None:
        hot = (pieces.groupBy("chunk", "val")
               .agg(F.count("*").alias("_n"))
               .where(F.col("_n") > max_bucket).select("chunk", "val"))
        pieces = pieces.join(hot, ["chunk", "val"], "left_anti")
    return (
        pieces.alias("x")
        .join(pieces.alias("y"), ["chunk", "val"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"),
            F.bit_count(
                F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def connected_components(
    pairs: DataFrame, a: str = "a", b: str = "b", max_iter: int = 50,
) -> DataFrame:
    """(doc_id, component_id) for every node that appears in ``pairs``;
    component_id = the smallest doc_id in the node's connected component.

    This is the missing last stage of fuzzy dedup: the pair generators
    (minhash_lsh_pairs / simhash_pairs / ngram_jaccard_pairs) emit
    *edges*, but a pipeline needs *clusters* — transitively, if A~B and
    B~C then A,B,C are one duplicate group even when A~C was never a
    candidate pair.

    Algorithm: alternating large-star / small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) — the
    standard shuffle-native CC formulation.  Each round is two
    groupBy-min shuffles over the current edge set; the edge set only
    shrinks toward stars, and convergence takes O(log^2 n) rounds
    (2 rounds for typical near-dup clusters, which are cliques or
    near-cliques already).  No driver-side iteration over data: the
    driver sees one (count, checksum) pair per round.  Lineage is
    truncated every round with an eager localCheckpoint (on a real
    cluster prefer sc.setCheckpointDir + .checkpoint() for
    executor-loss resilience; the algorithm is identical).
    """
    spark = pairs.sparkSession
    edges = (
        pairs.select(F.col(a).cast("long").alias("u"),
                     F.col(b).cast("long").alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if edges.isEmpty():
        return spark.createDataFrame([], "doc_id long, component_id long")

    for _ in range(max_iter):
        if _is_star(edges):
            break
        # large-star: every neighbor v > u links to min(Gamma(u) + {u})
        sym = edges.union(edges.select(F.col("v").alias("u"),
                                       F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m"))
        ls = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.least("v", "m").alias("u"),
                    F.greatest("v", "m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: orient edges high -> low; every low neighbor (and
        # the high node itself) links to the minimum low neighbor
        directed = ls.select(F.col("v").alias("hi"), F.col("u").alias("lo"))
        smins = directed.groupBy("hi").agg(F.min("lo").alias("m"))
        j = directed.join(smins, "hi")
        ss = (
            j.where(F.col("lo") != F.col("m"))
            .select(F.col("m").alias("u"), F.col("lo").alias("v"))
            .union(j.select(F.col("m").alias("u"), F.col("hi").alias("v")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        prev, edges = edges, ss
        prev.unpersist(blocking=False)
    else:
        if not _is_star(edges):
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} "
                "large/small-star rounds")
    # converged edge set is a union of stars (u = component min); every
    # node appears either as a member (v side) or as a root (u side)
    labels = (
        edges.select(F.col("v").alias("doc_id"), F.col("u").alias("cid"))
        .union(edges.select(F.col("u").alias("doc_id"),
                            F.col("u").alias("cid")))
        .groupBy("doc_id")
        .agg(F.min("cid").alias("component_id"))
    )
    return labels


def _is_star(edges: DataFrame) -> bool:
    """True when the (u<v canonical) edge set is a disjoint union of
    stars rooted at each component's minimum: every high endpoint
    appears in exactly one edge and never as a low endpoint (otherwise
    a chain like 1-2, 2-3 or an inverted star like 1-3, 2-3 remains
    and another large/small-star round is needed)."""
    bad = (
        edges.select(F.col("v").alias("n"))
        .groupBy("n").agg(F.count("*").alias("c")).where(F.col("c") > 1)
        .union(
            edges.alias("x")
            .join(edges.alias("y"), F.col("x.v") == F.col("y.u"), "inner")
            .select(F.col("x.v").alias("n"), F.lit(2).alias("c"))
        )
    )
    return bad.isEmpty()


def dedup_assign(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
    a: str = "a", b: str = "b",
) -> DataFrame:
    """Per-document dedup verdict from a candidate-pair set: (doc_id,
    cluster_id, is_duplicate) where cluster_id is the smallest doc_id of
    the document's transitive near-dup cluster (itself when unique) and
    the cluster's minimum is the canonical survivor.

    Equi-join of the corpus against the (small) component map; filter
    ``~is_duplicate`` to materialize the deduplicated corpus in the same
    Catalyst plan as downstream curation."""
    comp = connected_components(pairs, a=a, b=b)
    return (
        df.select(F.col(id_col).cast("long").alias("doc_id"))
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component_id", "doc_id").alias("cluster_id"),
            (F.coalesce("component_id", "doc_id") != F.col("doc_id"))
            .alias("is_duplicate"),
        )
    )


def fuzzy_duplicate_ids(
    df: DataFrame,
    text_col: str = "text",
    w: int = 3,
    n_perm: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    family: str = "md5",
    max_band_bucket: int | None = DEFAULT_MAX_BAND_BUCKET,
) -> DataFrame:
    """doc_ids that are NON-canonical members of a fuzzy-dup cluster —
    the scale path for curation, never materializing the expanded pair
    set.

    Clustering runs entirely at the exact-content-representative level:
    LSH pairs over representatives -> connected components over those
    (tiny) edges -> each doc joins its representative's component.  A
    doc is a duplicate iff it is not the minimum doc_id of its combined
    cluster (fuzzy component ∪ exact group).  Equivalent to
    connected_components(minhash_lsh_pairs(df)) over the expanded pairs
    — exact-group members are clique-connected at jaccard 1.0 there, and
    component minima coincide because each representative is already its
    group's minimum — but the work is linear in distinct contents
    instead of quadratic in duplicate-cluster size.
    """
    assert n_perm % bands == 0
    _swap_persisted_pool()
    base = df.select("doc_id", text_col)
    # members feeds the rep filter plus several downstream joins; its
    # lineage is pure JVM (md5 + groupBy), so a lazy persist suffices —
    # _lsh_rep_pairs' per_doc materialization is the first action and
    # populates the cache, later joins reuse it (eager counts are
    # reserved for Python-lineage frames, see _materialize)
    members = _track_persist(_exact_members(base, text_col).persist())
    src = base.join(
        members.where(F.col("doc_id") == F.col("rep")).select("doc_id"),
        "doc_id")
    rep_pairs = _lsh_rep_pairs(src, text_col, w, n_perm, bands, threshold,
                               family, max_band_bucket)
    comp = connected_components(rep_pairs)
    if threshold > 1.0:
        # no pair can verify, and within-group pairs (jaccard 1.0)
        # wouldn't clear the threshold either: nothing is a duplicate
        return members.select("doc_id").limit(0)
    clustered = (
        members.join(comp.withColumnRenamed("doc_id", "rep"), "rep", "left")
        .select("doc_id",
                F.coalesce("component_id", "rep").alias("cluster_id"))
    )
    return (clustered
            .where(F.col("doc_id") != F.col("cluster_id"))
            .select("doc_id"))


def embedding_lsh_pairs(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.95, n_planes: int = 8, n_tables: int = 8,
    seed: int = 42, dim: int = 64, family: str = "md5",
    max_bucket: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs at scale: sign-LSH bucketed candidates +
    exact cosine verification — the candidate tier that replaces
    embedding_cosine_pairs' O(n^2) join on full corpora.

    A near-dup pair (angle theta ~ 0) collides in one table unless a
    hyperplane separates the two vectors: per-table collision
    probability is (1 - theta/pi)^n_planes, and n_tables independent
    tables make a miss exponentially unlikely for tiny angles.  Same
    shuffle diet as minhash_lsh_pairs / similarity.lsh_topk: the bucket
    self-join carries (vec_id, table, bucket) only — never an embedding
    — and embeddings join in exactly once, after candidate dedup.  With
    the default md5 hyperplane family the whole operator (bucket bits ->
    candidates -> exact cosine) replays bit-for-bit in ANSI SQL.
    """
    from . import similarity

    b = similarity.lsh_buckets(
        emb, id_col=id_col, vec_col=vec_col, n_planes=n_planes,
        n_tables=n_tables, seed=seed, dim=dim, carry_vector=False,
        family=family)
    _swap_persisted_pool()
    b = _track_persist(b.persist())
    if max_bucket is not None:
        # same quadratic-bucket guard as simhash_pairs/minhash banding:
        # drop over-cap (table, bucket) groups before the self-join
        # (audited drops — a vector's near-dups in OTHER buckets/tables
        # still pair; default None keeps oracle-exact semantics)
        hot = (b.groupBy("table", "bucket")
               .agg(F.count("*").alias("_n"))
               .where(F.col("_n") > max_bucket).select("table", "bucket"))
        b = b.join(hot, ["table", "bucket"], "left_anti")
    cand = (
        b.alias("x").join(b.alias("y"), ["table", "bucket"])
        .where(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(F.col("x.vec_id").alias("a"), F.col("y.vec_id").alias("b"))
        .distinct()
    )
    dv = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    withn = emb.select(
        F.col(id_col).alias("vid"), dv.alias("v"),
        F.sqrt(F.aggregate(dv, F.lit(0.0),
                           lambda acc, x: acc + x * x)).alias("nrm"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    return (
        cand.join(withn.select(F.col("vid").alias("a"),
                               F.col("v").alias("va"),
                               F.col("nrm").alias("na")), "a")
        .join(withn.select(F.col("vid").alias("b"),
                           F.col("v").alias("vb"),
                           F.col("nrm").alias("nb")), "b")
        .select("a", "b", (dot / (F.col("na") * F.col("nb"))).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def embedding_cosine_pairs(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding near-dup pairs by cosine >= threshold (exact, O(n^2)
    comparisons — the verification tier; use similarity.lsh_buckets to
    generate candidates at scale)."""
    dv = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    withn = emb.select(
        F.col(id_col).alias("vid"), dv.alias("v"),
        F.sqrt(F.aggregate(dv, F.lit(0.0),
                           lambda a, x: a + x * x)).alias("nrm"),
    )
    a, b = withn.alias("a"), withn.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    return (
        a.join(b, F.col("a.vid") < F.col("b.vid"))
        .select(
            F.col("a.vid").alias("a"), F.col("b.vid").alias("b"),
            (dot / (F.col("a.nrm") * F.col("b.nrm"))).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
