"""Physical-plan audit: assert the optimizer properties the engine's
scale story depends on, and print the formatted plans for the record.

Checks (exit non-zero on failure):
1. Candidate postings scan: bucket partition pruning reaches the file
   listing (PartitionFilters) and the term predicate reaches the parquet
   row-group reader (PushedFilters).
2. Candidate scan prunes columns: ReadSchema contains only the posting
   columns the decoder needs, never the whole table.
3. Single-query top-k plans as TakeOrderedAndProject (no global sort).
4. Bitmap query reads only block_first/deltas (tfs/norms pruned).
5. Build's per-doc sha/docs projection stays inside WholeStageCodegen.

Usage: python scripts/explain_audit.py [index_path]
(defaults to the sf0.01 driver-contract index, building it if absent)
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "mimalloc")


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    if len(sys.argv) > 1:
        index_path = sys.argv[1]
        from tantivy_search_spark.search.engine import SearchIndex
        ix = SearchIndex(spark, index_path)
    else:
        import __spark_entry__ as entry
        ix = entry._index(spark, "/root/testdata/sf0.01")

    failures = []

    def check(name: str, ok: bool, detail: str = ""):
        print(f"{'PASS' if ok else 'FAIL'} {name}" + (f": {detail}" if detail else ""))
        if not ok:
            failures.append(name)

    col = ix.config.columns[0]
    tokens = ["spark", "join", "order", "window"]

    # 1+2: candidate scan pruning
    cand = ix._candidate_postings([(col, t) for t in tokens])
    p = plan_of(cand)
    check("bucket partition pruning",
          bool(re.search(r"PartitionFilters: \[[^\]]*bucket", p)))
    check("term predicate pushdown",
          bool(re.search(r"PushedFilters: \[[^\]]*[Ii]n\(term", p)))
    m = re.search(r"ReadSchema: ([^\n]*)", p)
    rs = m.group(1) if m else ""
    check("column pruning on postings scan",
          "term" in rs and "block_first" in rs)

    # 3: top-k plans as TakeOrderedAndProject
    q = ix.bm25_search("spark join order", top_k=10, operator_or=True)
    p3 = plan_of(q)
    check("top-k via TakeOrderedAndProject", "TakeOrderedAndProject" in p3)

    # 4: bitmap path reads only doc-id columns
    b = ix.query_term_bitmap_df(col, "spark")
    p4 = plan_of(b)
    m4 = re.search(r"ReadSchema: ([^\n]*)", p4)
    rs4 = m4.group(1) if m4 else ""
    check("bitmap scan prunes tfs/norms",
          "deltas" in rs4 and "tfs" not in rs4 and "norms" not in rs4,
          rs4[:120])

    # 4b: exact scoring scan prunes positions/block-max metadata (the
    # projection must land BEFORE mapInPandas — Spark can't prune
    # through a pandas UDF)
    m3 = re.search(r"ReadSchema: ([^\n]*)", p3)
    rs3 = m3.group(1) if m3 else ""
    check("bm25 scan prunes positions/block-max",
          "deltas" in rs3 and "positions" not in rs3
          and "block_max_tf" not in rs3, rs3[:120])

    # 4c: per-query stats lookup prunes stats partitions by bucket
    p4c = plan_of(ix._stats_lookup_df(["spark", "join"]))
    check("stats lookup bucket pruning",
          bool(re.search(r"PartitionFilters: \[[^\]]*bucket", p4c)))

    # 5: docs/sha projection codegen
    from pyspark.sql import functions as F
    docs = ix.docs.select("doc_id", F.sha2(F.coalesce(
        F.col(f"sha256_{col}"), F.lit("")), 256))
    p5 = plan_of(docs)
    check("docs projection in WholeStageCodegen",
          "WholeStageCodegen" in p5 or "codegen id" in p5)

    # 6: fused LSH per-doc stage = ONE wide shuffle (signature mins +
    # verification shingle set from a single groupBy over the one
    # mapInPandas shingle pass)
    from tantivy_search_spark.pipeline import dedup
    docs_tbl = spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet").select("doc_id", "text")
    rows = dedup.shingle_rows(docs_tbl, "text", 3)
    hash_cols = [F.xxhash64(F.lit(i), F.col("shingle")).alias(f"mh{i}")
                 for i in range(8)]
    per_doc = (rows.select("doc_id", "shingle", *hash_cols)
               .groupBy("doc_id")
               .agg(F.collect_list("shingle").alias("shingles"),
                    *[F.min(f"mh{i}").alias(f"mh{i}") for i in range(8)]))
    def tree_of(df) -> str:
        # simple mode prints the physical tree once (formatted mode
        # repeats node names in detail blocks and inlines cached child
        # plans under InMemoryTableScan, inflating counts)
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple")

    p6 = tree_of(per_doc)
    check("LSH per-doc stage single shuffle",
          p6.count("Exchange") == 1 and p6.count("MapInPandas") == 1,
          f"exchanges={p6.count('Exchange')} "
          f"python_stages={p6.count('MapInPandas')}")

    # 6b: the pair-generation plan runs entirely off the materialized
    # per-doc cache — no Python stage may reappear downstream
    pairs = dedup.minhash_lsh_pairs(docs_tbl, w=3, n_perm=8, bands=2,
                                    threshold=0.2, family="xxhash")
    # every reference to the per-doc frame (banding self-join x2,
    # verification shingle joins x2) and to members must resolve to an
    # InMemoryTableScan — cache substitution happened, so the Python
    # shingle pass executes only inside the already-run materialization
    # (explain inlines cached CHILD plans under every InMemoryRelation,
    # so a textual "no MapInPandas" check is impossible; single
    # execution of the Python stage is additionally pinned by the
    # _materialize contract and the LSH timing evidence in BENCH)
    p6b = tree_of(pairs)
    n_scans = p6b.count("InMemoryTableScan")
    check("LSH pair join reads caches",
          n_scans >= 5, f"InMemoryTableScan x{n_scans}")
    dedup.unpersist_cached()

    print("\n==== candidate scan plan ====\n" + p + "\n")
    print("==== top-k plan (tail) ====\n" + p3[:2000] + "\n")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
