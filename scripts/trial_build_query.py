"""One scaling trial: build the index over the synthetic code corpus and
run the BM25 query batch, printing a JSON line of timings.

Launched via spark-submit --py-files (north_rule requirement):
  spark-submit --master local[N] --py-files /tmp/tss_pkg.zip \
      scripts/trial_build_query.py <corpus_parquet> <index_path> <n_queries>
"""

from __future__ import annotations

import json
import shutil
import statistics
import sys
import time


def main() -> None:
    corpus_path, index_path, n_queries = (
        sys.argv[1], sys.argv[2], int(sys.argv[3]))

    from pyspark.sql import SparkSession

    from tantivy_search_spark.config import IndexConfig
    from tantivy_search_spark.index.builder import IndexBuilder
    from tantivy_search_spark.search.engine import SearchIndex

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    corpus = spark.read.parquet(corpus_path)
    n_docs = corpus.count()

    shutil.rmtree(index_path, ignore_errors=True)
    cfg = IndexConfig.from_json(["content"], "{}")
    cfg.parts_per_shard = 8
    t0 = time.time()
    IndexBuilder(
        spark, index_path, cfg,
        rows_per_part=max(n_docs // (cores * 3), 512),
    ).build(corpus, order_cols=["repo", "path", "commit"])
    build_secs = time.time() - t0

    ix = SearchIndex(spark, index_path)
    ix.enable_stats_cache()
    sentences = [
        "def return if",
        "lambda yield buffer stream",
        "parse token hash merge",
        "class init self args",
        "error state update config",
        "index key value result",
    ]
    # latency: sequential p50 (fixed per-job overhead dominates at small
    # corpus; does not scale with cores by construction)
    lats = []
    for i in range(min(n_queries, 12)):
        s = sentences[i % len(sentences)]
        tq = time.time()
        ix.bm25_search(s, top_k=10, operator_or=(i % 2 == 0),
                       use_wand=True).collect()
        lats.append(time.time() - tq)

    # throughput: concurrent clients (Spark FAIR-ish scheduling across
    # jobs) — the quantity that scales with executor count
    from concurrent.futures import ThreadPoolExecutor

    def one(i: int) -> None:
        s = sentences[i % len(sentences)]
        ix.bm25_search(s, top_k=10, operator_or=(i % 2 == 0),
                       use_wand=True).collect()

    t0 = time.time()
    with ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(one, range(n_queries)))
    query_secs = time.time() - t0

    print(json.dumps({
        "cores": cores,
        "n_docs": n_docs,
        "build_secs": round(build_secs, 3),
        "build_docs_per_sec": round(n_docs / build_secs, 1),
        "n_queries": n_queries,
        "query_secs": round(query_secs, 3),
        "qps": round(n_queries / query_secs, 2),
        "bm25_p50_ms": round(statistics.median(lats) * 1000, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
