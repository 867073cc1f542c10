"""One scaling trial: build the index over the synthetic code corpus and
run the BM25 query batch, printing a JSON line of timings.

Launched via spark-submit --py-files (north_rule requirement):
  spark-submit --master local[N] --py-files /tmp/tss_pkg.zip \
      scripts/trial_build_query.py <corpus_parquet> <index_path> <n_queries>

The work shape (rows_per_part, shuffle partitions, corpus) is IDENTICAL
across parallelism levels — only the executor-thread count differs — so
the comparison isolates scaling, exactly as the same job on an N- vs
4N-executor cluster would.
"""

from __future__ import annotations

import json
import shutil
import statistics
import sys
import time

ROWS_PER_PART = 4096  # constant across trials: identical task DAG


def main() -> None:
    corpus_path, index_path, n_queries = (
        sys.argv[1], sys.argv[2], int(sys.argv[3]))
    mode = sys.argv[4] if len(sys.argv) > 4 else "sorted"
    position = mode in ("position", "view", "viewlite")
    view = mode in ("view", "viewlite")  # position ids + zero-copy docs
    defer_sha = mode == "viewlite"       # ...and no audit sidecar either

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
    builder = IndexBuilder(spark, index_path, cfg, rows_per_part=ROWS_PER_PART)
    if position:
        meta = builder.build(corpus, position_ids=True,
                             docs_mode="view" if view else "copy",
                             docs_sha="defer" if defer_sha else "sidecar")
    else:
        meta = builder.build(corpus, order_cols=["repo", "path", "commit"])
    build_secs = time.time() - t0
    stage_secs = {
        name: round(st.get("secs", 0.0), 3)
        for name, st in meta.build_metrics["stages"].items()
    }

    ix = SearchIndex(spark, index_path)
    ix.enable_stats_cache()
    sentences = [
        "def return if",
        "lambda yield buffer stream",
        "parse token hash merge",
        "class init self args",
        "error state update config",
        "index key value result",
        "while try except raise",
        "append update split filter",
        "query field score sort",
        "data value result index",
    ]
    import random
    rng = random.Random(7)
    pool = sorted({w for s in sentences for w in s.split()})
    batch = [(sentences[i % len(sentences)], i % 2 == 0)
             for i in range(min(n_queries, 12))]
    batch += [(" ".join(rng.sample(pool, rng.randint(2, 5))),
               rng.random() < 0.5)
              for _ in range(n_queries - len(batch))]

    # latency: sequential p50 (fixed per-job driver overhead dominates at
    # small corpus; not the scaling quantity)
    lats = []
    for i in range(min(n_queries, 12)):
        s, op_or = batch[i]
        tq = time.time()
        ix.bm25_search(s, top_k=10, operator_or=op_or,
                       use_wand=True).collect()
        lats.append(time.time() - tq)

    # throughput: the whole workload as ONE Spark job (bm25_search_batch)
    # — the cluster-scale query path; this is what scales with executors
    ix.bm25_search_batch(batch, top_k=10).collect()  # warm (plan/code cache)
    t0 = time.time()
    ix.bm25_search_batch(batch, top_k=10).collect()
    query_secs = time.time() - t0

    print(json.dumps({
        "cores": cores,
        "mode": mode,
        "n_docs": n_docs,
        "build_secs": round(build_secs, 3),
        "build_stage_secs": stage_secs,
        "build_docs_per_sec": round(n_docs / build_secs, 1),
        "n_queries": n_queries,
        "query_secs": round(query_secs, 3),
        "qps": round(n_queries / query_secs, 2),
        "bm25_p50_ms": round(statistics.median(lats) * 1000, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
