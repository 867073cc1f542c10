"""Query-only scaling trial over a PREBUILT index: isolates where the
batch-query path spends time at a given parallelism.

Reports, for the same 1000-query workload as trial_build_query.py:
  prep_secs  — driver-side work to construct the batch DataFrame
               (query parsing, atom assembly, stats lookup, plan build)
  job_secs   — .collect() of the warmed batch (executor work + scheduler)
run twice post-warm so run-to-run variance is visible.

Launched via spark-submit --py-files like the build trials:
  spark-submit --master local[N] --py-files /tmp/tss_pkg.zip \
      scripts/query_trial.py <index_path> <n_queries>
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    index_path, n_queries = sys.argv[1], int(sys.argv[2])

    from pyspark.sql import SparkSession

    from tantivy_search_spark.search.engine import SearchIndex

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

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

    ix.bm25_search_batch(batch, top_k=10).collect()  # warm

    runs = []
    for _ in range(2):
        t0 = time.time()
        df = ix.bm25_search_batch(batch, top_k=10)
        prep = time.time() - t0
        t0 = time.time()
        n = len(df.collect())
        job = time.time() - t0
        runs.append({"prep_secs": round(prep, 3),
                     "job_secs": round(job, 3),
                     "rows": n})

    total = runs[-1]["prep_secs"] + runs[-1]["job_secs"]
    print(json.dumps({
        "cores": cores,
        "n_queries": n_queries,
        "runs": runs,
        "qps_last": round(n_queries / total, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
