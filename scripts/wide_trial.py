"""Wide-atom packed-batch trial on the realistic-vocabulary corpus.

The hot-pool scaling workload (scripts/query_trial.py) draws from a
34-word pool, so its batch plans are narrow (few dozen unique atoms).
Real query logs over a 200k-term corpus are wide: hundreds-to-thousands
of unique atoms per 500-query batch.  This trial measures that shape —
the case the sparse-W kernel (engine._flat_score_topk CSC walk) exists
for — and spot-checks batch results against the sequential exact path.

Reuses the pool_qps realistic-vocab index (480k files, ident_frac 0.35,
~200k distinct content terms) at /tmp/tss_pool_idx, building it first
if absent.

Usage:
  python scripts/wide_trial.py                 # orchestrate 8 + 32 cores
  python scripts/wide_trial.py child <cores>   # (internal, spark-submit)

Writes/updates the `wide_vocab_trial` entry in BENCH/scaling.json.
"""

from __future__ import annotations

import json
import os
import random
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

INDEX = os.environ.get("POOL_INDEX", "/tmp/tss_pool_idx")
N_QUERIES = int(os.environ.get("WIDE_N_QUERIES", "500"))
SPOT = 12

SUBMIT_CONFS = [
    "--driver-memory", "24g",
    "--conf", "spark.sql.shuffle.partitions=128",
    "--conf", "spark.sql.adaptive.enabled=true",
    "--conf", "spark.executorEnv.ARROW_DEFAULT_MEMORY_POOL=mimalloc",
    "--conf", "spark.executorEnv.OPENBLAS_NUM_THREADS=1",
    "--conf", "spark.executorEnv.OMP_NUM_THREADS=1",
    "--conf", "spark.ui.enabled=false",
]


def sample_wide_queries() -> list[tuple[str, bool]]:
    """500 mixed hot/mid/tail queries from the index's own term
    dictionary, seeded — 2-4 terms each, AND/OR mixed, drawing mostly
    from the mid/tail so the batch's unique-atom count is in the
    thousands (the wide shape)."""
    import duckdb

    tbl = duckdb.sql(
        f"SELECT term, df FROM parquet_scan('{INDEX}/stats/**/*.parquet',"
        f" hive_partitioning=1) WHERE col='content'"
        f" ORDER BY df DESC, term").df()  # ties broken: scan order varies
    terms = tbl["term"].tolist()
    hot = terms[:32]
    mid = terms[1000:6000]
    tail = [t for t in terms[20000:120000]]
    rng = random.Random(1234)
    out: list[tuple[str, bool]] = []
    for i in range(N_QUERIES):
        n = rng.randint(2, 4)
        words = [rng.choice(mid), rng.choice(tail)]
        while len(words) < n:
            pool = (hot, mid, tail)[rng.randint(0, 2)]
            words.append(rng.choice(pool))
        rng.shuffle(words)
        out.append((" ".join(words), i % 2 == 0))
    return out


def child(cores: int) -> None:
    from pyspark.sql import SparkSession

    from tantivy_search_spark.search.engine import SearchIndex

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ix = SearchIndex(spark, INDEX)
    ix.enable_stats_cache()
    batch = sample_wide_queries()
    uniq = len({w for s, _ in batch for w in s.split()})

    ix.bm25_search_batch(batch, top_k=10).collect()  # warm plan shapes
    runs = []
    for _ in range(2):
        t0 = time.time()
        rows = ix.bm25_search_batch(batch, top_k=10).collect()
        runs.append({"secs": round(time.time() - t0, 3), "rows": len(rows)})

    # spot-check SPOT random queries against the sequential exact path
    rng = random.Random(99)
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append((r.row_id, r.score))
    mismatches = 0
    for qid in rng.sample(range(len(batch)), SPOT):
        s, op_or = batch[qid]
        seq = [(r.row_id, r.score) for r in
               ix.bm25_search(s, top_k=10, operator_or=op_or).collect()]
        got = sorted(by_q.get(qid, []), key=lambda t: (-t[1], t[0]))
        if [x[0] for x in got] != [x[0] for x in seq]:
            mismatches += 1
    print(json.dumps({
        "cores": cores, "n_queries": len(batch), "unique_terms": uniq,
        "runs": runs, "qps_last": round(len(batch) / runs[-1]["secs"], 2),
        "spot_checked": SPOT, "spot_mismatches": mismatches,
    }))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child(int(sys.argv[2]))
        return
    import shutil as _sh

    import pool_qps
    pool_qps.build_index()

    from scaling import make_pkg_zip
    pkg = make_pkg_zip()
    exe = _sh.which("spark-submit")
    results = {}
    for cores in (8, 32):
        cmd = ([exe, "--master", f"local[{cores}]"] + SUBMIT_CONFS
               + ["--py-files", pkg, os.path.abspath(__file__),
                  "child", str(cores)])
        out = subprocess.run(cmd, capture_output=True, text=True)
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("{")][-1]
        results[cores] = json.loads(line)
        print(cores, line, flush=True)

    path = os.path.join(REPO, "BENCH", "scaling.json")
    with open(path) as f:
        data = json.load(f)
    data["runs"].setdefault("wide_vocab_trial", {"trials": []})
    data["runs"]["wide_vocab_trial"]["trials"].append({
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "index": INDEX, "results": results,
    })
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print("merged wide_vocab_trial into BENCH/scaling.json")


if __name__ == "__main__":
    main()
