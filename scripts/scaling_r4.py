"""Round-4 query-scaling datapoint: the r3_packed_shuffle protocol
re-measured after the round-4 batch-kernel changes (score>0 match
inference skipping the dense count matmul, commit 337eebb; float32
score prefilter + exact float64 candidate rescore, commit 7df6e6b).

Protocol (identical to BENCH/scaling.json `r3_query_only_pinned` /
`r3_packed_shuffle`):
  1. deterministic 960k-doc synthetic code corpus (FIXTURES.md §1),
  2. ONE prebuilt index (built at local[8] via trial_build_query.py —
     also yields a build datapoint for that level),
  3. scripts/query_trial.py via spark-submit at local[1/2/4/8/32],
     cold JVM per level, same 1000-query batch, warm run discarded,
     qps from the last timed run,
  4. merges an `r4_f32_prefilter` entry into BENCH/scaling.json runs
     and refreshes cross_run_summary efficiency lists.

Usage: python scripts/scaling_r4.py [n_files] [n_queries] [levels]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import scaling  # noqa: E402
from scaling import gen_corpus, make_pkg_zip, warm_cache, cpu_calibration  # noqa: E402

RUN_KEY = os.environ.get("SCALING_RUN_KEY", "r4_f32_prefilter")

N_FILES = int(sys.argv[1]) if len(sys.argv) > 1 else 960_000
scaling.N_FILES = N_FILES  # gen_corpus sizes the corpus from this global
N_QUERIES = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
LEVELS = tuple(int(x) for x in sys.argv[3].split(",")) if len(sys.argv) > 3 \
    else (1, 2, 4, 8, 32)
BUILD_CORES = 8
INDEX = f"/tmp/tss_scale_idx_{BUILD_CORES}"

SUBMIT_CONFS = [
    "--driver-memory", "24g",
    "--conf", "spark.sql.shuffle.partitions=128",
    "--conf", "spark.sql.adaptive.enabled=true",
    "--conf", "spark.executorEnv.ARROW_DEFAULT_MEMORY_POOL=mimalloc",
    "--conf", "spark.executorEnv.OPENBLAS_NUM_THREADS=1",
    "--conf", "spark.executorEnv.OMP_NUM_THREADS=1",
    "--conf", "spark.ui.enabled=false",
]


def spark_submit(cores: int, pkg: str, script: str, *argv: str) -> dict:
    import shutil as _sh
    exe = _sh.which("spark-submit")
    cmd = ([exe, "--master", f"local[{cores}]"] + SUBMIT_CONFS
           + ["--py-files", pkg, os.path.join(REPO, "scripts", script)]
           + list(argv))
    env = dict(os.environ, ARROW_DEFAULT_MEMORY_POOL="mimalloc",
               OPENBLAS_NUM_THREADS="1", OMP_NUM_THREADS="1",
               MKL_NUM_THREADS="1")
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600,
                         env=env)
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"local[{cores}] {script} produced no JSON:\n"
                       f"{out.stdout[-2000:]}\n{out.stderr[-3000:]}")


def main() -> None:
    corpus = f"/tmp/tss_code_corpus_{N_FILES}"
    gen_corpus(corpus)
    pkg = make_pkg_zip()
    warm_cache(corpus)
    calibration = cpu_calibration(LEVELS)

    build = None
    if not os.path.exists(os.path.join(INDEX, "_index_meta.json")):
        t0 = time.time()
        build = spark_submit(BUILD_CORES, pkg, "trial_build_query.py",
                             corpus, INDEX, str(N_QUERIES))
        print(f"build at local[{BUILD_CORES}]: "
              f"{build.get('build_docs_per_sec')} docs/s "
              f"({time.time() - t0:.0f}s wall)", file=sys.stderr)

    trials = {}
    for cores in LEVELS:
        trials[str(cores)] = spark_submit(cores, pkg, "query_trial.py",
                                          INDEX, str(N_QUERIES))
        print(f"local[{cores}]: qps_last="
              f"{trials[str(cores)]['qps_last']}", file=sys.stderr)

    eff = {}
    for lo in LEVELS:
        hi = 4 * lo
        if str(hi) in trials:
            eff[f"{lo}->{hi}"] = round(
                (trials[str(hi)]["qps_last"] / trials[str(lo)]["qps_last"])
                / (hi / lo), 3)

    path = os.path.join(REPO, "BENCH", "scaling.json")
    doc = json.load(open(path))
    doc["runs"][RUN_KEY] = {
        "note": "round-4 batch kernel: score>0 match inference (337eebb) "
                "+ float32 score prefilter with exact float64 candidate "
                "rescore (7df6e6b) over the unchanged packed-blob shuffle. "
                "Same prebuilt-index query-only protocol as "
                "r3_packed_shuffle; build row is the one local[8] build "
                "that produced the index.",
        "build_local8": build,
        "cpu_calibration": calibration,
        "trials": trials,
        "query_scaling_efficiency": eff,
    }
    summ = doc.setdefault("cross_run_summary", {})
    for pair, key in (("1->4", "query_1_to_4"), ("2->8", "query_2_to_8"),
                      ("8->32", "query_8_to_32")):
        if pair in eff:
            summ.setdefault(key, []).append(eff[pair])
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"levels": {k: v["qps_last"] for k, v in trials.items()},
                      "efficiency": eff}))


if __name__ == "__main__":
    main()
