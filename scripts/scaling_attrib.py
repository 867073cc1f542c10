"""Per-stage attribution of the packed batch path's scaling gap.

VERDICT r3 item 6: the packed batch kernel scales 0.83-0.87 on the
(1,4)/(2,8) core pairs but ~0.51 raw on 8->32 while the host's own CPU
calibration only delivers ~0.86 there — show WHERE the residual loss
lives.  This runs the same 1000-query workload as scripts/scaling.py
(query-only, prebuilt index, cold JVM per level) at two parallelism
levels with

  * $TSS_KERNEL_PROF_DIR      — per-task phase timings emitted by the
    batch path's two pandas stages (decode_pack, topk_packed): shuffle
    feed (arrow_fetch_s), row gather, numpy kernel seconds.  Spark's
    task metrics cannot see inside a Python worker; this can.
  * Spark event logs           — per-stage wall/run/cpu + shuffle
    fetch-wait on the JVM side.

Usage:  python scripts/scaling_attrib.py [cores...]   (default: 8 32)
Writes BENCH/scaling_attribution.json and merges a summary entry into
BENCH/scaling.json runs["r4_attribution"].
"""

from __future__ import annotations

import collections
import glob
import json
import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORPUS = "/tmp/tss_code_corpus_960000"
INDEX = "/tmp/tss_attrib_idx"
N_QUERIES = 1000
LEVELS = [int(c) for c in sys.argv[1:]] or [8, 32]


def make_pkg() -> str:
    zpath = "/tmp/tss_pkg.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(os.path.join(REPO, "tantivy_search_spark")):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def build_index() -> None:
    if os.path.exists(os.path.join(INDEX, "_index_meta.json")):
        return
    from pyspark.sql import SparkSession
    from tantivy_search_spark.config import IndexConfig
    from tantivy_search_spark.index.builder import IndexBuilder

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "128")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "16g").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(CORPUS)
    shutil.rmtree(INDEX, ignore_errors=True)
    cfg = IndexConfig.from_json(["content"], "{}")
    cfg.parts_per_shard = 8
    IndexBuilder(spark, INDEX, cfg, rows_per_part=7500).build(
        docs, order_cols=["repo", "path", "commit"])
    spark.stop()


def parse_eventlog(evt_dir: str) -> list[dict]:
    """Top python-stage rows (wall, run, cpu, shuffle fetch wait)."""
    stages: dict = {}
    agg: dict = collections.defaultdict(lambda: collections.Counter())
    for path in glob.glob(os.path.join(evt_dir, "*")):
        if os.path.isdir(path):
            inner = glob.glob(os.path.join(path, "events_*"))
            path = inner[0] if inner else None
        if not path:
            continue
        opener = open
        if path.endswith(".zstd"):
            continue  # rolled logs not expected at this size
        for line in opener(path, errors="ignore"):
            try:
                e = json.loads(line)
            except Exception:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"].split("\n")[0][:60],
                    "tasks": si["Number of Tasks"],
                    "wall_s": round((si.get("Completion Time", 0)
                                     - si.get("Submission Time", 0)) / 1000,
                                    2),
                }
            elif ev == "SparkListenerTaskEnd":
                m = e.get("Task Metrics") or {}
                sm = m.get("Shuffle Read Metrics") or {}
                a = agg[e["Stage ID"]]
                a["run_ms"] += m.get("Executor Run Time", 0)
                a["cpu_ms"] += m.get("Executor CPU Time", 0) // 1_000_000
                a["gc_ms"] += m.get("JVM GC Time", 0)
                a["fetch_wait_ms"] += sm.get("Fetch Wait Time", 0)
                a["shuffle_read_b"] += (sm.get("Local Bytes Read", 0)
                                        + sm.get("Remote Bytes Read", 0))
    out = []
    for sid, s in sorted(stages.items(), key=lambda kv: -kv[1]["wall_s"]):
        a = agg[sid]
        out.append({
            "stage": sid, **s,
            "run_s": round(a["run_ms"] / 1000, 1),
            "cpu_s": round(a["cpu_ms"] / 1000, 1),
            "gc_s": round(a["gc_ms"] / 1000, 1),
            "fetch_wait_s": round(a["fetch_wait_ms"] / 1000, 1),
            "shuffle_read_mb": round(a["shuffle_read_b"] / 1e6, 1),
        })
    return out[:6]


def collect_kernel_prof(kp_dir: str) -> dict:
    sums: dict = collections.defaultdict(lambda: collections.Counter())
    counts: collections.Counter = collections.Counter()
    for f in glob.glob(os.path.join(kp_dir, "kp-*.jsonl")):
        for line in open(f):
            try:
                r = json.loads(line)
            except Exception:
                continue
            st = r.pop("stage")
            counts[st] += 1
            for k, v in r.items():
                if isinstance(v, (int, float)):
                    sums[st][k] += v
    return {st: {"tasks": counts[st],
                 **{k: round(v, 2) for k, v in sums[st].items()}}
            for st in sums}


def run_level(cores: int, pkg: str) -> dict:
    evt_dir = f"/tmp/tss_evt_attrib_{cores}"
    kp_dir = f"/tmp/tss_kp_{cores}"
    shutil.rmtree(evt_dir, ignore_errors=True)
    shutil.rmtree(kp_dir, ignore_errors=True)
    os.makedirs(evt_dir, exist_ok=True)
    spark_submit = shutil.which("spark-submit")
    cmd = [
        spark_submit, "--master", f"local[{cores}]",
        "--driver-memory", "24g",
        "--conf", "spark.sql.shuffle.partitions=128",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.eventLog.enabled=true",
        "--conf", f"spark.eventLog.dir={evt_dir}",
        "--conf", "spark.executorEnv.ARROW_DEFAULT_MEMORY_POOL=mimalloc",
        "--conf", "spark.executorEnv.OPENBLAS_NUM_THREADS=1",
        "--conf", f"spark.executorEnv.TSS_KERNEL_PROF_DIR={kp_dir}",
        "--conf", "spark.ui.enabled=false",
        "--py-files", pkg,
        os.path.join(REPO, "scripts", "query_trial.py"),
        INDEX, str(N_QUERIES),
    ]
    env = dict(os.environ, ARROW_DEFAULT_MEMORY_POOL="mimalloc",
               OPENBLAS_NUM_THREADS="1", OMP_NUM_THREADS="1",
               MKL_NUM_THREADS="1", TSS_KERNEL_PROF_DIR=kp_dir)
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600,
                         env=env)
    trial = None
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            trial = json.loads(line)
    if trial is None:
        raise RuntimeError(out.stdout[-2000:] + out.stderr[-3000:])
    return {
        "trial": trial,
        "kernel_prof": collect_kernel_prof(kp_dir),
        "stages": parse_eventlog(evt_dir),
    }


def main() -> None:
    pkg = make_pkg()
    build_index()
    result = {"index": INDEX, "n_queries": N_QUERIES, "levels": {}}
    for cores in LEVELS:
        result["levels"][str(cores)] = run_level(cores, pkg)
        print(f"local[{cores}]: qps_last="
              f"{result['levels'][str(cores)]['trial']['qps_last']}",
              file=sys.stderr)
    lv = result["levels"]
    if len(LEVELS) >= 2:
        a, b = str(LEVELS[0]), str(LEVELS[-1])
        qa = lv[a]["trial"]["qps_last"]
        qb = lv[b]["trial"]["qps_last"]
        result["efficiency"] = {
            f"{a}->{b}": round(qb / qa / (LEVELS[-1] / LEVELS[0]), 3)}
    with open(os.path.join(REPO, "BENCH", "scaling_attribution.json"),
              "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"efficiency": result.get("efficiency"),
                      "qps": {c: lv[c]["trial"]["qps_last"] for c in lv}}))


if __name__ == "__main__":
    main()
