#!/bin/bash
# North-rule evidence on a REAL multi-executor Spark standalone cluster
# (separate master/worker/executor JVMs, socket shuffles) — not local[N].
#
# Starts a master + 4 workers on this host, then runs the same
# spark-submit --py-files job at N = 1 executor and 4N = 4 executors
# (2 cores each), alternated twice, for both the query path (prebuilt
# index) and the build path.  Prints one JSON line per trial; bracketed
# with a memory-bandwidth probe so numbers are readable against host
# state (this sandbox's effective DRAM bandwidth swings 6-33 GB/s with
# external tenants).
#
# Usage: scripts/cluster_scaling.sh <corpus_parquet> <prebuilt_index>
# Requires: /tmp/tss_pkg.zip (make with scripts/scaling.py make_pkg_zip)

set -u
CORPUS=${1:-/tmp/tss_code_corpus_960000}
INDEX=${2:-/tmp/tss_scale_idx_8}
PKG=${PKG:-/tmp/tss_pkg.zip}
MASTER_URL=spark://127.0.0.1:7077
REPO=$(cd "$(dirname "$0")/.." && pwd)

probe() { python3 -c "
import numpy as np, time
a = np.zeros(1<<27, dtype=np.uint8); best=0
for _ in range(3):
    t0=time.time(); b=a.copy(); best=max(best, 2*a.nbytes/(time.time()-t0)/1e9)
print('gbps', round(best,2))"; }

start_cluster() {
  unset SPARK_NO_DAEMONIZE
  /opt/spark/sbin/start-master.sh --host 127.0.0.1 --port 7077 \
      --webui-port 8090 >/dev/null 2>&1
  sleep 5
  for i in 1 2 3 4; do
    SPARK_IDENT_STRING=w$i /opt/spark/sbin/start-worker.sh $MASTER_URL \
        --cores 8 --memory 16g --port 710$i --webui-port 810$i \
        >/dev/null 2>&1
  done
  sleep 8
  curl -s http://127.0.0.1:8090/json/ | python3 -c "
import json,sys; d=json.load(sys.stdin)
print('workers:', [(w['cores'], w['state']) for w in d['workers']])"
}

stop_cluster() {
  for i in 1 2 3 4; do
    SPARK_IDENT_STRING=w$i /opt/spark/sbin/stop-worker.sh >/dev/null 2>&1
  done
  /opt/spark/sbin/stop-master.sh >/dev/null 2>&1
}

run() { # $1 tag, $2 total cores, $3 per-executor cores, $4 script, args...
  local tag=$1 total=$2 per=$3 script=$4; shift 4
  probe
  ARROW_DEFAULT_MEMORY_POOL=mimalloc OPENBLAS_NUM_THREADS=1 \
  OMP_NUM_THREADS=1 MKL_NUM_THREADS=1 \
  "$(which spark-submit)" --master $MASTER_URL \
    --driver-memory 8g --executor-memory 10g \
    --total-executor-cores "$total" --executor-cores "$per" \
    --conf spark.sql.shuffle.partitions=128 \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.executorEnv.ARROW_DEFAULT_MEMORY_POOL=mimalloc \
    --conf spark.executorEnv.OPENBLAS_NUM_THREADS=1 \
    --conf spark.executorEnv.OMP_NUM_THREADS=1 \
    --conf spark.ui.enabled=false \
    --py-files "$PKG" \
    "$REPO/scripts/$script" "$@" 2>/dev/null | grep "^{" | sed "s/^/$tag /"
}

start_cluster
# query criterion pairs: N=1 executor vs 4N=4 executors, alternated
run QE1x2 2 2 query_trial.py "$INDEX" 1000
run QE4x2 8 2 query_trial.py "$INDEX" 1000
run QE1x2 2 2 query_trial.py "$INDEX" 1000
run QE4x2 8 2 query_trial.py "$INDEX" 1000
# build criterion pair (assign_doc_ids auto -> deterministic path here)
run BE1x2 2 2 trial_build_query.py "$CORPUS" /tmp/tss_cluster_idx 12
run BE4x2 8 2 trial_build_query.py "$CORPUS" /tmp/tss_cluster_idx 12
probe
stop_cluster
