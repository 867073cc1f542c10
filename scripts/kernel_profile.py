"""Offline profiler for the packed-batch scoring kernel.

Replays real per-task kernel inputs (captured by setting
``TSS_KERNEL_DUMP_DIR`` on the executors — see the dump hook in
``search/engine.py``'s batch scorer) through ``_flat_score_topk``
outside Spark, so kernel changes can be timed and A/B'd on genuine
workload shapes without paying a cluster round-trip per iteration.

Usage::

    TSS_KERNEL_DUMP_DIR=/tmp/kdump spark-submit ... scripts/query_trial.py ...
    python scripts/kernel_profile.py /tmp/kdump

Each dump file holds one task's gathered ``(env, doc_col, atom_col,
score_col)``.  The profiler reports cold (first call: page-fault /
buffer-allocation cost) and warm (steady-state worker) times per task;
the warm total is the number that tracks in-worker kernel self-time on
a long-lived executor.

Dumps written before the sparse-W float64 rescore (csc 8-tuple, no
``wsw64``) are upgraded in-place at load so old captures stay usable.
"""
from __future__ import annotations

import glob
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tantivy_search_spark.search import engine as E  # noqa: E402


def _upgrade_env(env: tuple) -> tuple:
    out = list(env)
    for i, e in enumerate(out):
        if (isinstance(e, tuple) and len(e) == 8
                and isinstance(e[0], (bool, np.bool_))):
            slim, wsb, wsa, wsw, wcb, wca, wcw, needed = e
            out[i] = (slim, wsb, wsa, wsw, wsw.astype(np.float64),
                      wcb, wca, wcw, needed)
    return tuple(out)


def main() -> None:
    dump_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/kdump"
    files = sorted(glob.glob(os.path.join(dump_dir, "task-*.pkl")))
    if not files:
        print(f"no task-*.pkl dumps under {dump_dir}", file=sys.stderr)
        sys.exit(1)
    total_cold = total_warm = 0.0
    for fp in files:
        with open(fp, "rb") as f:
            d = pickle.load(f)
        env = _upgrade_env(d["env"])
        args = (env, d["doc_col"], d["atom_col"], d["score_col"])
        t0 = time.time()
        E._flat_score_topk(*args)
        cold = time.time() - t0
        t0 = time.time()
        E._flat_score_topk(*args)
        warm = time.time() - t0
        total_cold += cold
        total_warm += warm
        print(f"{os.path.basename(fp)}: postings={d['doc_col'].size:>9,}"
              f"  cold {cold * 1000:7.1f} ms  warm {warm * 1000:7.1f} ms")
    print(f"TOTAL over {len(files)} tasks: cold {total_cold * 1000:.0f} ms, "
          f"warm {total_warm * 1000:.0f} ms")


if __name__ == "__main__":
    main()
