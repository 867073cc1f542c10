"""Randomized lifecycle fuzz: a seeded sequence of
append / delete / compact / purge ops, checked after every op against
a fresh index built from the surviving docs.

Semantics pinned: while tombstones are pending, matched row-id sets
equal a fresh build's but scores keep pre-delete statistics (the
reference's mask-only behavior); after compact(purge_deletes=True) the
index is score-identical to one where the docs were never indexed.
Found the all-postings-tombstoned purge abort (see TestPurgeEmptyGroup
in test_purge.py); this keeps sweeping the interleaving space.
"""

import json
import random
import shutil

import pytest

from tantivy_search_spark.config import IndexConfig
from tantivy_search_spark.index.builder import IndexBuilder
from tantivy_search_spark.search.engine import SearchIndex

VOCAB = ["ancient", "empires", "rise", "fall", "moral", "horizons",
         "artistic", "expressions", "humanity", "wisdom", "social",
         "movements", "power"]
PROBES = ["ancient rise", "moral wisdom", "social power humanity",
          "empires", "artistic expressions fall"]


def _cfg():
    c = IndexConfig.from_json(["col1"], json.dumps(
        {"col1": {"tokenizer": {"type": "default", "store_doc": True}}}))
    c.n_buckets = 4
    c.parts_per_shard = 2
    return c


def _mktext(rng):
    return " ".join(rng.choice(VOCAB) for _ in range(rng.randint(3, 12)))


def _fresh(spark, tmp_path, model, tag):
    path = str(tmp_path / f"ref_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    rows = [{"doc_id": i, "col1": t} for i, t in sorted(model.items())]
    b = IndexBuilder(spark, path, _cfg(), rows_per_part=2)
    if rows:
        b.build(spark.createDataFrame(rows), id_col="doc_id")
    else:
        import pyspark.sql.types as T
        schema = T.StructType([T.StructField("doc_id", T.LongType()),
                               T.StructField("col1", T.StringType())])
        b.build(spark.createDataFrame([], schema), id_col="doc_id")
    ix = SearchIndex(spark, path)
    ix.enable_stats_cache()
    return ix


def _answers(ix):
    return {q: sorted((r["row_id"], round(r["score"], 6)) for r in
                      ix.bm25_search(q, top_k=100,
                                     operator_or=True).collect())
            for q in PROBES}


class TestLifecycleFuzz:
    # TSS_FUZZ_SEED lets an out-of-band sweep widen the seed space
    # beyond the pinned CI seed
    SEED = int(__import__("os").environ.get("TSS_FUZZ_SEED", 20260821))
    STEPS = 10

    def test_random_op_sequence_matches_model(self, spark, tmp_path):
        rng = random.Random(self.SEED)
        live = str(tmp_path / "live")
        model = {i: _mktext(rng) for i in range(rng.randint(4, 8))}
        ever = set(model)
        b = IndexBuilder(spark, live, _cfg(), rows_per_part=2)
        b.build(spark.createDataFrame(
            [{"doc_id": i, "col1": t} for i, t in model.items()]),
            id_col="doc_id")
        ix = SearchIndex(spark, live)
        ix.enable_stats_cache()
        pending_tombs = False
        ops_run = []
        for step in range(self.STEPS):
            op = rng.choice(["append", "delete", "delete", "compact",
                             "purge"])
            ops_run.append(op)
            if op == "append":
                k = rng.randint(1, 4)
                texts = [_mktext(rng) for _ in range(k)]
                b.append(spark.createDataFrame(
                    [{"col1": t} for t in texts]))
                new_rows = [(r[0], r[1]) for r in spark.read.parquet(
                    f"{live}/docs").select("doc_id", "col1").collect()
                    if r[0] not in ever]
                assert len(new_rows) == k
                for i, t in new_rows:
                    model[i] = t
                    ever.add(i)
            elif op == "delete":
                if model:
                    victim = rng.choice(sorted(model))
                    ix.delete_row_ids([victim])
                    del model[victim]
                    pending_tombs = True
            elif op == "compact":
                b.compact(min_rows_per_group=2)
            elif op == "purge":
                b.compact(min_rows_per_group=2, purge_deletes=True)
                pending_tombs = False
            ix.reload()
            ix.enable_stats_cache()
            got = _answers(ix)
            want = _answers(_fresh(spark, tmp_path, model, step))
            if pending_tombs:
                got = {q: sorted(r for r, _ in v) for q, v in got.items()}
                want = {q: sorted(r for r, _ in v) for q, v in want.items()}
            assert got == want, f"step {step} after {ops_run}"
            assert ix.get_indexed_doc_counts() == len(model), \
                f"step {step} after {ops_run}"
