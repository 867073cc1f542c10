"""Local simulation of the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB, compare
row-count + schema-insensitive sorted values (order-insensitive,
column-name sorted — mirroring the driver's value-hash)."""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        if str(df[c].dtype) == "bool":
            df[c] = df[c].astype(int)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, only: list[str] | None = None):
    from pyspark.sql import SparkSession
    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = dict(entrymod.queries())
    oracles = dict(entrymod.oracle_sql())
    if hasattr(entrymod, "extra_queries"):
        qs.update(entrymod.extra_queries())
        oracles.update(entrymod.extra_oracle_sql())
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only check, {len(sdf)} rows "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {str(e)[:200]}")
            continue
        a, b = normalize(sdf), normalize(odf)
        status = None
        if list(a.columns) != list(b.columns):
            status = f"schema mismatch {list(a.columns)} vs {list(b.columns)}"
        elif len(a) != len(b):
            status = f"row count {len(a)} vs {len(b)}"
        else:
            bad_cols = []
            for c in a.columns:
                av, bv = a[c], b[c].astype(a[c].dtype) if a[c].dtype != object else b[c]
                if str(av.dtype).startswith("float"):
                    if not ((av - bv).abs().fillna(0) <= 1e-9).all():
                        bad_cols.append(c)
                elif not (av == bv).all():
                    bad_cols.append(c)
            if bad_cols:
                status = f"value mismatch in {bad_cols}"
                ex = (a[bad_cols[0]] != b[bad_cols[0]])
                print("  sample a:", a[ex].head(3).to_dict("records"))
                print("  sample b:", b[ex].head(3).to_dict("records"))
        if status:
            failures.append(name)
            print(f"FAIL {name}: {status}")
        else:
            print(f"PASS {name}: {len(a)} rows ({time.time()-t0:.1f}s)")
    print()
    if failures:
        print("FAILED:", failures)
        sys.exit(1)
    print("all queries match their oracles")


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    main(sf, only)
