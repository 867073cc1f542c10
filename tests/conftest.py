import os
import sys

os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "mimalloc")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("tantivy-search-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def corpus_a_index(spark, tmp_path_factory):
    """Corpus A built as a 3-part index (rows_per_part=2) — multi-part by
    construction so every golden also exercises the merge path."""
    from tantivy_search_spark.config import IndexConfig
    from tantivy_search_spark.index.builder import IndexBuilder
    from tantivy_search_spark.search.engine import SearchIndex
    from corpora import corpus_a_rows

    path = str(tmp_path_factory.mktemp("idx") / "corpus_a")
    cfg = IndexConfig.from_json(["col1", "col2", "col3"], "{}")
    cfg.parts_per_shard = 2
    cfg.n_buckets = 8
    df = spark.createDataFrame(corpus_a_rows())
    IndexBuilder(spark, path, cfg, rows_per_part=2).build(df, id_col="doc_id")
    return SearchIndex(spark, path)
