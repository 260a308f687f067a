"""Runtime helpers: the scale-adaptive input-spreading decision."""

import pytest
from pyspark.sql import functions as F

from frizbee_spark.runtime import ensure_min_partitions

pytestmark = pytest.mark.spark


def test_small_unsplittable_scan_is_spread(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    out = ensure_min_partitions(docs, 8)
    assert out.rdd.getNumPartitions() >= 8
    # pure row redistribution: same rows, same values
    assert out.count() == docs.count()
    checksum = lambda df: df.agg(  # noqa: E731 - order-insensitive
        F.expr("bit_xor(xxhash64(doc_id, text))")
    ).collect()[0][0]
    assert checksum(out) == checksum(docs)


def test_wide_enough_scan_untouched(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # one file, one row group: asking for 1 partition is already satisfied
    assert ensure_min_partitions(docs, 1) is docs


def test_in_memory_input_untouched(spark):
    mem = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "t"])
    assert ensure_min_partitions(mem, 64) is mem
