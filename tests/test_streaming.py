"""Structured Streaming smoke tests: file-source stream through the ingest
transforms into a memory sink."""

import time
from datetime import datetime, timedelta

import pytest

from frizbee_spark.streaming.ingest import (
    streaming_exact_dedup,
    streaming_match_counts,
)

pytestmark = [pytest.mark.spark, pytest.mark.slow]


@pytest.fixture()
def stream_dir(spark, tmp_path):
    t0 = datetime(2025, 1, 1, 12, 0, 0)
    rows = [
        ("u1", t0, "spark join tutorial content"),
        ("u2", t0 + timedelta(seconds=10), "spark join tutorial content"),  # exact dup
        ("u3", t0 + timedelta(seconds=20), "totally different page body"),
        ("u4", t0 + timedelta(seconds=30), "another spark join mention"),
    ]
    df = spark.createDataFrame(rows, ["url", "warc_ts", "text"])
    path = str(tmp_path / "pages")
    df.coalesce(1).write.parquet(path)
    return path


def _run_stream(spark, stream_df, name, mode="append"):
    query = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    query.processAllAvailable()
    query.awaitTermination(120)
    time.sleep(0.5)
    return spark.sql(f"SELECT * FROM {name}")


def test_streaming_exact_dedup(spark, stream_dir):
    src = spark.readStream.schema("url string, warc_ts timestamp, text string").parquet(
        stream_dir
    )
    out = _run_stream(spark, streaming_exact_dedup(src), "dedup_sink")
    rows = out.collect()
    texts = sorted(r.text for r in rows)
    # the exact re-crawl (u2) is dropped
    assert len(rows) == 3
    assert texts.count("spark join tutorial content") == 1


def test_streaming_match_counts(spark, stream_dir):
    src = spark.readStream.schema("url string, warc_ts timestamp, text string").parquet(
        stream_dir
    )
    # windowed agg in append mode only emits watermark-closed windows; a
    # single availableNow batch never closes them, so read the running
    # counts in complete mode
    out = _run_stream(
        spark, streaming_match_counts(src, "spark join"), "match_sink", mode="complete"
    )
    rows = out.collect()
    assert sum(r.n_matches for r in rows) == 3
