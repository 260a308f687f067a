"""Structured Streaming ingest for the dedup pipeline.

The reference is a synchronous library (SURVEY.md §2.9) and the north rule
is a batch job — this module covers the continuous-ingest deployment shape:
a stream of crawled pages is fingerprinted, exact-deduped within a
watermark, and appended to the bronze table the batch dedup pipeline
periodically re-clusters.

Scale notes: dropDuplicatesWithinWatermark keys state by the 64-bit
fingerprint (not the url/text), so state size is bounded by
(pages-per-watermark x 8B); late pages beyond the watermark fall through to
the batch dedup rather than growing state forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fingerprint_stream", "streaming_exact_dedup", "streaming_match_counts"]


def fingerprint_stream(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the canonical content fingerprint (same normalization as the
    batch exact-dedup operator, operators/text.py:with_fingerprint)."""
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return pages.withColumn("fingerprint", F.xxhash64(normalized))


def streaming_exact_dedup(
    pages: DataFrame,
    event_time_col: str = "warc_ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop exact re-crawls within the watermark window; the first capture
    of each fingerprint wins (state pruned by the watermark)."""
    return (
        fingerprint_stream(pages)
        .withWatermark(event_time_col, watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def streaming_match_counts(
    pages: DataFrame,
    needle: str,
    event_time_col: str = "warc_ts",
    window: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Windowed count of pages whose text contains `needle` (literal
    substring membership — the SQL-expressible slice of the matcher), with
    late data handled by the watermark."""
    return (
        pages.withWatermark(event_time_col, watermark)
        .where(F.instr(F.col("text"), F.lit(needle)) > 0)
        .groupBy(F.window(F.col(event_time_col), window).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_matches"))
        .select(F.col("w.start").alias("window_start"), "n_matches")
    )
