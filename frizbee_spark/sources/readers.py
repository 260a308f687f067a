"""Sources and sinks.

The reference's only file source is a newline-delimited line reader feeding
the haystack list (/root/reference/benches/lib.rs:79-90); here that maps to
spark.read.text with a stable row index. Parquet is the engine's native
interchange; Iceberg is the production table format (north_rule) — writing
uses `writeTo(...)` when an Iceberg catalog is configured and falls back to
parquet paths otherwise (this container has no Iceberg runtime jar)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["read_lines", "read_web_pages", "write_table"]


def read_lines(spark: SparkSession, path: str) -> DataFrame:
    """Newline-delimited text -> (line_id: long, text: string) haystack table.

    line_id is assigned by (file, line offset) order so it is stable and
    reproducible across runs — unlike monotonically_increasing_id, whose
    values depend on partition layout. The column is deliberately NOT named
    `index`: pyspark Row is a tuple subclass, so row.index would resolve to
    tuple.index instead of the value.

    Scale: the per-line row_number window is partitioned by file (splits of
    one file stay ordered because monotonically_increasing_id embeds the
    partition id in its high bits and Spark assigns file splits to
    partitions in offset order); only the per-FILE offset table — one row
    per file — goes through an unpartitioned cumulative-sum window, then is
    broadcast back. Nothing corpus-sized ever lands on a single partition."""
    lines = spark.read.text(path).select(
        F.col("value").alias("text"),
        F.input_file_name().alias("_file"),
        F.monotonically_increasing_id().alias("_mid"),
    )
    w_file = Window.partitionBy("_file").orderBy("_mid")
    per_file = lines.select(
        "_file", "text", F.row_number().over(w_file).alias("_rn")
    )
    w_off = Window.orderBy("_file").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        per_file.groupBy("_file")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            "_file",
            F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_offset"),
        )
    )
    return per_file.join(F.broadcast(offsets), "_file").select(
        (F.col("_offset") + F.col("_rn") - 1).cast("long").alias("line_id"),
        "text",
    )


def read_web_pages(spark: SparkSession, path: str) -> DataFrame:
    """Load the web_pages input table (url, warc_ts, html, text, lang) from
    parquet or an Iceberg table identifier."""
    if "/" in path or path.endswith(".parquet"):
        return spark.read.parquet(path)
    return spark.read.table(path)


def write_table(df: DataFrame, target: str, mode: str = "overwrite") -> None:
    """Write to an Iceberg table (identifier without '/') or a parquet path.

    Iceberg gives the pipeline snapshot isolation + incremental-scan resume
    at production scale; the parquet path is the sandbox fallback."""
    if "/" in target:
        df.write.mode(mode).parquet(target)
    else:
        writer = df.writeTo(target)
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
