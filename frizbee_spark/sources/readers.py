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
    """Newline-delimited text -> (index: long, text: string) haystack table.

    The index is assigned by (file, line offset) order so it is stable and
    reproducible across runs — unlike monotonically_increasing_id, whose
    values depend on partition layout. At web scale prefer a source key."""
    lines = spark.read.text(path).select(
        F.col("value").alias("text"),
        F.input_file_name().alias("_file"),
        F.monotonically_increasing_id().alias("_mid"),
    )
    w = Window.orderBy("_file", "_mid")
    return lines.select(
        (F.row_number().over(w) - 1).cast("long").alias("index"), "text"
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
