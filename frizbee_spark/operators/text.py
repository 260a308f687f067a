"""Text-analysis operators for large-scale training-data pipelines.

All built on JVM-side pyspark.sql.functions (whole-stage codegen) — no
Python in these paths. Each has an ANSI-SQL oracle in __spark_entry__."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..runtime import ensure_min_partitions

__all__ = [
    "with_token_count",
    "with_quality_signals",
    "with_lang_guess",
    "with_fingerprint",
]

_STOPWORDS = (
    "the,a,an,and,or,of,to,in,is,it,that,for,on,as,with,was,at,by,be,this",
)


def with_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count plus a BPE-ish subword estimate
    (len/4 heuristic used by tokenizer-budget planners)."""
    tokens = F.split(F.trim(F.col(text_col)), r"\s+")
    return df.withColumn(
        "n_tokens",
        F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0)).otherwise(
            F.size(tokens)
        ),
    ).withColumn("n_subwords_est", (F.octet_length(text_col) / F.lit(4)).cast("long"))


def with_quality_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality scoring signals."""
    # three regexp passes per row: run them at full width even when the
    # input is one unsplittable file (no-op for at-scale scans)
    df = ensure_min_partitions(df)
    text = F.col(text_col)
    n_chars = F.length(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    words = F.split(F.lower(F.trim(text)), r"\s+")
    stop_arr = F.split(F.lit(_STOPWORDS[0]), ",")
    n_stop = F.size(F.array_intersect(words, stop_arr))
    return (
        df.withColumn("q_n_chars", n_chars.cast("long"))
        .withColumn(
            "q_punct_ratio",
            F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4),
        )
        .withColumn(
            "q_stopword_hits",
            F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(n_stop).cast("long"),
        )
        .withColumn(
            "q_mean_word_len",
            F.round(
                F.length(F.regexp_replace(text, r"\s+", ""))
                / F.greatest(F.size(words), F.lit(1)),
                4,
            ),
        )
    )


def with_lang_guess(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Cheap n-gram/script language heuristic: script detection for CJK /
    Arabic / Cyrillic via codepoint classes, stopword hits for Latin langs.
    Intentionally simple and fully SQL-expressible; a real model slots in
    behind the same column contract."""
    # four regexp_count passes per row: full width for unsplittable scans
    df = ensure_min_partitions(df)
    text = F.col(text_col)
    has_cjk = F.regexp_count(text, F.lit(r"[一-鿿]")) > 0
    has_hangul = F.regexp_count(text, F.lit(r"[가-힯]")) > 0
    has_arabic = F.regexp_count(text, F.lit(r"[؀-ۿ]")) > 0
    has_cyrillic = F.regexp_count(text, F.lit(r"[Ѐ-ӿ]")) > 0
    return df.withColumn(
        "lang_guess",
        F.when(has_cjk, F.lit("zh"))
        .when(has_hangul, F.lit("ko"))
        .when(has_arabic, F.lit("ar"))
        .when(has_cyrillic, F.lit("ru"))
        .otherwise(F.lit("latin")),
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic 64-bit content fingerprint: xxhash64 of the normalized
    text (lowercased, whitespace collapsed). JVM-side, shuffle-friendly key
    for exact-dup grouping at 10^12-row scale."""
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn("fingerprint", F.xxhash64(normalized))
