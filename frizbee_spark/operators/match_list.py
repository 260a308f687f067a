"""DataFrame-level match_list: frizbee's batch scan as a Spark operator.

Spark-first design (SURVEY.md §3.4): the cheap length filter is expressed in
SQL so Catalyst pushes it into the parquet scan, the SW scorer runs as one
Arrow-batched pandas UDF projection, and ordering is a DataFrame sort (the
shuffle merge-sort replaces the reference's per-thread sort + k-way merge,
src/matcher/parallel.rs:18-89)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..core.config import Config, SortStrategy
from ..core.pattern import Pattern
from ..runtime import ensure_min_partitions
from ..udfs import fuzzy_match_indices_udf, fuzzy_match_udf

__all__ = ["match_list", "match_list_indices", "match_query"]


def _order_columns(config: Config, index_col: str) -> list[Column]:
    """The four SortStrategy orderings (src/lib.rs:313-354, src/sort.rs:6-40)."""
    sort = config.sort
    if sort is SortStrategy.SCORE_THEN_INDEX_ASC:
        return [F.desc("score"), F.asc(index_col)]
    if sort is SortStrategy.SCORE_THEN_INDEX_DESC:
        return [F.desc("score"), F.desc(index_col)]
    if sort is SortStrategy.INDEX_ASC:
        return [F.asc(index_col)]
    return [F.desc(index_col)]


def match_list(
    df: DataFrame,
    needle: str,
    config: Config | None = None,
    text_col: str = "text",
    index_col: str = "doc_id",
    ordered: bool = True,
    with_end_col: bool = False,
) -> DataFrame:
    """Score every row's `text_col` against `needle`, keeping matches.

    Returns (index_col, score, exact[, end_col]). Equivalent to the
    reference's match_list (src/matcher/mod.rs:212-222) over the column;
    `with_end_col` adds the `match_end_col` feature surface
    (src/lib.rs:150-152): the haystack offset of the final matched
    position."""
    config = config or Config()

    out = df.select(index_col, text_col)
    # min-length filter in SQL so it reaches the scan (matcher/algo.rs:62-65);
    # byte semantics via octet_length. The UDF re-checks, this is pruning only.
    if config.max_typos is not None and config.matching.is_fuzzy:
        min_len = max(0, len(needle) - config.max_typos)
        if min_len > 0:
            out = out.where(F.octet_length(F.col(text_col)) >= F.lit(min_len))

    # spread an unsplittable small scan across the session's cores before
    # the per-row Python stage (no-op for at-scale inputs — see
    # runtime.ensure_min_partitions): the SW kernel is the cost center and
    # must run at full width, not at the scan's file/row-group width
    out = ensure_min_partitions(out)

    udf = fuzzy_match_udf(needle, config, with_end_col=with_end_col)
    projection = [
        F.col(index_col),
        F.col("m.score").alias("score"),
        F.col("m.exact").alias("exact"),
    ]
    if with_end_col:
        projection.append(F.col("m.end_col").alias("end_col"))
    out = (
        out.withColumn("m", udf(F.col(text_col)))
        .where(F.col("m.matched"))
        .select(*projection)
    )
    if ordered:
        out = out.orderBy(*_order_columns(config, index_col))
    return out


def match_list_indices(
    df: DataFrame,
    needle: str,
    config: Config | None = None,
    text_col: str = "text",
    index_col: str = "doc_id",
    ordered: bool = True,
) -> DataFrame:
    """match_list with matched byte offsets (reverse order): returns
    (index_col, score, exact, indices) — the MatchIndices surface
    (src/matcher/mod.rs:227-268)."""
    config = config or Config()
    udf = fuzzy_match_indices_udf(needle, config)
    out = (
        ensure_min_partitions(df.select(index_col, text_col))
        .withColumn("m", udf(F.col(text_col)))
        .where(F.col("m.matched"))
        .select(
            F.col(index_col),
            F.col("m.score").alias("score"),
            F.col("m.exact").alias("exact"),
            F.col("m.indices").alias("indices"),
        )
    )
    if ordered:
        out = out.orderBy(*_order_columns(config, index_col))
    return out


def match_query(
    df: DataFrame,
    query: str,
    config: Config | None = None,
    text_col: str = "text",
    index_col: str = "doc_id",
    ordered: bool = True,
) -> DataFrame:
    """Multi-pattern query (`foo !^bar`): AND of non-negated atoms with score
    sum / exact OR, anti-filter for negated atoms (src/matcher/multi.rs:84-152).

    Each atom is one vectorized UDF projection; negated atoms become a SQL
    NOT on the matched flag (relationally a left-anti semi-join on the same
    row set, fused here into a single projection pipeline).

    API caveats (documented limits, matching the reference surface):
    - `end_col` on the multi-pattern path reports the last non-negated
      atom's end column for NORMAL-sized haystacks, but reads 0 for
      haystacks on the >1024-byte greedy fallback path — the reference's
      multi-pattern matcher exposes no end_col at all (its `match_end_col`
      feature is single-pattern only, src/lib.rs:150-152), so the greedy
      second pass that recovers it is only wired into the single-pattern
      path. Callers needing exact end columns for oversized haystacks
      should re-match the (few) surviving rows with `match_list(...,
      with_end_col=True)`.
    - NULL text rows never match — including all-negated queries like
      `!foo` (null is unknown content, not empty content; empty strings
      DO survive `!foo`). Same rule as the single-pattern path."""
    config = config or Config()
    patterns = Pattern.parse_query(query)

    out = df.select(index_col, text_col)
    if not patterns:
        # Empty query: every row matches with score 0 (matcher/mod.rs Empty)
        result = out.select(
            F.col(index_col),
            F.lit(0).alias("score"),
            F.lit(False).alias("exact"),
        )
        if ordered and config.sort is SortStrategy.INDEX_DESC:
            result = result.orderBy(F.desc(index_col))
        elif ordered:
            result = result.orderBy(F.asc(index_col))
        return result

    # SQL-expressible min-length prefilters for every non-negated fuzzy
    # pattern reach the scan before any UDF runs (matcher/algo.rs:62-65)
    for pattern in patterns:
        resolved = pattern.config.resolve(config)
        if (
            not pattern.negated
            and resolved.max_typos is not None
            and resolved.matching.is_fuzzy
        ):
            min_len = max(0, len(pattern.needle) - resolved.max_typos)
            if min_len > 0:
                out = out.where(
                    F.octet_length(F.col(text_col)) >= F.lit(min_len)
                )

    # ONE Arrow pass for all atoms (multi.rs:84-152): survivor refinement
    # happens via numpy masks INSIDE the UDF (pattern i+1 only scores rows
    # that survived patterns 0..i), so the text column crosses the
    # JVM<->Python boundary once, not once per atom. The round-3 layout
    # chained N ArrowEval stages with .asNondeterministic() optimizer
    # barriers between them — N Arrow serializations of the text column
    # and N python-runner stage ramps for the same kernel work.
    from ..udfs import multi_pattern_match_udf

    # full-width Python stage for small unsplittable scans (see match_list)
    out = ensure_min_partitions(out)

    triples = [
        (p.needle, p.config.resolve(config), p.negated) for p in patterns
    ]
    udf = multi_pattern_match_udf(triples)
    out = (
        out.withColumn("_m", udf(F.col(text_col)))
        .where(F.col("_m.matched"))
        .select(
            F.col(index_col),
            F.col("_m.score").alias("score"),
            F.col("_m.exact").alias("exact"),
        )
    )
    if ordered:
        out = out.orderBy(*_order_columns(config, index_col))
    return out
