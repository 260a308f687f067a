"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship fuzzy match over sf0.001 documents.
``queries()`` exposes one DataFrame-producing callable per implemented
operator (SURVEY.md §2 + training-data operators); ``oracle_sql()`` gives
the DuckDB-ANSI equivalent for every SQL-expressible one. Non-SQL operators
(Smith-Waterman scoring, MinHash/SimHash/LSH) get rows-only checks — their
byte-level correctness is covered by tests/ against the compiled reference.
"""

from __future__ import annotations

import os
from collections.abc import Callable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frizbee_spark.core.config import Config
from frizbee_spark.operators.dedup import (
    candidate_pairs,
    embedding_cosine_pairs,
    exact_duplicates,
    lsh_bands,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_values,
)
from frizbee_spark.operators.match_list import (
    match_list,
    match_list_indices,
    match_query,
)
from frizbee_spark.operators.substring_dedup import substring_dedup_pairs
from frizbee_spark.operators.similarity import (
    brute_force_top_k,
    ivf_top_k,
    lsh_bucketed_top_k,
)
from frizbee_spark.operators.text import (
    with_lang_guess,
    with_quality_signals,
    with_token_count,
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: frizbee match_list("spark join", documents.text) at
    sf0.001, ordered score desc / doc_id asc."""
    docs = _docs(spark, "/root/testdata/sf0.001")
    return match_list(docs, "spark join", Config(max_typos=1))


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # --- scans / filters (SURVEY §2.1, §2.2) ---
    def doc_length_filter(spark, sf):
        return (
            _docs(spark, sf)
            .where(F.octet_length("text") >= 200)
            .select("doc_id", "n_chars")
        )

    q["doc_length_filter"] = doc_length_filter

    # --- literal matching modes (SURVEY §2.8) ---
    def literal_substring(spark, sf):
        return (
            _docs(spark, sf)
            .where(F.instr(F.col("text"), F.lit("spark join")) > 0)
            .select("doc_id")
        )

    q["literal_substring"] = literal_substring

    def literal_prefix(spark, sf):
        return (
            _docs(spark, sf)
            .where(F.col("text").startswith("the "))
            .select("doc_id")
        )

    q["literal_prefix"] = literal_prefix

    def literal_suffix(spark, sf):
        return (
            _docs(spark, sf).where(F.col("text").endswith("scan")).select("doc_id")
        )

    q["literal_suffix"] = literal_suffix

    # --- sorts / top-k (SURVEY §2.6) ---
    def top_k_longest(spark, sf):
        return (
            _docs(spark, sf)
            .orderBy(F.desc("n_chars"), F.asc("doc_id"))
            .limit(50)
            .select("doc_id", "n_chars")
        )

    q["top_k_longest"] = top_k_longest

    # --- aggregations (SURVEY §2.4) + TPC-H-style relational coverage ---
    def agg_pricing_summary(spark, sf):
        li = spark.read.parquet(f"{sf}/lineitem.parquet")
        return (
            li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                # exact decimal accumulation, then a double surface: the
                # driver's canonicalizer hashes python Decimal differently
                # from DuckDB's float64 even when values are identical
                F.round(
                    F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"),
                    2,
                ).alias("sum_qty"),
                F.round(
                    F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                        "double"
                    ),
                    2,
                ).alias("sum_base_price"),
                F.count(F.lit(1)).alias("count_order"),
            )
            .orderBy("l_returnflag", "l_linestatus")
        )

    q["agg_pricing_summary"] = agg_pricing_summary

    def join_orders_per_nation(spark, sf):
        orders = spark.read.parquet(f"{sf}/orders.parquet")
        customer = spark.read.parquet(f"{sf}/customer.parquet")
        nation = spark.read.parquet(f"{sf}/nation.parquet")
        return (
            orders.join(customer, orders.o_custkey == customer.c_custkey)
            .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
            .groupBy("n_name")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.round(
                    F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"),
                    2,
                ).alias("total_price"),
            )
        )

    q["join_orders_per_nation"] = join_orders_per_nation

    # --- window functions (SURVEY §2.5) ---
    def latest_event_per_user(spark, sf):
        from pyspark.sql import Window

        # NOTE(r6): deliberately NOT spread via ensure_min_partitions — the
        # window's own shuffle already redistributes, and the map side does
        # no heavy per-row work; an extra round-robin exchange of the
        # payload measured strictly worse (1.09s -> 1.81s median at sf1.0)
        ev = spark.read.parquet(f"{sf}/events.parquet")
        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        return (
            ev.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("user_id", "event_id", "event_type")
        )

    q["latest_event_per_user"] = latest_event_per_user

    # --- text analysis operators ---
    def token_counts(spark, sf):
        return with_token_count(_docs(spark, sf)).select(
            "doc_id", "n_tokens", "n_subwords_est"
        )

    q["token_counts"] = token_counts

    def quality_signals(spark, sf):
        return with_quality_signals(_docs(spark, sf)).select(
            "doc_id", "q_n_chars", "q_punct_ratio", "q_stopword_hits", "q_mean_word_len"
        )

    q["quality_signals"] = quality_signals

    def lang_guess_counts(spark, sf):
        return (
            with_lang_guess(_docs(spark, sf))
            .groupBy("lang", "lang_guess")
            .agg(F.count(F.lit(1)).alias("n_docs"))
        )

    q["lang_guess_counts"] = lang_guess_counts

    # --- dedup operators ---
    def exact_dup_groups(spark, sf):
        # the sf documents tables have no natural exact dups, so the HAVING
        # made this trivially green (0 rows vs 0 rows). Plant one whitespace
        # variant per doc so the normalize->fingerprint->group path is
        # actually exercised; the oracle mirrors the planting.
        docs = _docs(spark, sf).select("doc_id", "text")
        planted = docs.select(
            (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
            F.regexp_replace("text", " ", "  ").alias("text"),
        )
        return exact_duplicates(docs.unionByName(planted)).select(
            "canonical_id", "n_dups"
        )

    q["exact_dup_groups"] = exact_dup_groups

    def minhash_lsh_pairs(spark, sf):
        docs = _docs(spark, sf)
        sigs = minhash_signatures(docs, shingle_k=5, num_perm=64)
        bands = lsh_bands(sigs, num_bands=16, num_perm=64)
        pairs, _dropped = candidate_pairs(bands, bucket_cap=64)
        return pairs

    q["minhash_lsh_pairs"] = minhash_lsh_pairs

    def ngram_jaccard_top(spark, sf):
        # exact char-5-gram Jaccard over an explicit all-pairs set of
        # ASCII docs (byte 5-grams == char 5-grams only for ASCII text, and
        # DuckDB's substr is char-based) — fully oracle-checkable, unlike
        # the LSH-candidate variant (covered by minhash_lsh_pairs).
        docs = (
            _docs(spark, sf)
            .where(
                (F.col("doc_id") < 250)
                & (F.octet_length("text") == F.length("text"))
            )
            .select("doc_id", "text")
        )
        ids = docs.select("doc_id")
        pairs = (
            ids.select(F.col("doc_id").alias("a"))
            .crossJoin(ids.select(F.col("doc_id").alias("b")))
            .where(F.col("a") < F.col("b"))
        )
        return (
            ngram_jaccard_pairs(docs, pairs, shingle_k=5)
            .where(F.col("jaccard") >= 0.5)
            .select("a", "b")
        )

    q["ngram_jaccard_top"] = ngram_jaccard_top

    def simhash_fingerprints(spark, sf):
        return simhash_values(_docs(spark, sf), shingle_k=5)

    q["simhash_fingerprints"] = simhash_fingerprints

    def simhash_band_pairs(spark, sf):
        # SimHash fallback banding (SURVEY §2.10): pairs of docs sharing
        # any 16-bit piece of their 64-bit SimHash (Hamming-close pairs).
        # Oracle: pure SQL over the simhash golden parquet.
        from frizbee_spark.operators.dedup import simhash_candidate_pairs

        sims = simhash_values(_docs(spark, sf), shingle_k=5)
        return simhash_candidate_pairs(sims, num_pieces=4)

    q["simhash_band_pairs"] = simhash_band_pairs

    def extract_latest_text(spark, sf):
        # north_rule input invariant: extracted text per url is
        # byte-identical, latest capture wins per url. Documents are
        # dressed as web pages; every doc additionally gets an OLDER
        # recapture with corrupted text that extraction must discard.
        from frizbee_spark.pipeline.dedup_pipeline import extract_latest_per_url

        docs = _docs(spark, sf).select("doc_id", "text")
        pages = docs.select(
            F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
            F.to_timestamp(F.lit("2025-06-01 00:00:00")).alias("warc_ts"),
            "text",
        )
        stale = docs.select(
            F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
            F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
            F.concat(F.lit("STALE "), F.col("text")).alias("text"),
        )
        return extract_latest_per_url(pages.unionByName(stale)).select("url", "text")

    q["extract_latest_text"] = extract_latest_text

    # --- similarity search ---
    def ann_brute_force(spark, sf):
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        queries_df = emb.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return brute_force_top_k(emb, queries_df, k=5).select(
            "query_id", "vec_id", "rank"
        )

    q["ann_brute_force"] = ann_brute_force

    def ann_ivf(spark, sf):
        # IVF with nprobe == n_centroids probes every list, so the result
        # is EXACTLY brute force (each vector lives in one list) — the
        # plain-SQL brute-force ranking is therefore a true oracle for
        # the whole train/assign/probe/score plumbing. Recall at
        # nprobe < n_centroids is pytest-covered (tests/test_operators.py).
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        queries_df = emb.where((F.col("vec_id") >= 3) & (F.col("vec_id") < 6)).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return ivf_top_k(
            emb, queries_df, dim=64, k=5, n_centroids=8, nprobe=8
        ).select("query_id", "vec_id", "rank")

    q["ann_ivf"] = ann_ivf

    def ann_lsh_bucketed(spark, sf):
        # hyperplane-LSH blocking with plan-time-constant planes
        # (RandomState(7), the operator's deterministic seed): the oracle
        # re-derives the same planes and inlines them as SQL constants, so
        # DuckDB reproduces bucket assignment AND in-bucket ranking
        # exactly. Sign-flip safety: the smallest |dot| over all
        # (vector, plane) pairs at sf0.01 is 1.2e-4 — nine orders beyond
        # double-vs-double drift.
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        queries_df = emb.where(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return lsh_bucketed_top_k(
            emb, queries_df, dim=64, k=5, n_planes=8, seed=7
        ).select("query_id", "vec_id", "rank")

    q["ann_lsh_bucketed"] = ann_lsh_bucketed

    def embedding_cosine(spark, sf):
        # candidate pairs over a 40-vector slice; the operator's JVM
        # zip_with/aggregate dot product vs DuckDB's list_cosine_similarity
        # (3-decimal emission: nearest value sits 4.4e-5 from a rounding
        # boundary at sf0.01, orders of magnitude beyond cross-engine
        # float drift)
        emb = (
            spark.read.parquet(f"{sf}/embeddings.parquet")
            .where(F.col("vec_id") < 40)
            .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        )
        pairs = (
            emb.select(F.col("vec_id").alias("a"))
            .crossJoin(emb.select(F.col("vec_id").alias("b")))
            .where(F.col("a") < F.col("b"))
        )
        return (
            embedding_cosine_pairs(emb, pairs)
            .where(F.col("cosine") >= 0.2)
            .select("a", "b", F.round("cosine", 3).alias("cosine3"))
        )

    q["embedding_cosine_pairs"] = embedding_cosine

    # --- multimodal: REAL WAV decode under the driver oracle ---
    def audio_decode_meta(spark, sf):
        # synthesize a canonical WAV per document (n_chars frames at
        # 1 kHz, channel count varying by doc parity), then REAL-decode it
        # with featurize_audio (deterministic_fake=False: a decode failure
        # fails the query, no silent fallback). The emitted columns are
        # exactly the integers the WAV framing determines, so DuckDB can
        # derive them from the documents table alone.
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import BinaryType

        from frizbee_spark.operators.multimodal import featurize_audio

        @pandas_udf(BinaryType())
        def synth(doc_id: pd.Series, n_chars: pd.Series) -> pd.Series:
            import numpy as np

            from frizbee_spark.functions.audiocodec import encode_wav

            return pd.Series(
                [
                    encode_wav(np.zeros((int(n), 1 + int(i) % 2)), 1000)
                    for i, n in zip(doc_id, n_chars)
                ]
            )

        media = (
            spark.read.parquet(f"{sf}/documents.parquet")
            .where("doc_id < 300 AND n_chars >= 1")
            .select(
                F.col("doc_id").alias("media_id"),
                synth("doc_id", "n_chars").alias("payload"),
            )
        )
        return featurize_audio(media, deterministic_fake=False).select(
            "media_id", "sample_rate", "n_frames", "n_channels", "duration_ms"
        )

    q["audio_decode_meta"] = audio_decode_meta

    # --- multimodal: video frame-sampling fan-out under the driver oracle ---
    def video_frame_slices(spark, sf):
        # byte-slice "frames" over an ASCII-sanitized text payload: the
        # mapInPandas one-row-to-many fan-out is the real video contract;
        # frames decode back to strings so DuckDB can check content via
        # substring arithmetic.
        from frizbee_spark.operators.multimodal import sample_video_frames

        media = (
            spark.read.parquet(f"{sf}/documents.parquet")
            .where("doc_id < 200")
            .select(
                F.col("doc_id").alias("media_id"),
                F.encode(
                    F.regexp_replace(F.coalesce(F.col("text"), F.lit("")), "[^ -~]", ""),
                    "UTF-8",
                ).alias("payload"),
            )
        )
        return sample_video_frames(media, every_n_bytes=256, max_frames=4).select(
            "media_id",
            "frame_idx",
            F.decode(F.col("frame"), "UTF-8").alias("frame_text"),
        )

    q["video_frame_slices"] = video_frame_slices

    # --- the frizbee kernel itself (non-SQL; rows-only driver check) ---
    def match_fuzzy(spark, sf):
        return match_list(_docs(spark, sf), "spark join", Config(max_typos=1))

    q["match_fuzzy"] = match_fuzzy

    def match_fuzzy_no_prefilter(spark, sf):
        return match_list(_docs(spark, sf), "merge sort", Config(max_typos=None))

    q["match_fuzzy_no_prefilter"] = match_fuzzy_no_prefilter

    def match_multi_pattern(spark, sf):
        return match_query(_docs(spark, sf), "spark !window", Config(max_typos=1))

    q["match_multi_pattern"] = match_multi_pattern

    def match_fuzzy_long(spark, sf):
        # repeat(text, 5) pushes most haystacks past 1024 bytes, so the
        # kernel's greedy fallback path (not just the banded SW) runs
        # driver-green; the golden pin applies the identical repeat to the
        # scalar oracle (tools/gen_query_golden.py::golden_match_long)
        docs = _docs(spark, sf).select(
            "doc_id", F.expr("repeat(text, 5)").alias("text")
        )
        return match_list(docs, "spark join", Config(max_typos=1))

    q["match_fuzzy_long"] = match_fuzzy_long

    def match_fuzzy_unicode(spark, sf):
        # vowels -> umlauts on haystacks AND needle: the unicode SW arm
        # (kernel.py UnicodeKernel, not the ASCII fast path) runs
        # driver-green; the golden applies the identical translate to the
        # scalar oracle (tools/gen_query_golden.py::golden_match_unicode)
        docs = _docs(spark, sf).select(
            "doc_id", F.translate("text", "aeiou", "äëïöü").alias("text")
        )
        return match_list(docs, "spärk jöïn", Config(max_typos=1))

    q["match_fuzzy_unicode"] = match_fuzzy_unicode

    def match_sort_strategies(spark, sf):
        # all four SortStrategy orderings, each made hash-visible as a
        # rank column (the driver's canonicalizer sorts rows before
        # hashing, so bare row order cannot be checked). The global
        # single-partition window is deliberate and correctness-scale
        # only: it PINS the operator's ordering contract; the operator's
        # own ordered sort (a distributed range sort) is the scale path.
        from pyspark.sql import Window

        from frizbee_spark.core.config import SortStrategy
        from frizbee_spark.operators.match_list import _order_columns

        parts = []
        for strat in SortStrategy:
            cfg = Config(max_typos=1, sort=strat)
            ranked = match_list(_docs(spark, sf), "spark join", cfg).withColumn(
                "rank",
                F.row_number().over(Window.orderBy(*_order_columns(cfg, "doc_id"))),
            )
            parts.append(ranked.withColumn("strategy", F.lit(strat.value)))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.select("strategy", "rank", "doc_id", "score", "exact")

    q["match_sort_strategies"] = match_sort_strategies

    def match_indices(spark, sf):
        docs = _docs(spark, sf).where(F.col("doc_id") < 100)
        out = match_list_indices(docs, "spark join", Config(max_typos=0))
        # the driver canonicalizer can't hash array columns — emit csv
        return out.select(
            "doc_id",
            "score",
            "exact",
            F.array_join(
                F.transform("indices", lambda x: x.cast("string")), ","
            ).alias("indices_csv"),
        )

    q["match_indices"] = match_indices

    def substring_dedup(spark, sf):
        return substring_dedup_pairs(_docs(spark, sf), min_len=48, k=24)

    q["substring_dedup"] = substring_dedup

    return q


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------


def _lsh_oracle_sql() -> str:
    """Re-derive the operator's deterministic hyperplanes (RandomState(7),
    same as `hyperplane_buckets`) and inline them as SQL constants so
    DuckDB reproduces bucket assignment and in-bucket ranking exactly."""
    import numpy as np

    planes = np.random.RandomState(7).standard_normal((8, 64))
    terms = []
    for p in range(8):
        arr = ", ".join(repr(float(c)) for c in planes[p])
        terms.append(
            "(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), "
            f"[{arr}]) > 0 THEN {1 << p} ELSE 0 END)"
        )
    bucket = "\n                     + ".join(terms)
    return f"""
        WITH b AS (
            SELECT vec_id, embedding,
                   {bucket} AS bucket
            FROM embeddings
        )
        SELECT query_id, vec_id, rank FROM (
            SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC,
                                e.vec_id ASC
                   ) AS rank
            FROM b e JOIN b q ON e.bucket = q.bucket AND q.vec_id < 8
        ) WHERE rank <= 5
    """


def oracle_sql() -> dict[str, str]:
    sql = {
        "doc_length_filter": """
            SELECT doc_id, n_chars FROM documents
            WHERE octet_length(CAST(text AS BLOB)) >= 200
        """,
        "literal_substring": """
            SELECT doc_id FROM documents
            WHERE position('spark join' IN text) > 0
        """,
        "literal_prefix": """
            SELECT doc_id FROM documents WHERE starts_with(text, 'the ')
        """,
        "literal_suffix": """
            SELECT doc_id FROM documents WHERE text LIKE '%scan'
        """,
        "top_k_longest": """
            SELECT doc_id, n_chars FROM documents
            ORDER BY n_chars DESC, doc_id ASC LIMIT 50
        """,
        "agg_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
                   round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "join_orders_per_nation": """
            SELECT n_name, count(*) AS n_orders,
                   round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_price
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "latest_event_per_user": """
            SELECT user_id, event_id, event_type FROM (
                SELECT user_id, event_id, event_type,
                       row_number() OVER (
                           PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                       ) AS rn
                FROM events
            ) WHERE rn = 1
        """,
        "token_counts": r"""
            SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE array_length(regexp_split_to_array(trim(text), '\s+'))
                   END AS n_tokens,
                   CAST(floor(octet_length(CAST(text AS BLOB)) / 4) AS BIGINT) AS n_subwords_est
            FROM documents
        """,
        "quality_signals": r"""
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS q_n_chars,
                   round((length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')))
                         / greatest(length(text), 1), 4) AS q_punct_ratio,
                   CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE (
                       SELECT count(*) FROM (
                           SELECT DISTINCT unnest(string_split(
                               'the,a,an,and,or,of,to,in,is,it,that,for,on,as,with,was,at,by,be,this', ',')) AS sw
                       ) s WHERE list_contains(regexp_split_to_array(lower(trim(text)), '\s+'), s.sw)
                   ) END AS BIGINT) AS q_stopword_hits,
                   round(length(regexp_replace(text, '\s+', '', 'g'))
                         / greatest(array_length(regexp_split_to_array(lower(trim(text)), '\s+')), 1), 4)
                       AS q_mean_word_len
            FROM documents
        """,
        "lang_guess_counts": r"""
            SELECT lang,
                   CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
                        WHEN regexp_matches(text, '[\x{ac00}-\x{d7af}]') THEN 'ko'
                        WHEN regexp_matches(text, '[\x{0600}-\x{06ff}]') THEN 'ar'
                        WHEN regexp_matches(text, '[\x{0400}-\x{04ff}]') THEN 'ru'
                        ELSE 'latin' END AS lang_guess,
                   count(*) AS n_docs
            FROM documents GROUP BY lang, lang_guess
        """,
        "exact_dup_groups": r"""
            SELECT min(doc_id) AS canonical_id, count(*) AS n_dups
            FROM (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 10000000 AS doc_id,
                       regexp_replace(text, ' ', '  ', 'g') AS text
                FROM documents
            )
            GROUP BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g')
            HAVING count(*) > 1
        """,
        "ngram_jaccard_top": r"""
            WITH d AS (
                SELECT doc_id, text FROM documents
                WHERE doc_id < 250
                  AND octet_length(CAST(text AS BLOB)) = length(text)
            ),
            sh AS (
                SELECT doc_id,
                       list_distinct(
                           list_transform(
                               range(1, greatest(length(text) - 3, 1)),
                               i -> substr(text, CAST(i AS INTEGER), 5)
                           )
                       ) AS s
                FROM d
            )
            SELECT a, b FROM (
                SELECT x.doc_id AS a, y.doc_id AS b,
                       round(
                           len(list_intersect(x.s, y.s)) /
                           greatest(len(x.s) + len(y.s) - len(list_intersect(x.s, y.s)), 1),
                           6
                       ) AS jaccard
                FROM sh x JOIN sh y ON x.doc_id < y.doc_id
            ) WHERE jaccard >= 0.5
        """,
        "embedding_cosine_pairs": """
            WITH e AS (
                SELECT vec_id, embedding FROM embeddings WHERE vec_id < 40
            )
            SELECT a, b, cosine3 FROM (
                SELECT x.vec_id AS a, y.vec_id AS b,
                       round(round(CAST(list_cosine_similarity(x.embedding, y.embedding) AS DOUBLE), 6), 3) AS cosine3,
                       round(CAST(list_cosine_similarity(x.embedding, y.embedding) AS DOUBLE), 6) AS c6
                FROM e x JOIN e y ON x.vec_id < y.vec_id
            ) WHERE c6 >= 0.2
        """,
        "audio_decode_meta": """
            SELECT doc_id AS media_id,
                   1000 AS sample_rate,
                   n_chars AS n_frames,
                   CAST(1 + (doc_id % 2) AS INT) AS n_channels,
                   n_chars AS duration_ms
            FROM documents WHERE doc_id < 300 AND n_chars >= 1
        """,
        "video_frame_slices": """
            WITH d AS (
                SELECT doc_id,
                       regexp_replace(coalesce(text, ''), '[^ -~]', '', 'g') AS s
                FROM documents WHERE doc_id < 200
            ),
            n AS (
                SELECT doc_id, s,
                       least(4, greatest(1, length(s) // 256)) AS nf
                FROM d
            )
            SELECT doc_id AS media_id,
                   CAST(j AS INT) AS frame_idx,
                   substring(s, CAST(j * 256 + 1 AS INT), 256) AS frame_text
            FROM n, generate_series(0, 3) AS t(j) WHERE j < nf
        """,
        "ann_lsh_bucketed": _lsh_oracle_sql(),
        "ann_ivf": """
            SELECT query_id, vec_id, rank FROM (
                SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC,
                                    e.vec_id ASC
                       ) AS rank
                FROM embeddings e, embeddings q
                WHERE q.vec_id >= 3 AND q.vec_id < 6
            ) WHERE rank <= 5
        """,
        "ann_brute_force": """
            SELECT query_id, vec_id, rank FROM (
                SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC,
                                    e.vec_id ASC
                       ) AS rank
                FROM embeddings e, embeddings q
                WHERE q.vec_id < 3
            ) WHERE rank <= 5
        """,
    }
    # Golden oracles for the non-SQL-expressible operators, generated by
    # tools/gen_query_golden.py at sf0.01 (the driver's correctness scale):
    # the match_* goldens come from the SCALAR oracle path (core/matcher.py,
    # itself parity-tested against a compiled build of the reference), which
    # is independent of the vectorized kernel the Spark queries run; the
    # minhash/simhash/substring goldens come from a serial numpy
    # re-execution of the same published algorithms (stability pins).
    golden_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tests", "data", "golden_sf001"
    )
    for name in (
        "match_fuzzy",
        "match_fuzzy_no_prefilter",
        "match_multi_pattern",
        "match_indices",
        "match_fuzzy_long",
        "match_fuzzy_unicode",
        "match_sort_strategies",
        "simhash_fingerprints",
        "minhash_lsh_pairs",
        "substring_dedup",
    ):
        path = os.path.join(golden_dir, f"{name}.parquet")
        if os.path.exists(path):
            sql[name] = f"SELECT * FROM read_parquet('{path}')"
    # simhash BANDING is pure SQL over the simhash golden: arithmetic >>
    # then & 65535 equals Spark's shiftrightunsigned+mask for every
    # 16-bit piece (sign-extension only touches bits the mask drops)
    sim_golden = os.path.join(golden_dir, "simhash_fingerprints.parquet")
    if os.path.exists(sim_golden):
        sql["simhash_band_pairs"] = f"""
            WITH s AS (SELECT * FROM read_parquet('{sim_golden}')),
            pieces AS (
                SELECT doc_id, p.piece_id,
                       (simhash >> (p.piece_id * 16)) & 65535 AS piece
                FROM s, (SELECT UNNEST(range(4)) AS piece_id) p
            )
            SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
            FROM pieces x
            JOIN pieces y ON x.piece_id = y.piece_id AND x.piece = y.piece
            WHERE x.doc_id < y.doc_id
        """
    sql["extract_latest_text"] = """
        SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url, text FROM documents
    """
    return sql
