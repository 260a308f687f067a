"""The end-to-end near-duplicate detection + clustering pipeline
(north_star, BASELINE.json): web_pages -> text extraction -> MinHash
signatures -> LSH bands -> salted/capped candidate pairs -> verification
(exact n-gram Jaccard + the frizbee SW kernel on bounded windows) ->
large-star/small-star connected components -> cluster table.

Every stage writes a parquet checkpoint under `workdir` plus per-partition
lineage counters to `<workdir>/_lineage`; `run(resume=True)` (the default)
skips any stage whose checkpoint is already complete, so a killed job
restarts mid-pipeline (north_rule: resumable from checkpoint with
per-partition lineage + metrics).

Scale design (10^12 docs, 1000 executors):
- doc ids are 64-bit xxhash64(url): band rows and pair shuffles move 8-byte
  keys, never urls or texts. (At 10^12 keys the 64-bit birthday bound gives
  ~3e4 expected collisions — acceptable for dedup where a collision merges
  two random docs; a 128-bit (hash, hash') composite key is a drop-in if
  not.)
- candidate generation salts LSH buckets above bucket_cap (full pairing
  spread across salt-group tasks up to hard_cap; beyond that, within-salt
  pairing only — O(S*cap), *counted* in lineage, never silent O(S^2)).
- verification joins texts only for surviving pairs (pairs << docs), and
  the SW kernel scores bounded 256B/1024B windows so the greedy fallback
  never dominates.
- AQE handles residual skew; every stage boundary is a parquet checkpoint
  so a lost executor never recomputes more than one stage.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.config import CaseMatching, Config
from ..operators.dedup import candidate_pairs, lsh_bands, minhash_signatures
from .connected_components import connected_components


@dataclass
class DedupConfig:
    shingle_k: int = 5
    num_perm: int = 128
    #: 32 bands x 4 rows: P(candidate | jaccard 0.7) > 0.9997 while keeping
    #: the false-candidate rate at background jaccard ~0.05 near 1e-4
    num_bands: int = 32
    bucket_cap: int = 128
    #: candidate gate: a pair must collide in >= this many of the 32 r=4
    #: bands. At 2, background-similarity false candidates (~0.1 Jaccard
    #: between unrelated boilerplate pages) drop ~10x while true near-dups
    #: at Jaccard >= 0.7 still become candidates with P >= 0.997. Keep at 1
    #: for precision-oriented bandings (few bands x large r) where even
    #: true dups rarely collide twice.
    min_band_collisions: int = 2
    jaccard_threshold: float = 0.5
    #: pairs with jaccard in [sw_gate, threshold) get SW-kernel verification;
    #: below sw_gate they are rejected without scoring
    sw_gate: float = 0.3
    sw_ratio_threshold: float = 0.85
    sw_window: int = 256
    seed: int = 42


class DedupPipeline:
    STAGES = [
        "extract",
        "signatures",
        "bands",
        "pairs",
        "verify",
        "components",
        "clusters",
    ]

    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        config: DedupConfig | None = None,
    ):
        self.spark = spark
        self.workdir = workdir
        self.config = config or DedupConfig()

    # -- checkpoint plumbing --

    def _path(self, stage: str) -> str:
        return os.path.join(self.workdir, stage)

    def _done(self, stage: str) -> bool:
        return os.path.exists(os.path.join(self._path(stage), "_SUCCESS"))

    def _write(self, stage: str, df: DataFrame) -> DataFrame:
        path = self._path(stage)
        df.write.mode("overwrite").parquet(path)
        out = self.spark.read.parquet(path)
        self._record_lineage(stage, out)
        return out

    def _read(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._path(stage))

    def _record_lineage(self, stage: str, df: DataFrame) -> None:
        """Per-partition row counters for the stage output."""
        counts = (
            df.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("rows"))
            .withColumn("stage", F.lit(stage))
            .select("stage", "partition_id", "rows")
        )
        counts.write.mode("append").parquet(os.path.join(self.workdir, "_lineage"))

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.workdir, "_lineage"))

    # -- stages --

    def _stage_extract(self, pages: DataFrame) -> DataFrame:
        """Text extraction: byte-identical `text` per url (input invariant);
        latest capture wins per url (extract_latest_per_url)."""
        return extract_latest_per_url(pages).select(
            "url",
            F.xxhash64("url").alias("doc_id"),
            "text",
            "lang",
            "warc_ts",
        )

    def _stage_signatures(self, docs: DataFrame) -> DataFrame:
        c = self.config
        return minhash_signatures(
            docs,
            text_col="text",
            id_col="doc_id",
            shingle_k=c.shingle_k,
            num_perm=c.num_perm,
            seed=c.seed,
        )

    def _stage_bands(self, signatures: DataFrame) -> DataFrame:
        return lsh_bands(
            signatures,
            id_col="doc_id",
            num_bands=self.config.num_bands,
            num_perm=self.config.num_perm,
        )

    def _stage_pairs(self, bands: DataFrame) -> DataFrame:
        pairs, sampled = candidate_pairs(
            bands,
            id_col="doc_id",
            bucket_cap=self.config.bucket_cap,
            min_band_collisions=self.config.min_band_collisions,
        )
        sampled_counts = sampled.agg(
            F.coalesce(F.count(F.lit(1)), F.lit(0)).alias("n_buckets"),
            F.coalesce(F.sum("bucket_size"), F.lit(0)).alias("n_members"),
        ).collect()[0]
        self._record_scalars(
            [
                ("pairs.sampled_buckets", int(sampled_counts["n_buckets"])),
                ("pairs.sampled_members", int(sampled_counts["n_members"])),
            ]
        )
        return pairs

    def _record_scalars(self, items: list[tuple[str, int]]) -> None:
        rows = [(name, -1, value) for name, value in items]
        self.spark.createDataFrame(
            rows, ["stage", "partition_id", "rows"]
        ).coalesce(1).write.mode("append").parquet(
            os.path.join(self.workdir, "_lineage")
        )

    def _stage_verify(self, pairs: DataFrame, docs: DataFrame) -> DataFrame:
        self._verify_registry: list = []
        return verify_pairs(
            pairs,
            docs,
            self.config,
            signatures=self._read("signatures"),
            persist_registry=self._verify_registry,
        )

    def _stage_components(self, edges: DataFrame) -> DataFrame:
        cc_dir = os.path.join(self.workdir, "_cc_checkpoints")
        return connected_components(
            self.spark, edges.select("a", "b"), checkpoint_dir=cc_dir
        )

    def _stage_clusters(self, docs: DataFrame, components: DataFrame) -> DataFrame:
        """Final table: (url, doc_id, cluster_id, is_canonical, text). Docs
        without any verified edge form singleton clusters."""
        assigned = docs.join(
            components.withColumnRenamed("node", "doc_id"), "doc_id", "left"
        ).withColumn("cluster_id", F.coalesce("component", "doc_id"))
        canonical = assigned.groupBy("cluster_id").agg(
            F.min("doc_id").alias("_canon")
        )
        return (
            assigned.join(canonical, "cluster_id")
            .withColumn("is_canonical", F.col("doc_id") == F.col("_canon"))
            .select("url", "doc_id", "cluster_id", "is_canonical", "lang", "text")
        )

    # -- driver --

    def run(
        self,
        pages: DataFrame | None = None,
        resume: bool = True,
        stop_after: str | None = None,
    ) -> DataFrame | None:
        """Run (or resume) the pipeline. `stop_after` simulates a mid-run
        kill after the named stage (for resume testing). Returns the final
        cluster DataFrame, or None when stopped early."""

        def finished(stage: str) -> bool:
            return resume and self._done(stage)

        if not finished("extract"):
            if pages is None:
                raise ValueError("extract stage needs the input pages DataFrame")
            self._write("extract", self._stage_extract(pages))
        if stop_after == "extract":
            return None
        docs = self._read("extract")

        if not finished("signatures"):
            self._write("signatures", self._stage_signatures(docs))
        if stop_after == "signatures":
            return None

        if not finished("bands"):
            self._write("bands", self._stage_bands(self._read("signatures")))
        if stop_after == "bands":
            return None

        if not finished("pairs"):
            self._write("pairs", self._stage_pairs(self._read("bands")))
        if stop_after == "pairs":
            return None

        if not finished("verify"):
            self._write("verify", self._stage_verify(self._read("pairs"), docs))
            for cached in getattr(self, "_verify_registry", []):
                cached.unpersist()
            self._verify_registry = []
        if stop_after == "verify":
            return None

        if not finished("components"):
            self._write("components", self._stage_components(self._read("verify")))
        if stop_after == "components":
            return None

        if not finished("clusters"):
            self._write(
                "clusters", self._stage_clusters(docs, self._read("components"))
            )
        return self._read("clusters")


def extract_latest_per_url(pages: DataFrame) -> DataFrame:
    """Latest capture wins per url, without shuffling page payloads for
    the (typically dominant) urls captured exactly once.

    A global window over url would shuffle every html+text payload only to
    pick winners inside ~singleton groups. Instead the RECAPTURED url set
    (urls with >1 capture — small on snapshot-style inputs) is computed
    from the url column alone (column-pruned scan, 8-byte-ish shuffle) and
    broadcast: single-capture pages stream through a broadcast anti-join
    with NO payload shuffle, and only the recaptured subset pays the
    window. On recapture-heavy corpora where that set outgrows broadcast,
    pass recapture_strategy='window' semantics by calling the plain window
    path — the split is an optimization, not a semantic change."""
    from pyspark.sql import Window

    recaptured = (
        pages.groupBy("url")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > 1)
        .select("url")
    )
    singles = pages.join(F.broadcast(recaptured), "url", "left_anti")
    w = Window.partitionBy("url").orderBy(F.desc("warc_ts"))
    latest_dups = (
        pages.join(F.broadcast(recaptured), "url", "left_semi")
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    return singles.unionByName(latest_dups)


def verify_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    config: DedupConfig,
    signatures: DataFrame | None = None,
    persist_registry: list | None = None,
) -> DataFrame:
    """Candidate-pair verification, cheapest-signal-first (the reference's
    own staging philosophy, matcher/algo.rs: length filter -> prefilter ->
    SW):

    1. MinHash-estimated Jaccard from the already-computed signatures
       (128 x 8B per doc — ~15x smaller than shingle sets). est error is
       ~sqrt(j(1-j)/128) <= 0.045, so pairs with est far from the decision
       boundary are accepted/rejected outright.
    2. exact n-gram Jaccard for the narrow est-boundary band — per-DOC
       shingle sets are computed once (one Arrow pass over the distinct
       docs in boundary pairs), then intersected JVM-side with
       array_intersect; a doc appearing in P pairs is never shingled P
       times.
    3. the frizbee SW kernel on bounded windows only for exact-jaccard
       borderline pairs (typo-level rewrites that shift many shingles).

    Multi-consumer intermediates (est, mid_scored) are materialized ONCE
    via eager columnar persist (persist + count) — an eager but fully
    parallel stage boundary. A lazy persist instead lets the three output
    branches race the cache inside the caller's single action and
    recompute the join chain concurrently (observed 3x); a barrier whose
    work is parallel costs scheduling noise, a race costs whole stages.
    Columnar cache batches (not per-row checkpoint objects) keep millions
    of intermediate rows GC-cheap. Cached frames are appended to
    `persist_registry` so long-lived callers can unpersist after the final
    union materializes; otherwise the ContextCleaner reclaims them.

    Returns (a, b, jaccard, sw_ratio) for accepted pairs."""
    c = config
    shingle_k = c.shingle_k
    window = c.sw_window
    sw_config = Config(max_typos=None, casing=CaseMatching.IGNORE)
    est_hi = c.jaccard_threshold + 0.12
    est_lo = max(0.0, c.sw_gate - 0.08)
    registry = persist_registry if persist_registry is not None else []

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, DoubleType, LongType

    if signatures is None:
        signatures = minhash_signatures(
            docs, text_col="text", id_col="doc_id",
            shingle_k=c.shingle_k, num_perm=c.num_perm, seed=c.seed,
        )

    sig_a = signatures.select(F.col("doc_id").alias("a"), F.col("signature").alias("sig_a"))
    sig_b = signatures.select(F.col("doc_id").alias("b"), F.col("signature").alias("sig_b"))

    # signature-agreement estimate entirely JVM-side: zip_with equality +
    # aggregate sum inside codegen. No Arrow round-trip of 2x128x8B arrays
    # per pair to Python for what is an elementwise compare.
    est_expr = F.aggregate(
        F.zip_with(
            "sig_a", "sig_b", lambda x, y: F.when(x == y, 1).otherwise(0)
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.greatest(F.size("sig_a"), F.lit(1))

    # ONE eager parallel materialization (columnar persist + count):
    # three branches scan est, and a lazy persist lets them race the cache
    # and recompute the pair-join chain concurrently (observed 3x
    # recompute). Columnar cache batches keep the rows GC-cheap.
    est = (
        pairs.hint("shuffle_hash").join(sig_a, "a")
        .hint("shuffle_hash").join(sig_b, "b")
        .select("a", "b", F.round(est_expr, 6).alias("est"))
        .persist()
    )
    est.count()
    registry.append(est)

    accepted_est = est.where(F.col("est") >= est_hi).select(
        "a", "b", F.col("est").alias("jaccard"), F.lit(1.0).alias("sw_ratio")
    )
    middle = est.where((F.col("est") >= est_lo) & (F.col("est") < est_hi))

    # exact shingle Jaccard for the est-boundary band: shingle each distinct
    # doc ONCE, intersect JVM-side (no per-pair Python set work)
    @pandas_udf(ArrayType(LongType()))
    def shingles_udf(texts: pd.Series) -> pd.Series:
        from ..functions.hashing import hash_shingles

        out = []
        for t in texts.fillna(""):
            data = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
            out.append(np.unique(hash_shingles(data, shingle_k)).astype(np.int64))
        return pd.Series(out)

    mid_ids = (
        middle.select(F.col("a").alias("doc_id"))
        .unionAll(middle.select(F.col("b").alias("doc_id")))
        .distinct()
    )
    sh = docs.join(mid_ids, "doc_id", "left_semi").select(
        "doc_id", shingles_udf("text").alias("sh")
    )
    sh_a = sh.select(F.col("doc_id").alias("a"), F.col("sh").alias("sh_a"))
    sh_b = sh.select(F.col("doc_id").alias("b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    mid_scored = (
        middle.hint("shuffle_hash").join(sh_a, "a")
        .hint("shuffle_hash").join(sh_b, "b")
        .select(
            "a",
            "b",
            F.round(
                F.when((F.size("sh_a") == 0) & (F.size("sh_b") == 0), F.lit(1.0))
                .otherwise(inter / F.greatest(union, F.lit(1))),
                6,
            ).alias("jaccard"),
        )
        .persist()  # two branches scan it (accepted + borderline)
    )
    mid_scored.count()
    registry.append(mid_scored)

    accepted_exact = mid_scored.where(
        F.col("jaccard") >= c.jaccard_threshold
    ).select("a", "b", "jaccard", F.lit(1.0).alias("sw_ratio"))
    borderline = mid_scored.where(
        (F.col("jaccard") >= c.sw_gate) & (F.col("jaccard") < c.jaccard_threshold)
    )

    @pandas_udf(DoubleType())
    def sw_ratio_udf(ta: pd.Series, tb: pd.Series) -> pd.Series:
        from ..kernel import match_batch

        out = np.zeros(len(ta))
        ta = ta.fillna("")
        tb = tb.fillna("")
        for i, (x, y) in enumerate(zip(ta, tb)):
            short, other = (x, y) if len(x) <= len(y) else (y, x)
            needle = short[:window]
            if not needle:
                out[i] = 1.0
                continue
            hay = other[: 4 * window]
            res = match_batch(needle, [hay, needle], sw_config)
            self_score = int(res.score[1])
            out[i] = int(res.score[0]) / self_score if self_score else 0.0
        return pd.Series(out)

    # texts join only for the (small) borderline set needing SW rescue
    texts_a = docs.select(F.col("doc_id").alias("a"), F.col("text").alias("text_a"))
    texts_b = docs.select(F.col("doc_id").alias("b"), F.col("text").alias("text_b"))
    rescued = (
        borderline.hint("shuffle_hash").join(texts_a, "a")
        .hint("shuffle_hash").join(texts_b, "b")
        .withColumn("sw_ratio", F.round(sw_ratio_udf("text_a", "text_b"), 6))
        .where(F.col("sw_ratio") >= c.sw_ratio_threshold)
        .select("a", "b", "jaccard", "sw_ratio")
    )
    return accepted_est.unionByName(accepted_exact).unionByName(rescued)

def dedup_pages_single_dag(
    spark: SparkSession, pages: DataFrame, config: DedupConfig | None = None
) -> DataFrame:
    """The same dedup job as DedupPipeline but as one lazy DAG with in-memory
    persists instead of per-stage parquet checkpoints — used for throughput /
    scaling measurement where stage-materialization IO would otherwise
    dominate small runs. Returns the cluster table (url, doc_id, cluster_id)."""
    c = config or DedupConfig()

    # one eager parallel materialization per multi-consumer stage (columnar
    # persist + count): lazy persists make concurrent consumers race the
    # cache and recompute the expensive UDF chains (extract is consumed by
    # signatures/shingles/texts/clusters; signatures by bands and both est
    # join sides), while row-object checkpoints (localCheckpoint) put every
    # intermediate row on the GC heap — at ~400k docs that alone showed up
    # as ~1s young-GC pauses stalling all task threads.
    docs = (
        extract_latest_per_url(pages)
        .select("url", F.xxhash64("url").alias("doc_id"), "text", "lang")
        .persist()
    )
    docs.count()
    sigs = minhash_signatures(
        docs, text_col="text", id_col="doc_id",
        shingle_k=c.shingle_k, num_perm=c.num_perm, seed=c.seed,
    ).persist()
    sigs.count()
    bands = lsh_bands(
        sigs, id_col="doc_id", num_bands=c.num_bands, num_perm=c.num_perm
    )
    pairs, _sampled = candidate_pairs(
        bands,
        id_col="doc_id",
        bucket_cap=c.bucket_cap,
        min_band_collisions=c.min_band_collisions,
    )
    verified = verify_pairs(pairs, docs, c, signatures=sigs)
    # driver_threshold=0: the measured throughput path must never serialize
    # clustering through a driver loop — distributed star contraction only
    components = connected_components(
        spark, verified.select("a", "b"), driver_threshold=0
    )
    clusters = docs.join(
        components.withColumnRenamed("node", "doc_id"), "doc_id", "left"
    ).select(
        "url", "doc_id", F.coalesce("component", "doc_id").alias("cluster_id")
    )
    return clusters
