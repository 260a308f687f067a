"""Profile dedup_pages_single_dag segment-by-segment at a given core count.

Replicates the stage-cut job but times each materialization and writes a
Spark event log for stage-level analysis (tools/analyze_eventlog.py).

    python tools/profile_dedup.py <cpus> [corpus]

Prints one JSON line with per-segment wall seconds.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    cpus = int(sys.argv[1])
    corpus = sys.argv[2] if len(sys.argv) > 2 else "/tmp/frizbee_scaling_corpus.parquet"
    evlog = os.environ.get("PROFILE_EVLOG", "/tmp/spark-events")
    os.makedirs(evlog, exist_ok=True)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from frizbee_spark.runtime import apply_allocator_env

    aqe = os.environ.get("PROFILE_AQE", "true")
    mem = os.environ.get("PROFILE_DRIVER_MEM", "48g")
    jopts = os.environ.get("PROFILE_JAVA_OPTS", "")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"profile-dedup-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(8, cpus)))
        .config("spark.default.parallelism", str(max(8, cpus)))
        .config("spark.sql.adaptive.enabled", aqe)
        .config("spark.sql.adaptive.skewJoin.enabled", aqe)
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", evlog)
        .config("spark.driver.memory", mem)
        .config("spark.driver.extraJavaOptions", jopts)
        .config("spark.local.dir", "/dev/shm/frizbee-spark-local")
    )
    spark = apply_allocator_env(builder).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from frizbee_spark.operators.dedup import candidate_pairs, lsh_bands, minhash_signatures
    from frizbee_spark.pipeline.connected_components import connected_components
    from frizbee_spark.pipeline.dedup_pipeline import (
        DedupConfig,
        _fast_scratch_dir,
        extract_latest_per_url,
        verify_pairs,
    )

    c = DedupConfig()
    pages = spark.read.parquet(corpus)
    pages.limit(10).count()
    n_docs = pages.count()
    # warm python workers (spawn + imports) outside the timed region, one
    # per core — steady-state throughput is what the scaling rule measures
    warm = spark.range(0, cpus * 8, 1, cpus).select(
        F.col("id").alias("doc_id"), F.lit("warmup text for workers").alias("text")
    )
    minhash_signatures(warm, num_perm=8, shingle_k=5).count()

    workdir = _fast_scratch_dir("frizbee_profile_")
    seg: dict[str, float] = {}
    t0 = time.perf_counter()

    def mark(name: str):
        nonlocal t0
        t = time.perf_counter()
        seg[name] = round(t - t0, 2)
        t0 = t

    def cut(df, name):
        path = os.path.join(workdir, name)
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    docs = cut(
        extract_latest_per_url(pages).select(
            "url", F.xxhash64("url").alias("doc_id"), "text", "lang"
        ),
        "docs",
    )
    mark("extract")

    sigs = cut(
        minhash_signatures(
            docs, text_col="text", id_col="doc_id",
            shingle_k=c.shingle_k, num_perm=c.num_perm, seed=c.seed,
        ),
        "sigs",
    )
    mark("signatures")

    bands = lsh_bands(sigs, id_col="doc_id", num_bands=c.num_bands, num_perm=c.num_perm)
    pairs, _sampled = candidate_pairs(
        bands, id_col="doc_id",
        bucket_cap=c.bucket_cap, min_band_collisions=c.min_band_collisions,
        scratch_dir=workdir,
    )
    pairs = cut(pairs, "pairs")
    n_pairs = pairs.count()
    mark("pairs")

    verified = cut(
        verify_pairs(pairs, docs, c, signatures=sigs, scratch_dir=workdir),
        "verify",
    )
    n_edges = verified.count()
    mark("verify")

    cc_registry: list = []
    components = connected_components(
        spark, verified.select("a", "b"), driver_threshold=0,
        input_materialized=True, persist_registry=cc_registry,
    )
    clusters = docs.join(
        components.withColumnRenamed("node", "doc_id"), "doc_id", "left"
    ).select("url", "doc_id", F.coalesce("component", "doc_id").alias("cluster_id"))
    n_clusters = clusters.select("cluster_id").distinct().count()
    mark("cc_and_count")

    total = sum(seg.values())
    print(json.dumps({
        "cpus": cpus, "n_docs": n_docs, "n_pairs": n_pairs, "n_edges": n_edges,
        "n_clusters": n_clusters, "segments": seg, "total": round(total, 2),
        "docs_per_sec": round(n_docs / total, 1),
        "app_id": spark.sparkContext.applicationId,
    }))
    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
