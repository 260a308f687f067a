"""Two-cluster-size scaling evidence (north_rule): run the IDENTICAL dedup
job on the IDENTICAL input at local[8] and local[32] — the sandbox stand-in
for N vs 4N executors — and report docs/sec at both plus scaling
efficiency = throughput_32 / (4 * throughput_8).

The input is a deterministic synthetic Common-Crawl-style corpus generated
once (executor-side, seed-stable) and shared by both runs; it is sized so
per-core compute dominates fixed session costs, as it would at 100 TB.
Each measurement runs in its own JVM (subprocess). Also records the sf0.1
bench.py suite at both levels. Writes BENCH/BASELINE.md.

Usage:
    python tools/run_scaling_bench.py            # full run
    python tools/run_scaling_bench.py --worker <cpus> <corpus> # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent
CORPUS = os.environ.get("SCALING_CORPUS", "/tmp/frizbee_scaling_corpus.parquet")
N_BASE = int(os.environ.get("SCALING_N_BASE", "240000"))


def _build_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"frizbee-scaling-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(8, cpus)))
        .config("spark.default.parallelism", str(max(8, cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SCALING_DRIVER_MEM", "48g"))
        # shuffle/spill files on tmpfs: a cluster executor's local SSD
        # stand-in — this VM's /tmp sits on slow virtio disk, which
        # otherwise serializes shuffle-heavy stages behind IO
        .config("spark.local.dir", _local_dir())
        .getOrCreate()
    )


def _local_dir() -> str:
    base = "/dev/shm/frizbee-spark-local" if os.path.isdir("/dev/shm") else "/tmp"
    os.makedirs(base, exist_ok=True)
    return base


def worker(cpus: int, corpus_path: str) -> None:
    sys.path.insert(0, str(REPO))
    from frizbee_spark.pipeline.dedup_pipeline import dedup_pages_single_dag

    spark = _build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(corpus_path)
    # warm up python workers + JVM before timing
    pages.limit(10).count()
    n_docs = pages.count()

    start = time.perf_counter()
    clusters = dedup_pages_single_dag(spark, pages)
    n_clusters = clusters.select("cluster_id").distinct().count()
    wall = time.perf_counter() - start
    spark.stop()
    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_docs": n_docs,
                "n_clusters": n_clusters,
                "wall_sec": round(wall, 3),
                "docs_per_sec": round(n_docs / wall, 2),
            }
        )
    )


def ensure_corpus() -> None:
    if os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        return
    sys.path.insert(0, str(REPO))
    from frizbee_spark.pipeline.webpages import generate_pages_distributed

    spark = _build_spark(32)
    spark.sparkContext.setLogLevel("ERROR")
    pages = generate_pages_distributed(spark, n_base=N_BASE, seed=1234, partitions=64)
    pages.write.mode("overwrite").parquet(CORPUS)
    spark.stop()


def run_subprocess(cpus: int) -> dict:
    # Pin the whole process tree (JVM task threads + Python UDF workers +
    # GC/shuffle threads) to exactly `cpus` cores. Without this, a
    # local[8] run on a 32-core box uses ~16-24 cores (the JVM blocks on
    # Arrow while separate Python workers burn their own cores), which
    # inflates the small-cluster baseline and fakes a scaling regression.
    # taskset makes local[N] a faithful stand-in for an N-core cluster.
    cmd = [sys.executable, __file__, "--worker", str(cpus), CORPUS]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    proc = subprocess.run(
        cmd,
        capture_output=True,
        text=True,
        cwd=str(REPO),
    )
    if proc.returncode != 0:
        raise RuntimeError(f"scaling worker local[{cpus}] failed:\n{proc.stderr[-4000:]}")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    ensure_corpus()
    low_cpus = int(os.environ.get("SCALING_LOW", "8"))
    high_cpus = int(os.environ.get("SCALING_HIGH", "32"))
    # this sandbox VM shows 10-20% hypervisor CPU steal; best-of-N is the
    # standard noise-robust wall-clock estimator
    reps = int(os.environ.get("SCALING_REPS", "2"))
    low = min((run_subprocess(low_cpus) for _ in range(reps)), key=lambda r: r["wall_sec"])
    high = min((run_subprocess(high_cpus) for _ in range(reps)), key=lambda r: r["wall_sec"])
    ratio = high_cpus / low_cpus
    eff = (high["docs_per_sec"] / low["docs_per_sec"]) / ratio

    # consistency: the job is deterministic, so cluster counts must agree
    consistent = low["n_clusters"] == high["n_clusters"]

    out = REPO / "BENCH" / "BASELINE.md"
    out.parent.mkdir(exist_ok=True)
    lines = [
        "# BENCH/BASELINE — two-cluster-size scaling evidence",
        "",
        "North-rule criterion: throughput scaling efficiency >= 0.8 between N",
        "and 4N executors, evidenced in this sandbox by running the identical",
        f"dedup job on the identical input at `local[{low_cpus}]` and "
        f"`local[{high_cpus}]` (driver instruction / BASELINE.md §2).",
        "",
        "## Workload",
        "",
        f"Deterministic synthetic Common-Crawl-style corpus ({low['n_docs']:,} pages,",
        f"{N_BASE:,} base docs + planted near-dup variants, seed 1234), shared",
        "parquet input. Job = extract -> MinHash(128 perms) -> LSH(32x4) ->",
        "capped candidate pairs -> est/exact-Jaccard + SW verify -> connected",
        "components -> cluster table (single DAG, in-memory persists).",
        "",
        "## Results",
        "",
        "| parallelism | wall sec | docs/sec | clusters |",
        "|---|---|---|---|",
        f"| local[{low_cpus}] (N) | {low['wall_sec']} | {low['docs_per_sec']} | {low['n_clusters']} |",
        f"| local[{high_cpus}] (4N) | {high['wall_sec']} | {high['docs_per_sec']} | {high['n_clusters']} |",
        "",
        f"**Scaling efficiency = ({high['docs_per_sec']} / {low['docs_per_sec']}) / {int(ratio)} "
        f"= {eff:.3f}**  (target >= 0.8)",
        "",
        f"Deterministic output check: cluster counts {'MATCH' if consistent else 'DIFFER'} "
        "across parallelism levels.",
        "",
        "## Raw worker outputs",
        "",
        "```json",
        json.dumps(low),
        json.dumps(high),
        "```",
    ]
    out.write_text("\n".join(lines) + "\n")
    print(json.dumps({"efficiency": round(eff, 3), "low": low, "high": high}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), sys.argv[3])
    else:
        main()
