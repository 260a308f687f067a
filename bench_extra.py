#!/usr/bin/env python
"""Round-6 optimization instrumentation (bench.py stays FROZEN; this file
holds the extra measurements the optimization round needs):

  plans  — capture .explain("formatted") for every declared query into
           plans/r06/<query>_<suffix>.txt
  noop   — per-query wall time with the noop sink (guide §1.4): times the
           computation of every column, isolated from count()'s pruning
  dedup  — stage-by-stage wall times of the checkpointed DedupPipeline
           (the bench's dedup_end_to_end leg), labeled via job descriptions

Usage:
  python bench_extra.py plans [--suffix before|after] [--only q1,q2]
  python bench_extra.py noop  [--reps 3] [--only q1,q2]
  python bench_extra.py dedup [--reps 3]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import time

from bench import build_spark, dedup_end_to_end


def _queries():
    import __spark_entry__ as entry_mod

    return entry_mod.queries()


def cmd_plans(spark, sf_dir: str, suffix: str, only: set[str] | None) -> None:
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    for name, fn in _queries().items():
        if only and name not in only:
            continue
        df = fn(spark, sf_dir)
        try:
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception:  # API drift fallback: capture explain()'s stdout
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")


def cmd_noop(spark, sf_dir: str, reps: int, only: set[str] | None) -> None:
    results: dict[str, dict] = {}
    for name, fn in _queries().items():
        if only and name not in only:
            continue
        samples = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"noop:{name}")
            start = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - start, 4))
            spark.sparkContext.setJobDescription(None)
        results[name] = {
            "median": round(statistics.median(samples), 4),
            "reps": samples,
        }
        print(f"{name}: {results[name]}", flush=True)
    print(json.dumps({"metric": "noop_per_query", "sf_dir": sf_dir, "queries": results}))


def cmd_dedup(spark, sf_dir: str, reps: int) -> None:
    """Instrumented run of the SAME pipeline bench.dedup_end_to_end uses,
    with per-stage wall times (stage boundaries are the parquet writes)."""
    import shutil

    from pyspark.sql import functions as F

    from frizbee_spark.pipeline.dedup_pipeline import (
        DedupConfig,
        DedupPipeline,
        _fast_scratch_dir,
    )

    all_stage_times: list[dict[str, float]] = []
    for _ in range(reps):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        pages = docs.select(
            F.concat(F.lit("doc://"), F.col("doc_id")).alias("url"),
            F.to_timestamp(F.lit("2025-01-01 00:00:00")).alias("warc_ts"),
            F.encode("text", "utf-8").alias("html"),
            "text",
            "lang",
        )
        config = DedupConfig(
            num_perm=126,
            num_bands=18,
            bucket_cap=64,
            jaccard_threshold=0.7,
            sw_gate=0.6,
            min_band_collisions=1,
        )
        workdir = _fast_scratch_dir("frizbee_profile_dedup_")
        stage_times: dict[str, float] = {}
        try:
            pipeline = DedupPipeline(spark, workdir, config)
            t_all = time.perf_counter()
            prev = t_all
            for stage in pipeline.STAGES:
                spark.sparkContext.setJobDescription(f"dedup:{stage}")
                pipeline.run(pages, resume=True, stop_after=stage)
                now = time.perf_counter()
                stage_times[stage] = round(now - prev, 4)
                prev = now
            clusters = pipeline.run(pages, resume=True)
            spark.sparkContext.setJobDescription("dedup:final_count")
            clusters.count()
            spark.sparkContext.setJobDescription(None)
            stage_times["final_count"] = round(time.perf_counter() - prev, 4)
            stage_times["total"] = round(time.perf_counter() - t_all, 4)
        finally:
            shutil.rmtree(workdir, ignore_errors=True)
        all_stage_times.append(stage_times)
        print(json.dumps(stage_times), flush=True)
    med = {
        k: round(statistics.median([st[k] for st in all_stage_times]), 4)
        for k in all_stage_times[0]
    }
    print(json.dumps({"metric": "dedup_stage_walls", "median": med, "reps": reps}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["plans", "noop", "dedup"])
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    only = set(args.only.split(",")) if args.only else None
    try:
        if args.cmd == "plans":
            cmd_plans(spark, sf_dir, args.suffix, only)
        elif args.cmd == "noop":
            cmd_noop(spark, sf_dir, args.reps, only)
        else:
            cmd_dedup(spark, sf_dir, args.reps)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
