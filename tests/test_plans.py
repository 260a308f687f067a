"""Physical-plan quality gates: the optimizations we rely on at 100 TB must
actually appear in the executed plans (column pruning into the scan,
broadcast for small dimensions, partial aggregation, no UDF before the
cheap filter)."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from frizbee_spark.core.config import Config
from frizbee_spark.operators.dedup import exact_duplicates
from frizbee_spark.operators.match_list import match_list

pytestmark = pytest.mark.spark


def plan_of(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def test_match_list_prunes_columns_and_prefilters(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = match_list(docs, "spark join", Config(max_typos=1))
    plan = plan_of(df)
    # only doc_id + text reach the scan — lang/source/n_chars pruned
    assert "ReadSchema" in plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "doc_id" in read_schema and "text" in read_schema
    assert "lang" not in read_schema and "source" not in read_schema
    # the SQL length filter runs before the Arrow UDF projection
    assert "octet_length" in plan
    assert "ArrowEvalPython" in plan or "EvalPython" in plan
    filter_pos = plan.index("octet_length")
    udf_pos = plan.index("EvalPython")
    # formatted plans list operators bottom-up in the tree section; just
    # assert both exist and the filter is in the scan's PushedFilters OR a
    # Filter node below the python eval
    assert filter_pos > 0 and udf_pos > 0


def test_broadcast_join_for_small_dimension(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    df = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = plan_of(df, mode="simple")
    assert "BroadcastHashJoin" in plan


def test_exact_dedup_uses_partial_aggregation(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = plan_of(exact_duplicates(docs), mode="simple")
    # map-side combine: two HashAggregate levels around the exchange
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan
    # the shuffle key is the 64-bit fingerprint, not the text
    exchange_lines = [l for l in plan.splitlines() if "Exchange" in l]
    assert any("fingerprint" in l for l in exchange_lines)
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l or "Scan" in l]
    assert read_schema


def test_predicate_pushdown_reaches_parquet(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    df = li.where(F.col("l_quantity") > 40).select("l_orderkey", "l_quantity")
    plan = plan_of(df)
    assert "PushedFilters" in plan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "l_quantity" in pushed


def test_match_query_single_fused_eval(spark, sf_dir):
    """multi.rs:84-152 is ONE fused Arrow pass (survivor refinement via
    numpy masks INSIDE the UDF), and the nondeterministic marker keeps the
    optimizer from duplicating that eval for the matched-filter
    (optimization guide §4.4) — the round-5 plans carried TWO
    ArrowEvalPython nodes, re-scoring every surviving row."""
    from frizbee_spark.operators.match_list import match_query

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = match_query(docs, "spark !window", Config(max_typos=1))
    plan = plan_of(df, mode="simple")
    lines = plan.splitlines()
    evals = [i for i, l in enumerate(lines) if "EvalPython" in l]
    match_filters = [
        i for i, l in enumerate(lines) if "Filter" in l and ".matched" in l
    ]
    # exactly one eval for the whole multi-pattern query...
    assert len(evals) == 1, plan
    # ...with the matched-filter consuming it from above (plans print
    # top-down, so the filter's line precedes the eval's)
    assert any(f < evals[0] for f in match_filters), plan


def test_match_list_single_eval_and_full_width(spark, sf_dir):
    """Two round-6 plan properties of the single-pattern path: (1) the
    nondeterministic marker leaves exactly ONE ArrowEvalPython (no
    filter/projection duplication — guide §4.4); (2) an unsplittable
    single-row-group scan is spread across the session's cores before the
    per-row Python stage (runtime.ensure_min_partitions), so the kernel
    never runs at file width."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = match_list(docs, "spark join", Config(max_typos=1))
    plan = plan_of(df, mode="simple")
    assert plan.count("ArrowEvalPython") == 1, plan
    assert "RoundRobinPartitioning" in plan, plan


def test_ann_plans_stay_jvm_side(spark, sf_dir):
    """The whole ANN family (brute/LSH/IVF) and embedding-cosine pairs
    must plan with ZERO Python eval nodes — centroids/planes are folded
    into JVM expressions; a Python node here would put every vector
    through Arrow serialization at 100 TB."""
    from frizbee_spark.operators.dedup import embedding_cosine_pairs
    from frizbee_spark.operators.similarity import (
        brute_force_top_k,
        ivf_top_k,
        lsh_bucketed_top_k,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    pairs = spark.createDataFrame([(0, 1), (1, 2)], ["a", "b"])

    plans = {
        "brute": plan_of(brute_force_top_k(emb, queries, k=3)),
        "lsh": plan_of(
            lsh_bucketed_top_k(emb, queries, dim=64, k=3, n_planes=6, n_probes=3)
        ),
        "ivf": plan_of(
            ivf_top_k(emb, queries, dim=64, k=3, n_centroids=4, nprobe=2)
        ),
        "cosine_pairs": plan_of(embedding_cosine_pairs(emb, pairs)),
    }
    for name, plan in plans.items():
        assert "EvalPython" not in plan and "InPandas" not in plan, name
    # the small probe/query side broadcasts; the big side never does
    for name in ("brute", "lsh", "ivf"):
        assert "BroadcastExchange" in plans[name], name


def test_multimodal_plans_prune_payload_and_use_arrow(spark, tmp_path):
    """Multimodal decode stages: only (media_id, payload) reach the
    parquet scan feeding the mapInPandas decode — kind/mime/width etc.
    are pruned — and the decode itself is an Arrow mapInPandas node,
    the one place Python is the right tool."""
    from frizbee_spark.operators.multimodal import (
        decode_and_featurize,
        featurize_audio,
        sample_video_frames,
    )

    src = spark.createDataFrame(
        [(0, "image", b"x", "m", 1, 1, 1)],
        "media_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms long",
    )
    path = str(tmp_path / "media.parquet")
    src.write.parquet(path)
    df = spark.read.parquet(path)
    for fn in (decode_and_featurize, featurize_audio, sample_video_frames):
        plan = plan_of(fn(df))
        assert "MapInPandas" in plan, fn.__name__
        read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
        assert "media_id" in read_schema and "payload" in read_schema
        assert "kind" not in read_schema and "mime" not in read_schema, (
            fn.__name__,
            read_schema,
        )
