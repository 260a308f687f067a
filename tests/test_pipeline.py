"""Pipeline correctness fixtures (FIXTURES.md §3):
- dup-pair recall >= 0.99 vs planted ground-truth clusters
- byte-identical extracted text per url
- kill-and-resume produces the identical final cluster table
- connected components correctness vs a union-find oracle
"""

import random

import pytest
from pyspark.sql import functions as F

from frizbee_spark.pipeline.connected_components import connected_components
from frizbee_spark.pipeline.dedup_pipeline import DedupConfig, DedupPipeline
from frizbee_spark.pipeline.webpages import corpus_to_df, generate_corpus

pytestmark = [pytest.mark.spark, pytest.mark.slow]


def _union_find_clusters(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def test_connected_components_vs_union_find(spark, tmp_path):
    rng = random.Random(7)
    nodes = list(range(200))
    edges = set()
    while len(edges) < 300:
        a, b = rng.sample(nodes, 2)
        edges.add((min(a, b), max(a, b)))
    edges = sorted(edges)
    df = spark.createDataFrame(edges, ["a", "b"])
    want = _union_find_clusters(edges, nodes)
    touched = {n for e in edges for n in e}
    # distributed star-contraction path (registry so the defensive input
    # checkpoint's blocks are reclaimed, not left to ContextCleaner GC)
    reg: list = []
    got = {
        r.node: r.component
        for r in connected_components(
            spark, df, str(tmp_path / "cc"), driver_threshold=0,
            persist_registry=reg,
        ).collect()
    }
    for h in reg:
        h.unpersist()
    for n in touched:
        assert got[n] == want[n], n
    # driver union-find fast path must produce the identical assignment
    got_driver = {
        r.node: r.component for r in connected_components(spark, df).collect()
    }
    assert got_driver == got


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(n_base=150, dup_rate=0.4, seed=1234)


def _run_pipeline(spark, tmp_path, corpus, **kwargs):
    pages = corpus_to_df(spark, corpus)
    pipeline = DedupPipeline(spark, str(tmp_path), DedupConfig(**kwargs))
    clusters = pipeline.run(pages)
    return pipeline, clusters


def test_pipeline_recall_and_text_invariant(spark, tmp_path, corpus):
    pipeline, clusters = _run_pipeline(spark, tmp_path / "main", corpus)
    rows = clusters.collect()

    # text invariant: byte-identical text per url
    by_url = {r.url: r for r in rows}
    expected_text = {p.url: p.text for p in corpus.pages}
    assert set(by_url) == set(expected_text)
    for url, text in expected_text.items():
        assert by_url[url].text == text, url

    # dup-pair recall vs planted ground truth
    cluster_of = {r.url: r.cluster_id for r in rows}
    found = 0
    for a, b in corpus.dup_pairs:
        if cluster_of[a] == cluster_of[b]:
            found += 1
    recall = found / len(corpus.dup_pairs)
    assert recall >= 0.99, f"dup-pair recall {recall:.4f} < 0.99 ({found}/{len(corpus.dup_pairs)})"

    # lineage counters exist for every stage
    lineage_stages = {
        r.stage for r in pipeline.lineage().select("stage").distinct().collect()
    }
    for stage in ["extract", "signatures", "bands", "pairs", "verify", "clusters"]:
        assert stage in lineage_stages, stage


def test_pipeline_precision_sanity(spark, tmp_path, corpus):
    """Different base docs must rarely be merged (word-salad vocabulary is
    shared, so demand >= 0.95 pairwise precision rather than perfection)."""
    _pipeline, clusters = _run_pipeline(spark, tmp_path / "prec", corpus)
    rows = clusters.collect()
    truth = corpus.clusters
    merged = {}
    for r in rows:
        merged.setdefault(r.cluster_id, []).append(r.url)
    good = bad = 0
    for _cid, urls in merged.items():
        for i in range(len(urls)):
            for j in range(i + 1, len(urls)):
                if truth[urls[i]] == truth[urls[j]]:
                    good += 1
                else:
                    bad += 1
    if good + bad:
        precision = good / (good + bad)
        assert precision >= 0.95, f"pairwise precision {precision:.4f}"


def test_pipeline_kill_and_resume(spark, tmp_path, corpus):
    pages = corpus_to_df(spark, corpus)

    # full run
    full = DedupPipeline(spark, str(tmp_path / "full"))
    full_rows = {
        (r.url, r.cluster_id) for r in full.run(pages).collect()
    }

    # killed after the bands stage, then resumed
    part = DedupPipeline(spark, str(tmp_path / "part"))
    assert part.run(pages, stop_after="bands") is None
    assert part._done("bands") and not part._done("pairs")
    resumed = part.run(pages, resume=True)
    resumed_rows = {(r.url, r.cluster_id) for r in resumed.collect()}

    assert full_rows == resumed_rows


def test_dedup_pages_scoped_reclaims_workdir(spark):
    """ADVICE r3: every scaling-bench subprocess leaked a RAM-backed
    clusters parquet + workdir on tmpfs. The scoped API must remove the
    WHOLE workdir (clusters included) on exit, and the run must leave no
    persisted RDDs behind."""
    import glob

    from frizbee_spark.pipeline.dedup_pipeline import dedup_pages_scoped
    from frizbee_spark.pipeline.webpages import corpus_to_df, generate_corpus

    before = set(glob.glob("/dev/shm/frizbee_dedup_dag_*"))
    # delta-based: earlier tests in the shared session may have
    # ContextCleaner-pending checkpoint blocks of their own
    cached_before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    corpus = generate_corpus(n_base=40, dup_rate=0.25, seed=3)
    df = corpus_to_df(spark, corpus)
    with dedup_pages_scoped(spark, df) as clusters:
        n = clusters.select("cluster_id").distinct().count()
    assert n == 40
    after = set(glob.glob("/dev/shm/frizbee_dedup_dag_*"))
    assert after - before == set(), f"leaked workdirs: {after - before}"
    cached_after = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    assert cached_after <= cached_before, (
        f"scoped dedup leaked {cached_after - cached_before} persisted RDDs"
    )


def test_dedup_cut_modes_agree(spark):
    """cut_mode='lc' (lazy localCheckpoint stage cuts, the throughput path)
    must produce byte-identical cluster rows to cut_mode='parquet', the
    Observation stats must equal the post-hoc distinct count, and neither
    mode may leave persisted blocks behind."""
    from frizbee_spark.pipeline.dedup_pipeline import dedup_pages_scoped
    from frizbee_spark.pipeline.webpages import corpus_to_df, generate_corpus

    pages = corpus_to_df(spark, generate_corpus(n_base=80, dup_rate=0.3, seed=11))
    cached_before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    results = {}
    for mode in ("parquet", "lc"):
        stats: dict = {}
        with dedup_pages_scoped(spark, pages, stats=stats, cut_mode=mode) as cl:
            rows = sorted((r.doc_id, r.cluster_id) for r in cl.collect())
        assert stats["n_docs"] == len(rows)
        assert stats["n_clusters"] == len({c for _, c in rows})
        results[mode] = rows
    assert results["parquet"] == results["lc"]
    cached_after = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    assert cached_after <= cached_before


def test_connected_components_rounds_per_check(spark):
    """rounds_per_check=2 (the throughput path's halved convergence-check
    cadence) must produce the identical assignment on a graph that needs
    MANY star rounds — a long path graph has diameter >> 1, so convergence
    genuinely spans several check batches."""
    path_edges = [(i, i + 1) for i in range(40)]
    rng = random.Random(23)
    rand_edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (rng.sample(range(100, 160), 2) for _ in range(80))
        }
    )
    df = spark.createDataFrame(path_edges + rand_edges, "a long, b long")
    # registry + unpersist: without it the distributed path's per-round
    # localCheckpoint blocks linger until ContextCleaner GC and pollute
    # later tests' zero-retained-RDD assertions
    reg: list = []
    base = {
        r.node: r.component
        for r in connected_components(
            spark, df, driver_threshold=0, persist_registry=reg
        ).collect()
    }
    batched = {
        r.node: r.component
        for r in connected_components(
            spark, df, driver_threshold=0, rounds_per_check=2, persist_registry=reg
        ).collect()
    }
    for h in reg:
        h.unpersist()
    assert batched == base
    # path graph must collapse to one component rooted at node 0
    assert all(base[n] == 0 for n in range(41))


def test_minhash_keep_cols_echo(spark):
    """keep_cols must echo input columns through the Arrow pass unchanged
    while leaving the signatures bit-identical to the plain call."""
    from frizbee_spark.operators.dedup import minhash_signatures

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps", "en", "u1"),
         (2, "pack my box with five dozen jugs", "en", "u2"),
         (3, None, "xx", "u3")],
        "doc_id long, text string, lang string, url string",
    )
    plain = {
        r.doc_id: tuple(r.signature)
        for r in minhash_signatures(df, num_perm=16, shingle_k=3).collect()
    }
    kept = minhash_signatures(
        df, num_perm=16, shingle_k=3, keep_cols=("url", "text", "lang")
    ).collect()
    assert {f.name for f in minhash_signatures(
        df, num_perm=16, shingle_k=3, keep_cols=("url", "text", "lang")
    ).schema.fields} == {"doc_id", "signature", "url", "text", "lang"}
    src = {r.doc_id: r for r in df.collect()}
    for r in kept:
        assert tuple(r.signature) == plain[r.doc_id]
        assert r.url == src[r.doc_id].url
        assert r.text == src[r.doc_id].text
        assert r.lang == src[r.doc_id].lang


def test_star_round_sql_matches_column_form(spark):
    """_star_round (one spark.sql CTE per CC round) must be row-identical
    to the Column-built _small_star(_large_star(...)) specification."""
    import random

    from frizbee_spark.pipeline.connected_components import (
        _large_star,
        _small_star,
        _star_round,
    )

    rng = random.Random(17)
    edges = [(rng.randint(0, 60), rng.randint(0, 60)) for _ in range(150)]
    edges += [(5, 5), (61, 62), (62, 63), (63, 61)]  # self-loop + cycle
    df = spark.createDataFrame(edges, "a long, b long").where("a != b")
    want = _small_star(_large_star(df))
    got = _star_round(spark, df)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
