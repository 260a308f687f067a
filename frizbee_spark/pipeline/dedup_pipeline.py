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
        self._record_lineage(stage)
        return out

    def _read(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._path(stage))

    def _record_lineage(self, stage: str) -> None:
        """Per-partition row counters for the stage output, read from the
        just-written parquet FOOTERS on the driver — the counts already
        exist in file metadata, so recomputing them with a Spark job
        (a full groupBy + append-write per stage, two scheduled jobs ~0.5s
        each on this host) was pure fixed overhead (guide §1.2: remove
        work, then tune). partition_id is the writer task's file index."""
        import glob
        import re

        import pyarrow.parquet as pq

        stages, pids, rows = [], [], []
        for path in sorted(glob.glob(os.path.join(self._path(stage), "part-*"))):
            m = re.match(r"part-(\d+)", os.path.basename(path))
            if m is None:
                continue
            stages.append(stage)
            pids.append(int(m.group(1)))
            rows.append(pq.ParquetFile(path).metadata.num_rows)
        self._append_lineage(stages, pids, rows)

    def _append_lineage(
        self, stages: list[str], pids: list[int], rows: list[int]
    ) -> None:
        """One small driver-side parquet file per append (same schema the
        Spark writer produced: stage string, partition_id int, rows long)."""
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        lineage_dir = os.path.join(self.workdir, "_lineage")
        os.makedirs(lineage_dir, exist_ok=True)
        table = pa.table(
            {
                "stage": pa.array(stages, pa.string()),
                "partition_id": pa.array(pids, pa.int32()),
                "rows": pa.array(rows, pa.int64()),
            }
        )
        pq.write_table(
            table, os.path.join(lineage_dir, f"part-{uuid.uuid4().hex}.parquet")
        )

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.workdir, "_lineage"))

    # -- stages --

    def _stage_extract(self, pages: DataFrame) -> DataFrame:
        """Text extraction: byte-identical `text` per url (input invariant);
        latest capture wins per url (extract_latest_per_url)."""
        from ..runtime import ensure_min_partitions

        # full-width extraction for small unsplittable scans (no-op at
        # scale); the registry dedupes the recaptured-url computation
        # across the auto count and the two broadcast builds
        pages = ensure_min_partitions(pages)
        self._extract_registry: list = []
        return extract_latest_per_url(
            pages, persist_registry=self._extract_registry
        ).select(
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
        self._pairs_registry: list = []
        pairs, sampled = candidate_pairs(
            bands,
            id_col="doc_id",
            bucket_cap=self.config.bucket_cap,
            min_band_collisions=self.config.min_band_collisions,
            persist_registry=self._pairs_registry,
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
        self._append_lineage(
            [name for name, _ in items],
            [-1] * len(items),
            [int(value) for _, value in items],
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
        without any verified edge form singleton clusters.

        is_canonical needs no aggregation: connected_components' contract
        is component == MIN node id of the component, and that node is
        itself a member, so min(doc_id) over a cluster always equals the
        cluster_id — `doc_id == cluster_id` replaces the round-5
        groupBy(min) + join-back (two exchanges and a join per run; the
        single-DAG path already relies on the same identity for its
        Observation-based cluster count)."""
        return (
            docs.join(
                components.withColumnRenamed("node", "doc_id"), "doc_id", "left"
            )
            .withColumn("cluster_id", F.coalesce("component", "doc_id"))
            .withColumn("is_canonical", F.col("doc_id") == F.col("cluster_id"))
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
            for cached in getattr(self, "_extract_registry", []):
                cached.unpersist()
            self._extract_registry = []
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
            for cached in getattr(self, "_pairs_registry", []):
                cached.unpersist()
            self._pairs_registry = []
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


def extract_latest_per_url(
    pages: DataFrame,
    recapture_strategy: str = "auto",
    broadcast_threshold: int = 5_000_000,
    persist_registry: list | None = None,
) -> DataFrame:
    """Latest capture wins per url, without shuffling page payloads for
    the (typically dominant) urls captured exactly once.

    A global window over url would shuffle every html+text payload only to
    pick winners inside ~singleton groups. Instead the RECAPTURED url set
    (urls with >1 capture — small on snapshot-style inputs) is computed
    from the url column alone (column-pruned scan, 8-byte-ish shuffle) and
    broadcast: single-capture pages stream through a broadcast anti-join
    with NO payload shuffle, and only the recaptured subset pays the
    window.

    `recapture_strategy`:
    - 'broadcast': always broadcast the recaptured set (caller knows it is
      small — e.g. snapshot corpora with no recaptures).
    - 'window': plain per-url window over everything — the safe path for
      recapture-heavy corpora (crawl archives) where an unbounded
      broadcast would OOM the driver.
    - 'auto' (default): count the recaptured urls first (a column-pruned
      scan, cheap next to the payload work) and broadcast only below
      `broadcast_threshold`, else fall back to the window path.

    With `persist_registry` the (tiny) recaptured-url set is persisted so
    the 'auto' count and the two broadcast builds share ONE computation of
    the url groupBy instead of three shuffles of the url column; the
    caller unpersists via the registry once extraction materializes."""
    from pyspark.sql import Window

    w = Window.partitionBy("url").orderBy(F.desc("warc_ts"))
    if recapture_strategy not in ("auto", "broadcast", "window"):
        raise ValueError(f"unknown recapture_strategy {recapture_strategy!r}")
    if recapture_strategy == "window":
        return (
            pages.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
    recaptured = (
        pages.groupBy("url")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > 1)
        .select("url")
    )
    if persist_registry is not None:
        recaptured = recaptured.persist()
        persist_registry.append(recaptured)
    if recapture_strategy == "auto":
        n_recaptured = recaptured.count()
        if n_recaptured == 0:
            # snapshot corpus, no url captured twice: latest-wins is the
            # identity, so skip the anti-join/window/union machinery
            # entirely (its ~4 plan stages were pure fixed cost here)
            return pages
        if n_recaptured > broadcast_threshold:
            return (
                pages.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .drop("_rn")
            )
    singles = pages.join(F.broadcast(recaptured), "url", "left_anti")
    latest_dups = (
        pages.join(F.broadcast(recaptured), "url", "left_semi")
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    return singles.unionByName(latest_dups)


def _fixed_list_matrix(col, np):
    """Zero-copy (n, L) matrix view of a pyarrow list<int64> column whose
    lists all share one length L (MinHash signatures). flatten() honors
    slice offsets; reshape raises if the lists are ragged."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):  # pragma: no cover
        col = col.combine_chunks()
    vals = col.flatten().to_numpy(zero_copy_only=True)
    n = len(col)
    return vals.reshape(n, len(vals) // n if n else 0)


def verify_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    config: DedupConfig,
    signatures: DataFrame | None = None,
    persist_registry: list | None = None,
    scratch_dir: str | None = None,
    lazy_checkpoint: bool = False,
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

    The est intermediate is materialized ONCE (24B/pair — tiny): a parquet
    cut under `scratch_dir` when given (shallow downstream plans, nothing
    retained), else an eager columnar persist appended to
    `persist_registry` so callers can unpersist after the final union
    materializes (auto scratch dir, removed at exit, when neither is
    given). Both python stages are
    zero-copy mapInArrow passes over REUSED scratch buffers — no JVM
    higher-order functions (zip_with / aggregate / array_intersect lambdas
    are interpreted per element and measured 10-100x slower than the
    equivalent numpy pass), and no per-batch large allocations.

    Returns (a, b, jaccard, sw_ratio) for accepted pairs."""
    c = config
    shingle_k = c.shingle_k
    window = c.sw_window
    sw_config = Config(max_typos=None, casing=CaseMatching.IGNORE)
    est_hi = c.jaccard_threshold + 0.12
    est_lo = max(0.0, c.sw_gate - 0.08)
    jaccard_threshold = c.jaccard_threshold
    sw_gate = c.sw_gate
    sw_ratio_threshold = c.sw_ratio_threshold
    registry = persist_registry if persist_registry is not None else []

    if signatures is None:
        signatures = minhash_signatures(
            docs, text_col="text", id_col="doc_id",
            shingle_k=c.shingle_k, num_perm=c.num_perm, seed=c.seed,
        )

    sig_a = signatures.select(F.col("doc_id").alias("a"), F.col("signature").alias("sig_a"))
    sig_b = signatures.select(F.col("doc_id").alias("b"), F.col("signature").alias("sig_b"))

    def _est_batches(iterator):
        import os
        import time

        import numpy as np
        import pyarrow as pa

        timing = bool(os.environ.get("FRIZBEE_UDF_TIMING"))
        for batch in iterator:
            t0 = time.perf_counter() if timing else 0.0
            n = batch.num_rows
            if n == 0:
                continue
            cols = {name: batch.column(i) for i, name in enumerate(batch.schema.names)}
            sa = _fixed_list_matrix(cols["sig_a"], np)
            sb = _fixed_list_matrix(cols["sig_b"], np)
            est = np.round((sa == sb).mean(axis=1), 6)
            if timing:
                print(
                    f"[est-batch] n={n} sec={time.perf_counter() - t0:.3f} "
                    f"pid={os.getpid()}",
                    flush=True,
                )
            yield pa.RecordBatch.from_arrays(
                [cols["a"], cols["b"], pa.array(est)], ["a", "b", "est"]
            )

    est = (
        pairs.hint("shuffle_hash").join(sig_a, "a")
        .hint("shuffle_hash").join(sig_b, "b")
        .select("a", "b", "sig_a", "sig_b")
        .mapInArrow(_est_batches, "a long, b long, est double")
    )
    if lazy_checkpoint and persist_registry is not None:
        # eager: est feeds TWO consumers (accepted_est + middle) — a
        # deferred cut would make their tasks race the block write lock
        # (see runtime.lazy_cut); one barrier-free materialization job
        from ..runtime import lazy_cut

        est = lazy_cut(est, persist_registry, eager=True)
    elif scratch_dir is None and persist_registry is None:
        # shared per-process dir, overwritten by the next registry-less
        # call — bounds tmpfs retention to one copy (ADVICE r4)
        from ..runtime import scratch_cut, shared_scratch_dir

        est = scratch_cut(est, "est", shared_scratch_dir("verify_scratch"))
    elif scratch_dir is not None:
        from ..runtime import scratch_cut

        est = scratch_cut(est, "est", scratch_dir)
    else:
        est = est.persist()
        est.count()
        registry.append(est)

    accepted_est = est.where(F.col("est") >= est_hi).select(
        "a", "b", F.col("est").alias("jaccard"), F.lit(1.0).alias("sw_ratio")
    )
    middle = est.where((F.col("est") >= est_lo) & (F.col("est") < est_hi)).select("a", "b")
    if not lazy_checkpoint and middle.isEmpty():
        # data-adaptive short-circuit (est is already materialized, so the
        # probe is one cheap scan): precision-oriented bandings make est
        # bimodal and the boundary band often EMPTY — planning the text
        # join + SW machinery for zero rows still costs ~5 scheduled
        # stages per run. The lazy/throughput path skips the probe: there
        # every extra driver action is serial cost by design, and its
        # recall-oriented banding has a populated boundary band anyway.
        return accepted_est

    def _exact_and_sw_batches(iterator):
        """Fused est-boundary verification: per batch, shingle-hash each
        DISTINCT doc once (fused scratch-buffer stream, keyed by doc id),
        exact-intersect the sorted sets per pair, and run the needle-grouped
        SW kernel only for the jaccard-borderline remainder. One text join
        feeds both signals — the round-2 layout shuffled 16KB shingle
        arrays per pair and ran a second texts join for SW."""
        import os
        import time
        from collections import defaultdict

        import numpy as np
        import pyarrow as pa

        from ..functions.hashing import hash_shingles
        from ..kernel import match_batch

        timing = bool(os.environ.get("FRIZBEE_UDF_TIMING"))
        for batch in iterator:
            t0 = time.perf_counter() if timing else 0.0
            n = batch.num_rows
            if n == 0:
                continue
            cols = {name: batch.column(i) for i, name in enumerate(batch.schema.names)}
            a_ids = cols["a"].to_numpy(zero_copy_only=False)
            b_ids = cols["b"].to_numpy(zero_copy_only=False)
            from ..operators.dedup import _string_buffers

            offs_a, data_a = _string_buffers(cols["text_a"], np, pa, copy=False)
            offs_b, data_b = _string_buffers(cols["text_b"], np, pa, copy=False)
            sets: dict[int, np.ndarray] = {}

            def shingle_set(doc_id, offs, data, row):
                got = sets.get(doc_id)
                if got is None:
                    got = np.unique(
                        hash_shingles(data[offs[row] : offs[row + 1]], shingle_k)
                    )
                    sets[doc_id] = got
                return got

            def text_at(offs, data, row) -> str:
                return bytes(data[offs[row] : offs[row + 1]]).decode("utf-8")

            jac = np.empty(n, dtype=np.float64)
            for i in range(n):
                xs = shingle_set(int(a_ids[i]), offs_a, data_a, i)
                ys = shingle_set(int(b_ids[i]), offs_b, data_b, i)
                if len(xs) == 0 and len(ys) == 0:
                    jac[i] = 1.0
                    continue
                if len(xs) > len(ys):
                    xs, ys = ys, xs
                pos = np.searchsorted(ys, xs)
                pos[pos == len(ys)] = 0
                inter = int((ys[pos] == xs).sum())
                union = len(xs) + len(ys) - inter
                jac[i] = round(inter / max(union, 1), 6)

            accept = jac >= jaccard_threshold
            sw_ratio = np.where(accept, 1.0, 0.0)
            borderline = np.nonzero((jac >= sw_gate) & (jac < jaccard_threshold))[0]
            if len(borderline):
                groups: dict[str, list[tuple[int, str]]] = defaultdict(list)
                for i in map(int, borderline):
                    x = text_at(offs_a, data_a, i)
                    y = text_at(offs_b, data_b, i)
                    short, other = (x, y) if len(x) <= len(y) else (y, x)
                    needle = short[:window]
                    if not needle:
                        sw_ratio[i] = 1.0
                        continue
                    groups[needle].append((i, other[: 4 * window]))
                # needle-grouped: each distinct needle compiles once and
                # scores its haystacks (plus itself for the denominator)
                # in one vectorized call
                for needle, items in groups.items():
                    hays = [h for _, h in items]
                    hays.append(needle)
                    res = match_batch(needle, hays, sw_config)
                    self_score = int(res.score[-1])
                    for j, (pos_i, _) in enumerate(items):
                        sw_ratio[pos_i] = (
                            round(int(res.score[j]) / self_score, 6) if self_score else 0.0
                        )
            keep = accept | (sw_ratio >= sw_ratio_threshold)
            idx = np.nonzero(keep)[0]
            if timing:
                print(
                    f"[verify-batch] n={n} borderline={len(borderline)} "
                    f"kept={len(idx)} sec={time.perf_counter() - t0:.3f} "
                    f"pid={os.getpid()}",
                    flush=True,
                )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(a_ids[idx]),
                    pa.array(b_ids[idx]),
                    pa.array(jac[idx]),
                    pa.array(sw_ratio[idx]),
                ],
                ["a", "b", "jaccard", "sw_ratio"],
            )

    # prune docs to the est-boundary ids BEFORE any text shuffle: the text
    # join must scale with |middle| (often zero), never with |docs| — the
    # unpruned layout shuffled every document's text twice to probe a
    # possibly-empty middle band. AQE picks broadcast for the small sides
    # at runtime and degrades to shuffle joins if the band is ever huge.
    mid_ids = (
        middle.select(F.col("a").alias("doc_id"))
        .unionAll(middle.select(F.col("b").alias("doc_id")))
        .distinct()
    )
    docs_mid = docs.join(mid_ids, "doc_id", "left_semi").select("doc_id", "text")
    texts_a = docs_mid.select(F.col("doc_id").alias("a"), F.col("text").alias("text_a"))
    texts_b = docs_mid.select(F.col("doc_id").alias("b"), F.col("text").alias("text_b"))
    checked = (
        middle.join(texts_a, "a")
        .join(texts_b, "b")
        .select("a", "b", "text_a", "text_b")
        .mapInArrow(
            _exact_and_sw_batches,
            "a long, b long, jaccard double, sw_ratio double",
        )
    )
    return accepted_est.unionByName(checked)

def _fast_scratch_dir(prefix: str) -> str:
    """Scratch dir for stage materialization: tmpfs when available (the
    stand-in for a cluster executor's local SSD — this VM's /tmp sits on
    slow virtio disk), else the system tempdir. Registered for atexit
    removal (tmpfs files outlive the process, so an unremoved dir is a
    host-RAM leak — ADVICE r3); callers should still delete earlier when
    they can."""
    from ..runtime import fast_scratch_dir

    return fast_scratch_dir(prefix)


def dedup_pages_single_dag(
    spark: SparkSession,
    pages: DataFrame,
    config: DedupConfig | None = None,
    workdir: str | None = None,
    cleanup: bool = True,
    stats: dict | None = None,
    cut_mode: str = "parquet",
) -> DataFrame:
    """The same dedup job as DedupPipeline with shallow stage cuts instead
    of one giant lazy DAG — the throughput/scaling measurement path.

    Why stage cuts and not plain persists: `persist()` caches DATA but
    keeps the full logical PLAN. By the verify/CC stages the accumulated
    plan is deep enough that Catalyst+AQE planning runs 10-16s per action
    ON THE DRIVER (measured via event-log job gaps: 51s of a 119s run was
    inter-stage driver think-time) — serial time that Amdahl's law turns
    straight into lost scaling efficiency. Both cut flavors plan every
    downstream action against a shallow node:

    - `cut_mode="parquet"`: each stage writes tmpfs parquet and reads it
      back — an eager write barrier + driver job per stage, but stages are
      individually inspectable and executor memory stays free of cached
      blocks. This mirrors what the checkpointed production pipeline does
      at 100 TB (stage boundaries on the distributed FS).
    - `cut_mode="lc"`: each stage is a LAZY localCheckpoint
      (runtime.lazy_cut) — the plan truncates to a LogicalRDD immediately
      while computation defers into the first consuming action, so the
      whole pipeline runs as a handful of driver jobs with no write-commit
      barriers (measured: the barrier+job tail was a third of the serial
      cost S at local[8]). Blocks live in executor storage with lineage
      truncated: maximum throughput, no mid-job resumability — on a real
      cluster this is the classic performance-over-fault-tolerance
      localCheckpoint tradeoff, and the resumable DedupPipeline remains
      the production path.

    Stage fusion (round 5): extraction and MinHash signatures materialize
    as ONE combined cut carrying (url, doc_id, text, lang, signature) —
    `minhash_signatures(keep_cols=...)` echoes the doc columns through the
    Arrow pass — so the docs/sigs consumers are column-pruned reads of a
    single materialization (one fewer stage barrier + no second pass over
    the text payload). The verified edge set is always a lazy cut (single
    consumer: connected components — its blocks ride inside CC's first
    convergence action), and the cluster count is taken from an
    `Observation` on the final write (`stats["n_clusters"]`) instead of a
    separate distinct-count job: every cluster's id equals the doc_id of
    exactly one member row (component ids are min-node doc ids), so
    sum(doc_id == cluster_id) == countDistinct(cluster_id) without the
    DISTINCT that observed metrics disallow.

    Returns the cluster table (url, doc_id, cluster_id) as a parquet scan;
    `workdir` holds the parquet artifacts (auto-created on tmpfs when
    None). With `cleanup` every intermediate parquet except the final
    clusters is removed before returning; use `dedup_pages_scoped` to
    bound the whole dir's lifetime explicitly. When `stats` is given it
    receives n_clusters/n_docs computed during the final write."""
    import shutil

    from pyspark.sql import Observation

    from ..runtime import lazy_cut, scratch_cut

    if cut_mode not in ("parquet", "lc"):
        raise ValueError(f"unknown cut_mode {cut_mode!r}")
    c = config or DedupConfig()
    lazy = cut_mode == "lc"
    if workdir is None and not lazy:
        workdir = _fast_scratch_dir("frizbee_dedup_dag_")
    registry: list = []

    def cut(df: DataFrame, name: str) -> DataFrame:
        # eager: every cut here has multiple downstream consumers (docs +
        # sigs read the combined cut; see runtime.lazy_cut on why deferred
        # multi-consumer cuts serialize on the block write lock)
        if lazy:
            return lazy_cut(df, registry, eager=True)
        return scratch_cut(df, name, workdir)

    combined = cut(
        minhash_signatures(
            extract_latest_per_url(pages, persist_registry=registry).select(
                "url", F.xxhash64("url").alias("doc_id"), "text", "lang"
            ),
            text_col="text",
            id_col="doc_id",
            shingle_k=c.shingle_k,
            num_perm=c.num_perm,
            seed=c.seed,
            keep_cols=("url", "text", "lang"),
        ),
        "docs_sigs",
    )
    docs = combined.select("url", "doc_id", "text", "lang")
    sigs = combined.select("doc_id", "signature")
    bands = lsh_bands(
        sigs, id_col="doc_id", num_bands=c.num_bands, num_perm=c.num_perm
    )
    pairs, _sampled = candidate_pairs(
        bands,
        id_col="doc_id",
        bucket_cap=c.bucket_cap,
        min_band_collisions=c.min_band_collisions,
        scratch_dir=None if lazy else workdir,
        persist_registry=registry if lazy else None,
        lazy_checkpoint=lazy,
    )
    # no stage cut for `pairs`: it has exactly one consumer (the est join)
    # and its plan is already shallow (the salted member table inside
    # candidate_pairs is the materialization point), so a cut here would
    # only add barrier latency
    verified = verify_pairs(
        pairs,
        docs,
        c,
        signatures=sigs,
        scratch_dir=None if lazy else workdir,
        persist_registry=registry if lazy else None,
        lazy_checkpoint=lazy,
    )
    # driver_threshold=0: the measured throughput path must never serialize
    # clustering through a driver loop — distributed star contraction only.
    # input_materialized: the edge cut is already a shallow LogicalRDD, so
    # CC skips its defensive input checkpoint (one fewer barrier); eager
    # because every star round scans the edge set through TWO branches
    # (the both-directions union) in one job. rounds_per_check=2 halves
    # the convergence-check job count (dup graphs are near-cliques that
    # converge in 2-3 rounds).
    edges = lazy_cut(verified.select("a", "b"), registry, eager=True)
    components = connected_components(
        spark,
        edges,
        driver_threshold=0,
        input_materialized=True,
        persist_registry=registry,
        rounds_per_check=2,
        # AQE stays ON for the CC rounds even though its per-exchange
        # query-stage jobs are a measured few-second serial tail: it is
        # also what COALESCES the star rounds' tiny shuffles and REUSES
        # the duplicated CTE subtrees across chained rounds. Both
        # alternatives were measured worse on this host (event logs,
        # BENCH/HISTORY.md round 5): AQE-off at session width = a
        # per-task scheduling tail of mostly-empty tasks; AQE-off with
        # few partitions = static ReuseExchange fails to dedupe the
        # chained-round subtrees and the batch plan explodes to ~40
        # stages per action.
    )
    clusters_df = docs.join(
        components.withColumnRenamed("node", "doc_id"), "doc_id", "left"
    ).select(
        "url", "doc_id", F.coalesce("component", "doc_id").alias("cluster_id")
    )
    obs = None
    if stats is not None:
        obs = Observation("cluster_stats")
        clusters_df = clusters_df.observe(
            obs,
            F.coalesce(
                F.sum((F.col("doc_id") == F.col("cluster_id")).cast("long")),
                F.lit(0),
            ).alias("n_clusters"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    # the final output is always a parquet cut: callers consume it after
    # this call released every block the lazy cuts retained
    if workdir is None:
        workdir = _fast_scratch_dir("frizbee_dedup_dag_")
    clusters = scratch_cut(clusters_df, "clusters", workdir)
    if obs is not None:
        stats.update(obs.get)
    for cached in registry:
        cached.unpersist()
    if cleanup:
        for name in ("docs_sigs", "salted", "est"):
            shutil.rmtree(os.path.join(workdir, name), ignore_errors=True)
    return clusters


def dedup_pages_scoped(
    spark: SparkSession,
    pages: DataFrame,
    config=None,
    stats: dict | None = None,
    cut_mode: str = "parquet",
):
    """Context manager around `dedup_pages_single_dag` that bounds the
    scratch workdir's lifetime: yields the cluster DataFrame and removes
    the WHOLE workdir (clusters parquet included) on exit — tmpfs scratch
    survives process death, so callers that loop (the scaling bench runs
    16 subprocess measurements) must reclaim it deterministically, not at
    interpreter exit. `stats`/`cut_mode` pass through to
    `dedup_pages_single_dag` (when `stats` is given, the cluster count is
    already in it on entry — no extra action needed).

        with dedup_pages_scoped(spark, pages) as clusters:
            n = clusters.select("cluster_id").distinct().count()
    """
    import contextlib

    from ..runtime import fast_scratch_dir, release_scratch_dir

    @contextlib.contextmanager
    def _scope():
        workdir = fast_scratch_dir("frizbee_dedup_dag_")
        try:
            yield dedup_pages_single_dag(
                spark,
                pages,
                config,
                workdir=workdir,
                cleanup=True,
                stats=stats,
                cut_mode=cut_mode,
            )
        finally:
            release_scratch_dir(workdir)

    return _scope()
