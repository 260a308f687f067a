"""Iterative connected components via alternating large-star / small-star
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14 —
public algorithm), expressed with DataFrame groupBy/join only.

Scale notes:
- per-node neighbor minima come from groupBy().min() — never a
  collect_list, so hub nodes (huge dup clusters) cannot blow up a task.
- every round's plan is cut (parquet with checkpoint_dir, else a lazy
  localCheckpoint whose LogicalRDD keeps analysis O(1)-deep); convergence
  (star-forest + order-insensitive checksum) comes from ONE action per
  round, so the loop makes at most O(log n) shuffles and as few driver
  jobs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..runtime import LocalCheckpointHandle as _LocalCheckpointHandle

__all__ = ["connected_components"]


def _large_star(edges: DataFrame) -> DataFrame:
    """large-star: connect every neighbor larger than u to u's min.

    Skew-safe formulation: the per-node minimum comes from a map-side
    partially-aggregated groupBy (a hub node's min is combined per
    partition before the shuffle — no task ever materializes a full
    neighbor list, unlike a Window.partitionBy, where the component-min
    node of a giant duplicate cluster becomes a single-task straggler
    AQE cannot split). The join back on `u` hash-partitions `both` exactly
    like the groupBy did, so Catalyst/AQE reuses that exchange — the input
    is still scanned once — and residual hot keys go through the AQE
    skew-join splitter."""
    both = edges.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        edges.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    mins = both.groupBy("u").agg(F.min("v").alias("_mn"))
    m = F.least(F.col("_mn"), F.col("u"))
    # v > u implies v > m (m <= u), so no self-edge filter is needed
    return (
        both.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("a"), m.alias("b"))
        .dropDuplicates(["a", "b"])
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """small-star: point all of u's smaller neighbors (and u) at the min.

    Same skew-safe groupBy-min + exchange-reused join as `_large_star`;
    the row holding the minimum neighbor contributes the (u, m) self-edge,
    every other row its (v, m) edge."""
    directed = edges.select(
        F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
    )
    mins = directed.groupBy("u").agg(F.min("v").alias("_mn"))
    return (
        directed.join(mins, "u")
        .select(
            F.when(F.col("v") == F.col("_mn"), F.col("u"))
            .otherwise(F.col("v"))
            .alias("a"),
            F.col("_mn").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )


#: one full large-star + small-star round as a single CTE query. Building
#: the same plan from ~30 nested Column objects costs a py4j round trip
#: per node (measured 2-45 ms each on this host — driver-serial time per
#: CC round); one spark.sql() call with a DataFrame parameter is ONE round
#: trip and plans identically. Semantics mirror _large_star/_small_star
#: exactly (DISTINCT == dropDuplicates, least/greatest id normalization).
_ROUND_SQL = """
WITH both AS (
    SELECT a AS u, b AS v FROM {edges}
    UNION ALL
    SELECT b AS u, a AS v FROM {edges}
),
lmins AS (SELECT u, min(v) AS mn FROM both GROUP BY u),
ls AS (
    SELECT DISTINCT both.v AS a, least(lmins.mn, both.u) AS b
    FROM both JOIN lmins ON both.u = lmins.u
    WHERE both.v > both.u
),
directed AS (SELECT greatest(a, b) AS u, least(a, b) AS v FROM ls),
smins AS (SELECT u, min(v) AS mn FROM directed GROUP BY u)
SELECT DISTINCT
    CASE WHEN d.v = smins.mn THEN d.u ELSE d.v END AS a,
    smins.mn AS b
FROM directed d JOIN smins ON d.u = smins.u
WHERE CASE WHEN d.v = smins.mn THEN d.u ELSE d.v END != smins.mn
"""


def _star_round(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """One large-star + small-star round (SQL-CTE form of
    `_small_star(_large_star(edges))` — kept behaviorally identical; the
    Column forms remain as the executable specification and are
    equivalence-tested against this)."""
    return spark.sql(_ROUND_SQL, edges=edges)


def _round_stats(edges: DataFrame) -> tuple[bool, tuple[int, int]]:
    """(is_star_forest, (n_edges, checksum)) in ONE Spark action.

    A converged star forest means every node has exactly one parent and no
    parent is itself a child (no chains) — large-star and small-star are
    both no-ops on such a set. The previous formulation cost three driver
    actions per round (count/countDistinct agg, a left_semi chain probe,
    and a separate checksum scan); at high parallelism those short jobs are
    pure Amdahl serial time, so all three signals are folded into a single
    groupBy-per-node pass: nc = times the node appears as a child,
    np = times as a parent, plus a per-node partial bit_xor of
    xxhash64(a, b) (child rows only) whose final xor equals the old
    order-insensitive edge checksum. Violations = any node with nc > 1
    (two parents) or nc > 0 and np > 0 (chain)."""
    # one spark.sql call (see _ROUND_SQL note on py4j chatter). The CASE
    # guard matters: xxhash64 SKIPS null inputs (xxhash64(node, null) ==
    # xxhash64(node), not null), so the parent-marker rows must be
    # excluded explicitly or they would pollute the edge checksum.
    row = edges.sparkSession.sql(
        """
        WITH pn AS (
            SELECT node,
                   count(parent) AS nc,
                   sum(CASE WHEN parent IS NULL THEN 1 ELSE 0 END) AS np,
                   bit_xor(CASE WHEN parent IS NOT NULL
                                THEN xxhash64(node, parent) END) AS hp
            FROM (
                SELECT a AS node, b AS parent FROM {edges}
                UNION ALL
                SELECT b AS node, CAST(NULL AS BIGINT) AS parent FROM {edges}
            )
            GROUP BY node
        )
        SELECT coalesce(sum(nc), 0) AS n,
               coalesce(sum(CASE WHEN nc > 1 OR (nc > 0 AND np > 0)
                                 THEN 1 ELSE 0 END), 0) AS violations,
               coalesce(bit_xor(hp), 0) AS h
        FROM pn
        """,
        edges=edges,
    ).collect()[0]
    return int(row["violations"]) == 0, (int(row["n"]), int(row["h"]))




def _driver_union_find(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """Exact union-find on the driver for SMALL edge sets. Identical output
    to star contraction, no iteration shuffles — but it serializes the
    clustering through one Python loop, so the threshold is kept low and the
    scaling/throughput bench path always takes the distributed route."""
    return _union_find_rows(spark, edges.select("a", "b").collect())


def _union_find_rows(spark: SparkSession, rows) -> DataFrame:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        a, b = int(r.a), int(r.b)
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    out = [(n, find(n)) for n in parent]
    # explicit schema: an empty edge set must yield an empty TYPED frame,
    # not a CANNOT_INFER_EMPTY_SCHEMA error (a clean corpus has zero edges)
    return spark.createDataFrame(out, schema="node long, component long")


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    checkpoint_dir: str | None = None,
    max_iterations: int = 25,
    driver_threshold: int = 100_000,
    input_materialized: bool = False,
    persist_registry: list | None = None,
    rounds_per_check: int = 1,
) -> DataFrame:
    """Returns (node, component) where component = min node id of the
    component. Input: undirected edge list with columns (a, b).

    Edge sets below `driver_threshold` use an exact driver-side union-find
    (identical output, no iteration shuffles); larger graphs run the
    distributed star contraction. Pass driver_threshold=0 to force the
    distributed path (scaling benchmarks do — a driver loop is serial
    structure that caps throughput regardless of cluster size). When
    `checkpoint_dir` is given every round persists to parquet (lineage cut
    + resumable); otherwise each round is persisted and the convergence
    check itself fills the cache — exactly ONE driver action per round,
    because every extra short job is Amdahl serial time at high
    parallelism. Each round's checkpoint-block handle is appended to
    `persist_registry` when given; callers unpersist after consuming the
    result (without a registry the blocks are ContextCleaner-managed).

    `input_materialized=True` promises the edge list is already a shallow
    scan (e.g. a parquet stage-cut, or a lazy localCheckpoint whose blocks
    materialize inside the first round's action) — the defensive input
    checkpoint is skipped; deep lazy inputs would otherwise recompute
    their whole upstream DAG in every star round.

    `rounds_per_check` chains that many large+small-star rounds between
    convergence checks: every check is a driver ACTION (fixed scheduling +
    planning cost that Amdahl's law charges straight against scaling
    efficiency), so on graphs known to converge in a few rounds — dup
    clusters are near-cliques of diameter ~1-2 — checking every 2 rounds
    halves the job count at the price of at most `rounds_per_check - 1`
    extra no-op rounds over an already-collapsed (tiny) edge set. Within a
    batch, round k+1 references round k's un-cut plan twice (the
    both-directions union); the duplicated subtree shares its shuffles via
    ReuseExchange, so the batch is one deeper plan, not double work. The
    default (1) keeps the library semantics; the throughput path passes
    2."""
    cur = edges.select(
        F.col("a").cast("long").alias("a"), F.col("b").cast("long").alias("b")
    ).where(F.col("a") != F.col("b"))

    persisted = None
    if driver_threshold > 0:
        persisted = cur = cur.persist()
        # ONE action decides the route AND fetches the rows the union-find
        # needs: take(threshold + 1) short-circuits once it has proof the
        # graph is big, and below the threshold the rows are already on the
        # driver — the previous count()-then-collect() pair cost two full
        # scheduled jobs for the common small-graph case
        head = cur.take(driver_threshold + 1)
        if len(head) <= driver_threshold:
            out = _union_find_rows(spark, head)
            persisted.unpersist()
            return out

    if not input_materialized and persisted is None:
        # materialize the input once: the edge list may arrive with a deep
        # lazy lineage (the whole verify DAG); every star round scans its
        # input several times, and scanning a compound lazy plan multiplies
        # into full upstream recomputes. localCheckpoint = parallel
        # materialization + lineage cut (no driver barrier).
        cur = cur.localCheckpoint()
        if persist_registry is not None:
            persist_registry.append(_LocalCheckpointHandle(cur))
    if persisted is not None:
        cur = cur.localCheckpoint()
        if persist_registry is not None:
            persist_registry.append(_LocalCheckpointHandle(cur))
        persisted.unpersist()
        persisted = None

    prev_sig = None
    rounds_done = 0
    first_check = True
    while rounds_done < max_iterations:
        # one materialization per CHECK BATCH: within a round each star
        # scans its input through a single reused exchange (groupBy-min +
        # join on the same key), and chained rounds inside a batch share
        # their duplicated subtrees via ReuseExchange, so no mid-batch
        # checkpoint is needed
        steps = min(rounds_per_check, max_iterations - rounds_done)
        for _ in range(steps):
            cur = _star_round(spark, cur)
        rounds_done += steps
        if checkpoint_dir is not None:
            path = os.path.join(checkpoint_dir, f"cc_iter_{rounds_done - 1}")
            cur.write.mode("overwrite").parquet(path)
            cur = spark.read.parquet(path)
            forest, sig = _round_stats(cur)
        else:
            # LAZY localCheckpoint: swaps the batch's LOGICAL plan for a
            # shallow LogicalRDD immediately (computation deferred), so the
            # _round_stats action below both computes the batch AND stores
            # its blocks in ONE job — and, critically, every later round's
            # plan ANALYSIS stays O(1)-deep. The earlier persist-based
            # fusion kept the full lineage in the logical tree; by round 2
            # the analyzer was re-walking the whole history and the event
            # log showed 5-10s driver gaps per CC round at local[8].
            # Checkpoint blocks are ContextCleaner-managed (freed on GC),
            # so no unpersist bookkeeping is needed.
            # The FIRST check is skipped entirely — no realistic dup graph
            # is a star forest after one batch (a trivial/empty one just
            # pays one cheap no-op batch), so its materialization rides
            # inside the second batch's action and one more short driver
            # job disappears.
            cur = cur.localCheckpoint(eager=False)
            if persist_registry is not None:
                persist_registry.append(_LocalCheckpointHandle(cur))
            if first_check and rounds_done < max_iterations:
                first_check = False
                continue
            forest, sig = _round_stats(cur)
        # primary stop: converged star forest (stars are no-ops on it) —
        # detected one full round earlier than checksum equality. The
        # checksum remains as the paper's safety net; both signals come
        # from ONE action per round (_round_stats).
        if forest:
            break
        if sig == prev_sig:
            break
        prev_sig = sig

    # after convergence every edge is (node -> component root)
    assignments = cur.select(
        F.col("a").alias("node"), F.col("b").alias("component")
    )
    roots = cur.select(F.col("b").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return assignments.unionByName(roots).dropDuplicates(["node"])
