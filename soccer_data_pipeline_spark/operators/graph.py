"""[beyond-ref] Connected components over near-dup pair graphs.

Pairwise near-dup output (LSH / n-gram / embedding pairs) is not yet a
dedup decision: A~B and B~C must collapse into ONE cluster {A,B,C} with
one keeper. That consolidation is connected components — the standard
last stage of web-scale dedup pipelines.

Algorithm: iterative min-label propagation (each node adopts the
smallest label among itself and its neighbors) until fixpoint. Dup
graphs have tiny diameters (clusters are near-cliques), so convergence
takes a handful of rounds; the loop is over ROUNDS, not rows — each
round is one distributed join + aggregate, and the only driver-side
value is the per-round changed-label count (an iterative algorithm's
convergence check, same as MLlib's KMeans). At extreme diameters the
large-star/small-star variant (Kiveris et al., "Connected Components
in MapReduce") halves round count; dup graphs never need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iters: int = 20,
    num_partitions: int | None = 8,
) -> DataFrame:
    """→ (node, cluster_id) where cluster_id = min node id in the
    component. Every node appearing in ``edges`` is labeled.

    ``num_partitions`` right-sizes the loop: the near-dup pair graph is
    orders of magnitude smaller than the corpus that produced it, so
    looping at corpus-scale partitioning pays ~rounds× the per-task
    overhead for empty partitions. Default 8 suits pair graphs up to
    ~10⁷ edges; pass None to inherit the input partitioning (huge
    graphs), where AQE coalesces each round's shuffles instead.
    """
    # Materialize the (tiny) directed edge list ONCE before mirroring it:
    # the union below consumes `e` twice, and without this boundary the
    # possibly-expensive upstream pipeline (e.g. the whole MinHash
    # shingle→band→verify chain) executes once per union branch.
    e = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    ).cache()
    e.count()
    und = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    if num_partitions is not None:
        und = und.repartition(num_partitions, "u")
    # Materialize the mirrored table BEFORE snapshotting `pre` below: a
    # lazy cache() only registers its RDD in getPersistentRDDs when the
    # first job touches it — which would be the eager labels
    # localCheckpoint, i.e. AFTER `pre` is captured. und's cache id would
    # then land in labels_blocks and the first round's unpersist would
    # silently drop it, recomputing the mirror+repartition twice per
    # round for the rest of the loop (ADVICE r4).
    und = und.cache()
    und.count()
    # localCheckpoint per round: truncates the logical lineage, which
    # otherwise grows exponentially across self-referencing rounds (the
    # plan tree alone OOMs the driver past ~10 rounds). Each round's
    # checkpoint supersedes the previous one; the stale blocks are
    # unpersisted by id as soon as the new checkpoint materializes —
    # waiting for GC-driven cleanup lets ~max_iters copies of the label
    # table pile up in the block manager (r3's measured suite slowdown).
    from .cache import persistent_rdd_ids, unpersist_ids

    spark = edges.sparkSession
    pre = persistent_rdd_ids(spark)
    labels = (
        und.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    labels_blocks = persistent_rdd_ids(spark) - pre
    changed = 0
    for _ in range(max_iters):
        neighbor_min = (
            und.join(labels, und["u"] == labels["node"])
            .groupBy(F.col("v").alias("node"))
            .agg(F.min("label").alias("nlabel"))
        )
        pre = persistent_rdd_ids(spark)
        updated = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
                (F.coalesce("nlabel", "label") < F.col("label")).alias("_changed"),
            )
            .localCheckpoint()
        )
        changed = updated.where(F.col("_changed")).count()
        # the new checkpoint is materialized (eager) and lineage-free, so
        # the previous round's blocks are garbage — drop them now
        unpersist_ids(spark, labels_blocks)
        labels_blocks = persistent_rdd_ids(spark) - pre
        labels = updated.drop("_changed")
        if changed == 0:
            break
    und.unpersist()
    e.unpersist()
    if changed != 0:
        # Labels are still moving at iteration exhaustion: the component
        # diameter exceeds max_iters and the labeling is NOT a fixpoint.
        # Returning it silently would split clusters / emit multiple
        # keepers downstream (dup_clusters), i.e. silent data corruption.
        raise RuntimeError(
            f"connected_components did not converge within max_iters={max_iters} "
            f"({changed} labels still changing); raise max_iters (diameter > "
            "max_iters) or switch to the large-star/small-star variant for "
            "high-diameter graphs"
        )
    return labels.select("node", F.col("label").alias("cluster_id"))


def dup_clusters(edges: DataFrame, src: str = "doc_a", dst: str = "doc_b") -> DataFrame:
    """→ (doc_id, cluster_id, cluster_size, is_keeper): the dedup
    decision table. Keeper = smallest doc_id in the cluster (stable,
    engine-agnostic tie-break)."""
    cc = connected_components(edges, src=src, dst=dst)
    sizes = cc.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return (
        cc.join(sizes, "cluster_id")
        .select(
            F.col("node").alias("doc_id"),
            "cluster_id",
            "cluster_size",
            (F.col("node") == F.col("cluster_id")).alias("is_keeper"),
        )
    )
