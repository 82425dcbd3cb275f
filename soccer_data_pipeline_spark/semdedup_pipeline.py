"""[beyond-ref] Persisted incremental SemDeDup — the semantic tier's
streaming twin of ``index_pipeline`` (r14, VERDICT r13 #4): one call
fits the base-corpus quantizer and assignment into a PERSISTED
artifact directory; a Structured Streaming consumer then decides, per
microbatch of new embeddings, which vectors are semantically redundant
against the growing corpus — under the same AvailableNow + checkpoint
+ epoch-reject contract the ANN index maintenance runs.

    fit (seeds + two deterministic Lloyd iterations on the BASE only —
         the quantizer is a base-corpus artifact, FAISS's train step)
      → persist (base rows PARTITIONED BY CELL: vec_id, embedding,
                 cell, dist_q2; centroids as a kilobyte of JSON; a
                 config stamp with tau/k/dim/epoch)
      → stream (per batch: assign in-row against the persisted
                centroids — no refit; decide via the shared
                ``operators.semdedup.decide_incremental`` core; append
                the action ledger; append KEPT rows to the base store
                so later batches dedup against them)

At 100 TB: the base store is cell-partitioned parquet, and each
batch's pair work reads ONLY the cells the batch occupies — the
batch's distinct cells resolve driver-side (≤ k ints) and the literal
IN predicate statically prunes the base scan, exactly like the ANN
index's probed-cell serving path. Pair space is (new × pruned-base) ∪
(new × new) within cells — never corpus², never even corpus × batch.

Replay discipline (foreachBatch is at-least-once): a replayed batch's
ids may already sit in the base store (the crash landed between the
base append and the checkpoint commit), so the decision path
anti-joins the batch's OWN ids out of its base read — the replay then
recomputes against exactly the base the original saw, re-appending
byte-identical action and base rows, which the loaders' deterministic
dedups collapse (the at-least-once-write + idempotent-read pairing
``index_pipeline`` documents).

Epoch: a re-fit over a directory with an existing config bumps the
epoch BEFORE overwriting the base store, and the stream asserts the
persisted epoch per microbatch — a stream running across a re-fit
fails loudly instead of deciding new batches against swapped-out
centroids (VERDICT r12 #2's discipline, applied to this artifact).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.kmeans import (
    GRID_Q,
    inrow_assign,
    quantize_vec,
    two_iter_lloyd_centers,
)
from .operators.semdedup import (
    SEMDEDUP_TAU,
    _with_norm,
    decide_incremental,
    semdedup_k,
)


def _config_path(out_dir: str) -> str:
    return os.path.join(out_dir, "config.json")


def _centroids_path(out_dir: str) -> str:
    return os.path.join(out_dir, "centroids.json")


def _base_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "base")


def _actions_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "actions")


def fit_semdedup_base(
    base: DataFrame,
    out_dir: str,
    tau: float = SEMDEDUP_TAU,
    k: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Fit and persist the base-corpus SemDeDup artifacts: the
    deterministic two-iteration Lloyd centroids (seeds = the k
    smallest ids, k from the corpus-size ladder unless given), and the
    base rows (vec_id, embedding, cell, dist_q2) partitioned by cell.
    Returns the persisted config dict."""
    eb = base.select(
        F.col(id_col).alias("vec_id"),
        quantize_vec(F.col(vec_col), GRID_Q).alias("xq"),
    )
    n = eb.count()
    if n == 0:
        raise ValueError("fit_semdedup_base: empty base corpus")
    if k is None:
        k = semdedup_k(n)
    # r15 shape: trainer via two bounded collects (see semdedup_assign),
    # then the stored rows come from ONE in-row assignment over a frame
    # that already carries the raw embedding — the r14 join of the
    # assignment back onto the base disappears. Bit-identical output.
    centers = two_iter_lloyd_centers(eb, k)
    stored = inrow_assign(
        base.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
            quantize_vec(F.col(vec_col), GRID_Q).alias("xq"),
        ),
        centers,
        dist_col="dist_q2",
    ).select("vec_id", "embedding", "cell", "dist_q2")

    # epoch bump BEFORE the destructive overwrite (the index-pipeline
    # discipline): a stream running across this re-fit fails during it.
    # The FULL existing config is preserved under the bumped epoch
    # (index_pipeline._bump_epoch_inplace's contract) — a mid-fit crash
    # must leave the loud epoch reject, not a KeyError on tau/dim, and
    # a concurrent serve during a healthy re-fit must still load a
    # complete stamp.
    epoch = 0
    if os.path.exists(_config_path(out_dir)):
        with open(_config_path(out_dir)) as fh:
            stale = json.load(fh)
        epoch = int(stale.get("epoch", 0)) + 1
        stale["epoch"] = epoch
        with open(_config_path(out_dir), "w") as fh:
            json.dump(stale, fh)
    import shutil

    shutil.rmtree(_actions_dir(out_dir), ignore_errors=True)
    stored.write.mode("overwrite").partitionBy("cell").parquet(
        _base_dir(out_dir)
    )
    os.makedirs(out_dir, exist_ok=True)
    with open(_centroids_path(out_dir), "w") as fh:
        json.dump({"q": GRID_Q, "centers": centers}, fh)
    config = {
        "tau": tau,
        "k": k,
        "dim": len(centers[0][1]),
        "epoch": epoch,
    }
    with open(_config_path(out_dir), "w") as fh:
        json.dump(config, fh)
    return config


def _load_centers(out_dir: str) -> list[tuple[int, list[int]]]:
    """The persisted centroids as the ascending-cid driver list
    ``inrow_assign`` consumes."""
    with open(_centroids_path(out_dir)) as fh:
        doc = json.load(fh)
    return sorted(
        (int(cid), [int(x) for x in cq]) for cid, cq in doc["centers"]
    )


def load_semdedup_artifacts(spark: SparkSession, out_dir: str):
    """(centroids DataFrame (cid, cq), config dict) from a persisted
    directory — the kilobyte constants every batch assigns against."""
    cent = spark.createDataFrame(
        _load_centers(out_dir), "cid bigint, cq array<bigint>"
    )
    with open(_config_path(out_dir)) as fh:
        config = json.load(fh)
    return cent, config


def load_semdedup_base_rows(
    spark: SparkSession,
    out_dir: str,
    cells: list[int] | None = None,
    exclude_ids: DataFrame | None = None,
) -> DataFrame:
    """The persisted base rows, idempotent under at-least-once appends
    (deterministic max-struct dedup per vec_id — the index loader's
    argument). ``cells`` filters the RAW read before the dedup so the
    literal IN predicate statically prunes the scan to those cell
    directories; ``exclude_ids`` anti-joins a batch's own ids out (the
    replay discipline — see module docstring)."""
    df = spark.read.parquet(_base_dir(out_dir))
    if cells is not None:
        df = df.where(F.col("cell").isin([int(c) for c in cells]))
    if exclude_ids is not None:
        df = df.join(F.broadcast(exclude_ids), "vec_id", "left_anti")
    others = [c for c in df.columns if c != "vec_id"]
    packed = df.groupBy("vec_id").agg(F.max(F.struct(*others)).alias("_row"))
    return packed.select(
        "vec_id", *[F.col(f"_row.{c}").alias(c) for c in others]
    )


def semdedup_incremental_served(
    spark: SparkSession,
    new: DataFrame,
    out_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Decide a NEW batch against the PERSISTED artifacts — no refit,
    no base rescan: the batch assigns in-row against the kilobyte
    centroids, its distinct cells resolve driver-side (≤ k ints), and
    the base read statically prunes to those cell directories. Returns
    (vec_id, action, cell, dist_q2) — the cell/dist columns feed the
    kept-row append."""
    centers = _load_centers(out_dir)
    with open(_config_path(out_dir)) as fh:
        config = json.load(fh)
    en = new.select(
        F.col(id_col).alias("vec_id"),
        quantize_vec(F.col(vec_col), GRID_Q).alias("xq"),
    )
    # r15: the persisted centers are already a driver-held list — the
    # in-row assignment (one narrow projection) replaces the r14
    # broadcast-join + groupBy chain; bit-identical (see inrow_assign)
    a_new = (
        inrow_assign(en, centers, dist_col="dist_q2")
        .select("vec_id", "cell", "dist_q2")
        .localCheckpoint(eager=True)
    )
    cells = sorted(
        int(r["cell"]) for r in a_new.select("cell").distinct().collect()
    )
    new_ids = a_new.select("vec_id")
    base_rows = load_semdedup_base_rows(
        spark, out_dir, cells=cells, exclude_ids=new_ids
    )
    m_base = (
        base_rows.select("vec_id", "cell", "dist_q2")
        .join(_with_norm(base_rows, "vec_id", "embedding"), "vec_id")
        .withColumn("is_base", F.lit(1))
    )
    m_new = (
        a_new.join(_with_norm(new, id_col, vec_col), "vec_id")
        .withColumn("is_base", F.lit(0))
    )
    actions = decide_incremental(
        m_base.unionByName(m_new), new_ids, float(config["tau"])
    )
    return actions.join(a_new.select("vec_id", "cell", "dist_q2"), "vec_id")


def run_streaming_semdedup(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str = "vec_id bigint, label bigint, embedding array<float>",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_files_per_trigger: int | None = None,
):
    """Semantic dedup maintenance under Structured Streaming: an
    AvailableNow file stream over ``source_dir``; each microbatch is
    decided against the persisted artifacts via
    ``semdedup_incremental_served``, its action ledger appended to
    ``out_dir/actions``, and its KEPT rows appended to the
    cell-partitioned base store so later batches dedup against them.
    The checkpoint makes file progress exactly-once; replays re-append
    byte-identical rows that the loaders' dedups collapse. Returns the
    finished StreamingQuery."""
    _, config = load_semdedup_artifacts(spark, out_dir)
    epoch = int(config.get("epoch", 0))
    dim = int(config["dim"])

    def process(batch_df: DataFrame, batch_id: int) -> None:
        head = batch_df.head(1)
        if not head:
            return
        # epoch assert: a re-fit between stream start and this batch
        # swapped the centroids — decisions against the stale constants
        # would assign wrong cells; fail loudly, restart the stream
        with open(_config_path(out_dir)) as fh:
            cur = int(json.load(fh).get("epoch", 0))
        if cur != epoch:
            raise ValueError(
                f"run_streaming_semdedup: batch {batch_id} artifact epoch "
                f"advanced {epoch} -> {cur} (re-fit during the stream) — "
                "restart the stream against the current artifacts"
            )
        got = len(head[0][vec_col])
        if got != dim:
            raise ValueError(
                f"run_streaming_semdedup: batch {batch_id} vector dim "
                f"{got} != persisted artifact dim {dim}"
            )
        served = semdedup_incremental_served(
            spark, batch_df, out_dir, id_col=id_col, vec_col=vec_col
        ).localCheckpoint(eager=True)  # decide ONCE, before either write
        served.select("vec_id", "action").write.mode("append").parquet(
            _actions_dir(out_dir)
        )
        kept = batch_df.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
        ).join(
            served.where(F.col("action") == "keep").select(
                "vec_id", "cell", "dist_q2"
            ),
            "vec_id",
        )
        kept.write.mode("append").partitionBy("cell").parquet(
            _base_dir(out_dir)
        )

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    q = (
        reader.parquet(source_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def compact_semdedup_base(
    spark: SparkSession,
    out_dir: str,
    cells: list[int] | None = None,
    min_files: int = 2,
    target_files: int = 1,
) -> dict[int, tuple[int, int]]:
    """Small-file compaction for the base store (r14): every streamed
    microbatch appends one-plus parquet files per touched cell, so a
    long-running semdedup stream turns each cell-pruned pair read into
    many file opens — the same failure mode ``compact_index_cells``
    closes for the index, solved by the same shared compactor on the
    same layout. Layout-only: centroids, cells, dists untouched, no
    epoch advance (a concurrent stream keeps appending validly); the
    same crash ordering (move in first, delete after — duplicates
    collapse via the loader's dedup) and the same reader-race scope
    (retry a read that raced the removals; don't ignoreMissingFiles).

    Returns {cell: (n_files_before, n_files_after)}."""
    from .index_pipeline import compact_cell_partitions

    return compact_cell_partitions(
        spark,
        _base_dir(out_dir),
        os.path.join(out_dir, "_compact_tmp"),
        cells=cells,
        min_files=min_files,
        target_files=target_files,
    )


def load_semdedup_actions(spark: SparkSession, out_dir: str) -> DataFrame:
    """The decided action ledger, idempotent under replays (one
    deterministic row per vec_id).

    Duplicate-id contract: replays append byte-identical rows, so the
    per-id collapse normally has nothing to resolve. If an
    OUT-OF-CONTRACT conflicting duplicate ever appears (same vec_id,
    different actions across batches), ``F.min`` resolves it in the
    CONSERVATIVE direction — ``drop_*`` sorts before ``keep`` and
    therefore outranks it, matching the downstream delete stream
    (run_streaming_index_deletes), which tombstones an id permanently
    on a single drop row (ADVICE r14: ``F.max`` resolved to 'keep'
    while the index had already deleted the id)."""
    df = spark.read.parquet(_actions_dir(out_dir))
    packed = df.groupBy("vec_id").agg(F.min("action").alias("action"))
    return packed
