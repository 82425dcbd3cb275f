"""[beyond-ref] End-to-end ANN index build + serving — the
similarity-tier analog of ``corpus_pipeline.run_corpus_build``: one
call from an embeddings frame to a PERSISTED, incrementally-updatable
IVF×PQ index with a per-cell manifest and an optional recall audit.

    fit (coarse quantizer + m PQ codebooks, deterministic Lloyd on
         bounded samples — byte-stable per corpus+config)
      → encode (one narrow pass: cell + 8-byte codes + chat_norm per
                vector; raw vectors are NOT in the index)
      → persist (index parquet + quantizers as a kilobyte of JSON +
                 a config stamp)
      → manifest (per-cell counts — the cell-balance audit that says
                  whether n_probe routing will be even)
      → audit (optional: per-query recall of the served path vs brute
               force on a bounded query sample, gated)

Every stage is the operator the registered queries hash-check
(`similarity_ivfpq_recall` / `similarity_ivfpq_residual` run the same
``fit_pq_codebooks`` → ``ivfpq_index`` → ``ivfpq_search`` path), so
the pipeline inherits their oracle coverage; the integration tests
additionally assert persisted-and-reloaded search is row-identical to
the in-memory build.

Incremental maintenance (the FAISS ``add``-vs-``train`` contract):
``run_streaming_index_updates`` tails a directory of new-embedding
parquet with an AvailableNow file stream and appends each microbatch's
encoded rows — cells and codes are per-row functions of the PERSISTED
constants, so no refit, no rescan, and a replayed batch writes
byte-identical rows (the loader's candidate_id dropDuplicates makes
reads idempotent under foreachBatch's at-least-once replay, the same
argument ``streaming/incremental.py`` documents for its MERGE path).

At 100 TB: the index is (corpus/8-byte-codes)-sized parquet
partitionable by cell (each probe equi-join prunes to probed cells);
the quantizers stay kilobytes; batch adds are one narrow pass over
the batch alone.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.kmeans import DeterministicKMeans
from .operators.similarity import (
    _as_double,
    brute_force_topk,
    fit_ivfpq_quantizers,
    ivfpq_index,
    ivfpq_search,
)


@dataclass
class AnnIndexBuild:
    index: DataFrame  # (candidate_id, cell, code0..m-1, chat_norm)
    manifest: DataFrame  # per cell: n_vectors (+ config columns)
    audit: DataFrame | None  # per query: recall + gate (audit_queries runs)
    coarse: DeterministicKMeans
    models: list  # m DeterministicKMeans codebooks


def _config_path(out_dir: str) -> str:
    return os.path.join(out_dir, "config.json")


def _save_quantizers(out_dir: str, coarse, models, config: dict) -> None:
    os.makedirs(out_dir, exist_ok=True)
    coarse.save(os.path.join(out_dir, "coarse.json"))
    with open(os.path.join(out_dir, "pq_codebooks.json"), "w") as fh:
        json.dump(
            {"q": models[0].q, "books": [mod.centers_q for mod in models]}, fh
        )
    with open(_config_path(out_dir), "w") as fh:
        json.dump(config, fh)


def load_ann_quantizers(out_dir: str):
    """(coarse, models, config) from a persisted index directory."""
    coarse = DeterministicKMeans.load(os.path.join(out_dir, "coarse.json"))
    with open(os.path.join(out_dir, "pq_codebooks.json")) as fh:
        doc = json.load(fh)
    models = [DeterministicKMeans(c, q=doc["q"]) for c in doc["books"]]
    with open(_config_path(out_dir)) as fh:
        config = json.load(fh)
    return coarse, models, config


def load_ann_index(spark: SparkSession, out_dir: str) -> DataFrame:
    """The persisted index rows, idempotent under at-least-once appends
    (a replayed microbatch re-encodes byte-identical rows, so keeping
    any one row per candidate_id is exact, not a heuristic)."""
    return spark.read.parquet(os.path.join(out_dir, "index")).dropDuplicates(
        ["candidate_id"]
    )


def run_ann_index_build(
    candidates: DataFrame,
    out_dir: str,
    n_centroids: int = 16,
    m: int = 16,
    n_codes: int = 16,
    residual: bool = True,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    audit_queries: DataFrame | None = None,
    n_probe: int = 4,
    shortlist: int = 200,
    k: int = 5,
    recall_floor: float = 0.8,
) -> AnnIndexBuild:
    """Fit, encode, persist, manifest — and optionally audit recall on
    a bounded query sample against the JUST-PERSISTED artifacts (the
    audit serves from disk, so it gates what production will load, not
    an in-memory twin)."""
    probe = candidates.select(_as_double(F.col(vec_col)).alias("v")).first()
    if probe is None:
        raise ValueError("run_ann_index_build: empty candidate frame")
    dim = len(probe["v"])

    # the SAME fit (hyperparameters and all) the hash-checked registered
    # queries run — quantizers persisted here are byte-identical to what
    # ivfpq_topk would fit on this corpus+config
    coarse, models = fit_ivfpq_quantizers(
        candidates,
        n_centroids=n_centroids,
        m=m,
        n_codes=n_codes,
        seed=seed,
        residual=residual,
        id_col=id_col,
        vec_col=vec_col,
    )

    index = ivfpq_index(
        candidates, coarse, models, id_col=id_col, vec_col=vec_col,
        residual=residual,
    )
    index.write.mode("overwrite").parquet(os.path.join(out_dir, "index"))
    config = {
        "n_centroids": n_centroids,
        "m": m,
        "n_codes": n_codes,
        "residual": residual,
        "seed": seed,
        "dim": dim,
    }
    _save_quantizers(out_dir, coarse, models, config)

    spark = candidates.sparkSession
    stored = load_ann_index(spark, out_dir)
    manifest = stored.groupBy("cell").agg(
        F.count("*").alias("n_vectors")
    ).select(
        "cell",
        "n_vectors",
        F.lit(n_centroids).alias("n_centroids"),
        F.lit(m).alias("m"),
        F.lit(n_codes).alias("n_codes"),
        F.lit(residual).alias("residual"),
    )

    audit = None
    if audit_queries is not None:
        served = ann_index_search(
            audit_queries, candidates, out_dir,
            k=k, shortlist=shortlist, n_probe=n_probe,
            id_col=id_col, vec_col=vec_col,
        ).select("query_id", "candidate_id").withColumn("hit", F.lit(1))
        exact = brute_force_topk(
            audit_queries, candidates, k=k, id_col=id_col, vec_col=vec_col
        ).select("query_id", "candidate_id")
        audit = (
            exact.join(served, ["query_id", "candidate_id"], "left")
            .withColumn("hit", F.coalesce(F.col("hit"), F.lit(0)))
            .groupBy("query_id")
            .agg(
                (F.sum("hit") / F.count("*")).alias("recall"),
                (F.sum("hit") >= recall_floor * F.count("*")).alias("recall_ok"),
            )
        )

    return AnnIndexBuild(
        index=stored, manifest=manifest, audit=audit, coarse=coarse, models=models
    )


def ann_index_search(
    queries: DataFrame,
    corpus: DataFrame,
    out_dir: str,
    k: int = 5,
    shortlist: int = 200,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Serve from the persisted artifacts: probe → ADC over stored
    codes → shortlist → exact re-rank against ``corpus`` (the index
    stores codes, not vectors — the re-rank reads shortlist·|Q| raw
    vectors from the corpus, exactly like ``ivfpq_search``)."""
    spark = queries.sparkSession
    coarse, models, config = load_ann_quantizers(out_dir)
    return ivfpq_search(
        queries,
        load_ann_index(spark, out_dir),
        corpus,
        coarse,
        models,
        k=k,
        shortlist=shortlist,
        n_probe=n_probe,
        id_col=id_col,
        vec_col=vec_col,
        residual=bool(config["residual"]),
    )


def run_streaming_index_updates(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str = "vec_id bigint, label bigint, embedding array<float>",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Incremental index maintenance under Structured Streaming: an
    AvailableNow file stream over ``source_dir``; each microbatch is
    ONE narrow ``ivfpq_index`` pass against the PERSISTED quantizers
    (no refit, no rescan of existing rows — the FAISS ``add``
    contract), appended to the index store. The checkpoint makes file
    progress exactly-once; a crash-replayed batch re-appends
    byte-identical rows, which ``load_ann_index``'s dropDuplicates
    collapses (the documented at-least-once-append + idempotent-read
    pairing). Returns the finished StreamingQuery."""
    coarse, models, config = load_ann_quantizers(out_dir)
    residual = bool(config["residual"])

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        ivfpq_index(
            batch_df, coarse, models, id_col=id_col, vec_col=vec_col,
            residual=residual,
        ).write.mode("append").parquet(os.path.join(out_dir, "index"))

    q = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
