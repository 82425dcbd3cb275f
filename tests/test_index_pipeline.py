"""ANN index-build pipeline (index_pipeline.py) — the similarity-tier
analog of the corpus-build integration tests: persisted-artifact
round-trips, streaming incremental maintenance, manifest/audit
invariants, and equality with the in-memory operators the registered
queries hash-check.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from soccer_data_pipeline_spark.index_pipeline import (
    ann_index_search,
    load_ann_index,
    load_ann_quantizers,
    run_ann_index_build,
    run_streaming_index_updates,
)
from soccer_data_pipeline_spark.operators.similarity import (
    ivfpq_index,
    ivfpq_search,
)
from soccer_data_pipeline_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _sides(spark):
    emb = load_table(spark, SF, "embeddings")
    return emb.where(F.col("vec_id") < 10), emb.where(F.col("vec_id") >= 10)


def test_build_persist_reload_search_identical(spark, tmp_path):
    """Persisted-artifact serving == the in-memory operator: search
    through load_ann_quantizers + parquet index returns row-identical
    (query, rank) -> candidate maps to ivfpq_search on the build's own
    in-memory frames."""
    q, c = _sides(spark)
    out_dir = str(tmp_path / "ann")
    built = run_ann_index_build(
        c, out_dir, n_centroids=8, m=16, n_codes=8, residual=True,
        audit_queries=q, n_probe=4, shortlist=50,
    )
    served = ann_index_search(q, c, out_dir, k=5, shortlist=50, n_probe=4)
    mem = ivfpq_search(
        q, built.index, c, built.coarse, built.models,
        k=5, shortlist=50, n_probe=4, residual=True,
    )
    key = lambda rs: {(r.query_id, r.rn): r.candidate_id for r in rs}  # noqa: E731
    assert key(served.collect()) == key(mem.collect())

    # quantizer JSON round-trip is exact (grid ints)
    coarse2, models2, config = load_ann_quantizers(out_dir)
    assert coarse2.centers_q == built.coarse.centers_q
    assert [m.centers_q for m in models2] == [m.centers_q for m in built.models]
    assert config["residual"] is True and config["m"] == 16


def test_manifest_and_audit_invariants(spark, tmp_path):
    """Per-cell manifest counts sum to the corpus; the recall audit
    (served from the persisted artifacts) passes its floor on every
    query; cells are within the configured range."""
    q, c = _sides(spark)
    out_dir = str(tmp_path / "ann")
    built = run_ann_index_build(
        c, out_dir, n_centroids=8, m=16, n_codes=8, residual=True,
        audit_queries=q, n_probe=8, shortlist=200,
    )
    man = built.manifest.collect()
    assert sum(r.n_vectors for r in man) == c.count()
    assert all(0 <= r.cell < 8 for r in man)
    audit = built.audit.collect()
    assert len(audit) == 10
    bad = [r.query_id for r in audit if not r.recall_ok]
    assert not bad, f"persisted-index recall below floor for {bad}"


def test_streaming_incremental_updates_equal_one_shot(spark, tmp_path):
    """The FAISS add contract under Structured Streaming: build from a
    base slice, stream the remaining vectors as two parquet files
    through run_streaming_index_updates (AvailableNow + checkpoint),
    and the final persisted index must search row-identically to a
    one-shot index over the full corpus under the SAME quantizers —
    cells/codes are per-row functions of the persisted constants.
    A second stream run over the same directory (fresh checkpoint —
    the at-least-once replay worst case) must change nothing."""
    q, c = _sides(spark)
    base = c.where(F.col("vec_id") % 3 != 0)
    new = c.where(F.col("vec_id") % 3 == 0)
    out_dir = str(tmp_path / "ann")
    built = run_ann_index_build(
        base, out_dir, n_centroids=8, m=16, n_codes=8, residual=True,
    )

    src = str(tmp_path / "incoming")
    new1 = new.where(F.col("vec_id") % 2 == 0)
    new2 = new.where(F.col("vec_id") % 2 == 1)
    new1.write.parquet(src)
    new2.write.mode("append").parquet(src)

    run_streaming_index_updates(
        spark, src, out_dir, str(tmp_path / "ckpt"),
        schema=spark.read.parquet(src).schema,
    )
    stored = load_ann_index(spark, out_dir)
    assert stored.count() == c.count()

    # one-shot encode of the FULL corpus under the same quantizers
    one_shot = ivfpq_search(
        q,
        ivfpq_index(c, built.coarse, built.models, residual=True),
        c, built.coarse, built.models, k=5, shortlist=50, n_probe=4,
        residual=True,
    )
    served = ann_index_search(q, c, out_dir, k=5, shortlist=50, n_probe=4)
    key = lambda rs: {(r.query_id, r.rn): r.candidate_id for r in rs}  # noqa: E731
    assert key(served.collect()) == key(one_shot.collect())

    # replay worst case: a fresh checkpoint re-appends every file;
    # the idempotent loader must collapse it
    run_streaming_index_updates(
        spark, src, out_dir, str(tmp_path / "ckpt2"),
        schema=spark.read.parquet(src).schema,
    )
    assert load_ann_index(spark, out_dir).count() == c.count()
    served2 = ann_index_search(q, c, out_dir, k=5, shortlist=50, n_probe=4)
    assert key(served2.collect()) == key(one_shot.collect())


def test_raw_encoding_config_round_trip(spark, tmp_path):
    """residual=False persists and serves through the same surface
    (config stamp routes the decode), and the two encodings produce
    different stored codes on the same corpus."""
    q, c = _sides(spark)
    d_res = str(tmp_path / "res")
    d_raw = str(tmp_path / "raw")
    run_ann_index_build(c, d_res, n_centroids=8, m=16, n_codes=8, residual=True)
    run_ann_index_build(c, d_raw, n_centroids=8, m=16, n_codes=8, residual=False)
    assert load_ann_quantizers(d_raw)[2]["residual"] is False
    res_rows = {
        r.candidate_id: tuple(r[f"code{s}"] for s in range(16))
        for r in load_ann_index(spark, d_res).collect()
    }
    raw_rows = {
        r.candidate_id: tuple(r[f"code{s}"] for s in range(16))
        for r in load_ann_index(spark, d_raw).collect()
    }
    assert res_rows.keys() == raw_rows.keys()
    assert any(res_rows[i] != raw_rows[i] for i in res_rows)
    # raw serving path still returns k rows per query
    got = ann_index_search(q, c, d_raw, k=5, shortlist=50, n_probe=4)
    per_q = got.groupBy("query_id").count().collect()
    assert len(per_q) == 10 and all(r["count"] == 5 for r in per_q)
