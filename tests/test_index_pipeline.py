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
    rebalance_cell,
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


def test_rebalance_cell_splits_hot_cell_and_serves(spark, tmp_path):
    """Index lifecycle (VERDICT r11 #5): splitting the manifest-argmax
    cell grows the coarse quantizer by one, re-encodes ONLY that cell's
    members, preserves every candidate, measurably improves the max
    cell share, and the post-rebalance recall audit (served from the
    rewritten disk artifacts) passes its floor on every query."""
    import glob

    q, c = _sides(spark)
    out_dir = str(tmp_path / "ann")
    # n_centroids=4 concentrates enough rows per cell for a visible split
    run_ann_index_build(c, out_dir, n_centroids=4, m=16, n_codes=8,
                        residual=True)
    files_before = {
        p: os.stat(p).st_mtime_ns
        for p in glob.glob(os.path.join(out_dir, "index", "cell=*", "*.parquet"))
    }
    before, after, audit = rebalance_cell(
        spark, c, out_dir, audit_queries=q, n_probe=4, shortlist=200,
    )
    b = {r.cell: r.n_vectors for r in before.collect()}
    a = {r.cell: r.n_vectors for r in after.collect()}
    hot = max(b, key=lambda x: (b[x], -x))
    # bounded-IO contract: every file of every NON-hot cell directory is
    # byte-untouched (same path, same mtime) — the rewrite only deleted
    # the hot directory and appended re-encoded rows
    untouched = {
        p: t for p, t in files_before.items()
        if f"{os.sep}cell={hot}{os.sep}" not in p
    }
    files_after = {
        p: os.stat(p).st_mtime_ns
        for p in glob.glob(os.path.join(out_dir, "index", "cell=*", "*.parquet"))
    }
    assert untouched.items() <= files_after.items()
    assert sum(a.values()) == sum(b.values()) == c.count()
    # quantizer grew by one and the config stamp tracks it
    coarse2, _, config2 = load_ann_quantizers(out_dir)
    assert len(coarse2.centers_q) == 5 and config2["n_centroids"] == 5
    # the hot cell's load strictly decreased (its members now spread
    # over sub-cells {hot, 4} — and possibly others, by re-assignment)
    assert a.get(hot, 0) < b[hot]
    assert max(a.values()) <= max(b.values())
    # recall audit from the rewritten artifacts: floor holds per query
    rows = audit.collect()
    assert len(rows) == 10
    bad = [r.query_id for r in rows if not r.recall_ok]
    assert not bad, f"post-rebalance recall below floor for {bad}"
    # serving still returns k rows per query through the same surface
    got = ann_index_search(q, c, out_dir, k=5, shortlist=200, n_probe=4)
    per_q = got.groupBy("query_id").count().collect()
    assert len(per_q) == 10 and all(r["count"] == 5 for r in per_q)


def test_residual_requires_deterministic_kmeans(spark):
    """ADVICE r11: a legacy (non-DeterministicKMeans) coarse quantizer
    on the residual paths raises a descriptive ValueError up front, not
    an AttributeError mid-plan."""
    import pytest

    from soccer_data_pipeline_spark.operators.similarity import (
        fit_pq_codebooks,
    )

    _, c = _sides(spark)
    cand = c.select("vec_id", F.col("embedding"))

    class FakeLegacyModel:  # stands in for a pre-r11 Spark-ML KMeansModel
        pass

    with pytest.raises(ValueError, match="residual encoding requires"):
        fit_pq_codebooks(
            cand.select(
                F.col("vec_id").alias("candidate_id"),
                F.col("embedding").cast("array<double>").alias("cv"),
            ),
            FakeLegacyModel(), m=16, n_codes=8, sub=4, residual=True,
        )
    with pytest.raises(ValueError, match="residual encoding requires"):
        ivfpq_index(c, FakeLegacyModel(), models=[], residual=True)


def test_streaming_rejects_mis_dimensioned_batch(spark, tmp_path):
    """ADVICE r11: a batch whose vectors do not match the persisted
    config dim fails the stream loudly instead of appending corrupt
    codes."""
    import pytest

    _, c = _sides(spark)
    out_dir = str(tmp_path / "ann")
    run_ann_index_build(c, out_dir, n_centroids=8, m=16, n_codes=8)

    src = str(tmp_path / "incoming")
    bad = c.limit(3).select(
        "vec_id", "label", F.slice("embedding", 1, 32).alias("embedding")
    )
    bad.write.parquet(src)
    before = load_ann_index(spark, out_dir).count()
    with pytest.raises(Exception, match="dim 32 != persisted index dim 64"):
        run_streaming_index_updates(
            spark, src, out_dir, str(tmp_path / "ckpt"),
            schema=spark.read.parquet(src).schema,
        )
    # nothing corrupt was appended
    assert load_ann_index(spark, out_dir).count() == before


def test_registered_query_serves_from_persisted_index(spark):
    """similarity_index_served (VERDICT r11 #1): the registered query's
    physical plan reads the index PARQUET from the persisted build dir
    — the serving contract is disk artifacts, not the in-process
    quantizer warm cache — and both in-plan gates are TRUE."""
    from soccer_data_pipeline_spark.plans import llm_queries

    out = llm_queries.similarity_index_served(spark, SF)
    rows = out.collect()
    assert rows and all(r.recall_ok and r.served_matches_memory for r in rows)

    out_dir = llm_queries._ANN_INDEX_BUILDS[SF][0]
    assert os.path.isdir(os.path.join(out_dir, "index"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert out_dir in plan, "plan does not scan the persisted index dir"


def test_loader_dedup_is_deterministic_on_changed_rows(spark, tmp_path):
    """ADVICE r11: out-of-contract re-stream of an existing id with a
    CHANGED embedding — the loader keeps ONE deterministic row (max
    code-struct) across repeated reads, not an arbitrary-per-scan row."""
    _, c = _sides(spark)
    out_dir = str(tmp_path / "ann")
    built = run_ann_index_build(c, out_dir, n_centroids=8, m=16, n_codes=8)

    # append a conflicting encode of an existing id (embedding reversed)
    changed = c.limit(1).select(
        "vec_id", F.reverse("embedding").alias("embedding")
    )
    ivfpq_index(changed, built.coarse, built.models).write.mode(
        "append"
    ).parquet(os.path.join(out_dir, "index"))

    rows1 = {r.candidate_id: r for r in load_ann_index(spark, out_dir).collect()}
    rows2 = {r.candidate_id: r for r in load_ann_index(spark, out_dir).collect()}
    assert len(rows1) == c.count()
    assert {k: tuple(v) for k, v in rows1.items()} == {
        k: tuple(v) for k, v in rows2.items()
    }


def test_serving_scan_statically_prunes_to_probed_cells(spark, tmp_path):
    """ADVICE r12: the serving path resolves the query batch's probed
    cells driver-side and filters the RAW index read below the loader's
    dedup, so the cell predicate lands in the scan's PartitionFilters
    (static pruning — not dependent on DPP through the aggregate) and
    only the probed cells' directories are read."""
    q, c = _sides(spark)
    out_dir = str(tmp_path / "ann")
    run_ann_index_build(c, out_dir, n_centroids=8, m=16, n_codes=8,
                        residual=True)
    served = ann_index_search(q, c, out_dir, k=5, shortlist=50, n_probe=2)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = served._jdf.queryExecution().explainString(mode)
    index_scans = [
        b for b in plan.split("\n\n")
        if "Scan parquet" in b and f"{out_dir}/index" in b
    ]
    assert index_scans, "no parquet scan over the index directory in the plan"
    for b in index_scans:
        pf = b.split("PartitionFilters: [")[1].split("]")[0]
        assert "cell" in pf and " IN " in pf, (
            f"index scan PartitionFilters [{pf}] — cell pruning "
            "did not reach the scan"
        )

    # pruning is exact: the pruned serving result is row-identical to a
    # search over the UNPRUNED loader output under the same quantizers
    from soccer_data_pipeline_spark.index_pipeline import (
        load_ann_quantizers as _lq,
    )

    coarse, models, config = _lq(out_dir)
    unpruned = ivfpq_search(
        q, load_ann_index(spark, out_dir), c, coarse, models,
        k=5, shortlist=50, n_probe=2, residual=True,
    )
    key = lambda rs: {(r.query_id, r.rn): r.candidate_id for r in rs}  # noqa: E731
    assert key(served.collect()) == key(unpruned.collect())


def test_rebalance_refuses_uncovered_members(spark, tmp_path):
    """ADVICE r12: rebalancing with a `candidates` frame that does not
    cover every hot-cell member (the base corpus after streamed
    appends) raises BEFORE deleting anything — the index must never
    silently shrink."""
    import pytest

    _, c = _sides(spark)
    base = c.where(F.col("vec_id") % 3 != 0)
    new = c.where(F.col("vec_id") % 3 == 0)
    out_dir = str(tmp_path / "ann")
    built = run_ann_index_build(base, out_dir, n_centroids=4, m=16, n_codes=8)
    # stream-style append of the remaining vectors under the same quantizers
    ivfpq_index(new, built.coarse, built.models).write.mode(
        "append"
    ).partitionBy("cell").parquet(os.path.join(out_dir, "index"))
    n_total = load_ann_index(spark, out_dir).count()
    assert n_total == c.count()

    with pytest.raises(ValueError, match="missing from `candidates`"):
        rebalance_cell(spark, base, out_dir)
    # nothing was deleted or rewritten
    assert load_ann_index(spark, out_dir).count() == n_total
    assert len(load_ann_quantizers(out_dir)[0].centers_q) == 4

    # the full corpus passes the guard and rebalances normally
    before, after, _ = rebalance_cell(spark, c, out_dir)
    assert sum(r.n_vectors for r in after.collect()) == n_total


def test_stream_across_rebalance_rejects_stale_epoch(spark, tmp_path):
    """VERDICT r12 #2: a stream that loaded its quantizers BEFORE a
    rebalance must fail its next microbatch loudly (epoch assert), not
    append rows encoded under the stale quantizer into the new layout."""
    from unittest.mock import patch

    import pytest

    from soccer_data_pipeline_spark import index_pipeline

    _, c = _sides(spark)
    base = c.where(F.col("vec_id") % 3 != 0)
    new = c.where(F.col("vec_id") % 3 == 0)
    out_dir = str(tmp_path / "ann")
    run_ann_index_build(base, out_dir, n_centroids=4, m=16, n_codes=8)
    assert load_ann_quantizers(out_dir)[2]["epoch"] == 0

    # the stream's view of the world: quantizers as of stream start
    stale = load_ann_quantizers(out_dir)

    # rebalance lands mid-stream — epoch bumps on disk
    rebalance_cell(spark, base, out_dir)
    assert load_ann_quantizers(out_dir)[2]["epoch"] == 1

    src = str(tmp_path / "incoming")
    new.write.parquet(src)
    n_before = load_ann_index(spark, out_dir).count()
    with patch.object(index_pipeline, "load_ann_quantizers", return_value=stale):
        with pytest.raises(Exception, match="epoch advanced 0 -> 1"):
            run_streaming_index_updates(
                spark, src, out_dir, str(tmp_path / "ckpt"),
                schema=spark.read.parquet(src).schema,
            )
    # the stale batch appended nothing
    assert load_ann_index(spark, out_dir).count() == n_before

    # a RESTARTED stream (current quantizers, epoch 1 == 1) succeeds
    run_streaming_index_updates(
        spark, src, out_dir, str(tmp_path / "ckpt2"),
        schema=spark.read.parquet(src).schema,
    )
    assert load_ann_index(spark, out_dir).count() == c.count()


def test_compact_index_cells_bounded_and_lossless(spark, tmp_path):
    """Index lifecycle: small-file compaction (r13) — repeated
    streaming-style appends fragment each cell directory; compaction
    rewrites ONLY the targeted cells into one file each, preserves the
    loader's output exactly (same rows, same search results), leaves
    non-target cells byte-untouched, and does NOT advance the epoch
    (layout-only rewrite — a running stream stays valid)."""
    import glob

    from soccer_data_pipeline_spark.index_pipeline import compact_index_cells

    q, c = _sides(spark)
    base = c.where(F.col("vec_id") % 4 == 1)
    out_dir = str(tmp_path / "ann")
    built = run_ann_index_build(base, out_dir, n_centroids=4, m=16, n_codes=8)
    # three streaming-style appends fragment every cell directory
    for m_ in (2, 3, 0):
        ivfpq_index(
            c.where(F.col("vec_id") % 4 == m_), built.coarse, built.models
        ).write.mode("append").partitionBy("cell").parquet(
            os.path.join(out_dir, "index")
        )

    def files(cell):
        return sorted(
            glob.glob(os.path.join(out_dir, "index", f"cell={cell}", "*.parquet"))
        )

    rows_before = sorted(
        map(tuple, load_ann_index(spark, out_dir).collect())
    )
    served_before = sorted(
        map(tuple, ann_index_search(q, c, out_dir, k=5, n_probe=4).collect())
    )
    counts_before = {cell: len(files(cell)) for cell in range(4)}
    fragmented = [cell for cell, n in counts_before.items() if n > 2]
    assert fragmented, "appends did not fragment any cell"
    target = fragmented[0]
    others_mtimes = {
        p: os.stat(p).st_mtime_ns
        for cell in range(4)
        if cell != target
        for p in files(cell)
    }
    epoch_before = load_ann_quantizers(out_dir)[2]["epoch"]

    result = compact_index_cells(spark, out_dir, cells=[target])
    assert result == {target: (counts_before[target], 1)}
    assert len(files(target)) == 1
    # non-target cells byte-untouched; epoch unchanged
    assert others_mtimes == {
        p: os.stat(p).st_mtime_ns
        for cell in range(4)
        if cell != target
        for p in files(cell)
    }
    assert load_ann_quantizers(out_dir)[2]["epoch"] == epoch_before
    # lossless: loader rows and search results identical
    assert rows_before == sorted(
        map(tuple, load_ann_index(spark, out_dir).collect())
    )
    assert served_before == sorted(
        map(tuple, ann_index_search(q, c, out_dir, k=5, n_probe=4).collect())
    )

    # default sweep compacts every remaining fragmented cell
    swept = compact_index_cells(spark, out_dir, min_files=1)
    assert all(after == 1 for _, after in swept.values())
    assert rows_before == sorted(
        map(tuple, load_ann_index(spark, out_dir).collect())
    )


def test_rebuild_in_place_advances_epoch_and_rejects_stale_stream(spark, tmp_path):
    """An in-place REBUILD over an existing index directory must also
    advance the epoch (a rebuild that reset it to 0 would let a stream
    started before it pass the 0 == 0 check against CHANGED
    quantizers) — same reject discipline as the rebalance case."""
    from unittest.mock import patch

    import pytest

    from soccer_data_pipeline_spark import index_pipeline

    _, c = _sides(spark)
    out_dir = str(tmp_path / "ann")
    run_ann_index_build(c, out_dir, n_centroids=8, m=16, n_codes=8)
    assert load_ann_quantizers(out_dir)[2]["epoch"] == 0
    stale = load_ann_quantizers(out_dir)

    # rebuild in place with a DIFFERENT quantizer config
    run_ann_index_build(c, out_dir, n_centroids=4, m=16, n_codes=8)
    assert load_ann_quantizers(out_dir)[2]["epoch"] == 1

    src = str(tmp_path / "incoming")
    c.limit(5).write.parquet(src)
    n_before = load_ann_index(spark, out_dir).count()
    with patch.object(index_pipeline, "load_ann_quantizers", return_value=stale):
        with pytest.raises(Exception, match="epoch advanced 0 -> 1"):
            run_streaming_index_updates(
                spark, src, out_dir, str(tmp_path / "ckpt"),
                schema=spark.read.parquet(src).schema,
            )
    assert load_ann_index(spark, out_dir).count() == n_before
