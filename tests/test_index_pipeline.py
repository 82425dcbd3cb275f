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


def test_fit_pq_codebooks_batched_equals_per_subspace(spark):
    """r16 (VERDICT r15 #3): the one-collect batched codebook fit must
    be bit-identical to the per-subspace fit_deterministic_kmeans calls
    it replaced — same sample, same quantization, same _fit_local
    arithmetic, m times."""
    from soccer_data_pipeline_spark.operators.kmeans import (
        fit_deterministic_kmeans,
    )
    from soccer_data_pipeline_spark.operators.similarity import (
        _as_double,
        fit_pq_codebooks,
    )

    _, c = _sides(spark)
    cand = c.select(
        F.col("vec_id").alias("candidate_id"),
        _as_double(F.col("embedding")).alias("cv"),
    )
    m, n_codes, sub = 4, 4, 16
    batched = fit_pq_codebooks(cand, None, m=m, n_codes=n_codes, sub=sub)
    subcols = [
        F.slice(F.col("cv"), s * sub + 1, sub).alias(f"s{s}") for s in range(m)
    ]
    cand_sub = cand.select("candidate_id", *subcols)
    reference = [
        fit_deterministic_kmeans(
            cand_sub.select("candidate_id", f"s{s}"),
            k=n_codes,
            n_iters=4,
            id_col="candidate_id",
            vec_col=f"s{s}",
        )
        for s in range(m)
    ]
    for s in range(m):
        assert batched[s].centers_q == reference[s].centers_q, f"subspace {s}"
        assert batched[s].q == reference[s].q


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


def test_serving_plan_with_tombstones_prunes_and_broadcasts(spark, tmp_path):
    """r14 deletion path plan shape: with tombstones pending, the
    serving plan must KEEP the static cell PartitionFilters (the
    anti-join sits above the pruned scan, not below it) and execute
    the tombstone exclusion as a broadcast left-anti join — never a
    shuffled join against the kilobyte tombstone frame."""
    from soccer_data_pipeline_spark.index_pipeline import delete_ids

    q, c = _sides(spark)
    out_dir = str(tmp_path / "ann")
    run_ann_index_build(c, out_dir, n_centroids=8, m=16, n_codes=8,
                        residual=True)
    delete_ids(spark, out_dir, [int(c.orderBy("vec_id").first().vec_id)])
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
            f"index scan PartitionFilters [{pf}] — tombstone anti-join "
            "broke static cell pruning"
        )
    anti = [
        ln for ln in plan.splitlines()
        if "LeftAnti" in ln and "BroadcastHashJoin" in ln
    ]
    assert anti, "tombstone exclusion is not a broadcast left-anti join"


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


def test_delete_ids_hidden_immediately_and_survivor_identical(spark, tmp_path):
    """Deletion contract (r14, VERDICT r13 #1): tombstoned ids vanish
    from every read and search IMMEDIATELY (no file rewrite), serving
    over the survivors is row-identical to an in-memory search over an
    encode of the SURVIVING corpus under the same quantizers, and
    re-appending a deleted id does not resurrect it."""
    from soccer_data_pipeline_spark.index_pipeline import delete_ids

    q, c = _sides(spark)
    out_dir = str(tmp_path / "ann")
    built = run_ann_index_build(
        c, out_dir, n_centroids=8, m=16, n_codes=8, residual=True,
    )
    # delete each query's served top-1 — ids that WOULD be returned
    top1 = ann_index_search(q, c, out_dir, k=1, shortlist=50, n_probe=8)
    doomed = sorted({int(r.candidate_id) for r in top1.collect()})
    index_files_before = {
        p: os.stat(p).st_mtime_ns
        for p in _all_index_files(out_dir)
    }
    n = delete_ids(spark, out_dir, doomed)
    assert n == len(doomed)
    # O(|ids|) writer: no index file touched
    assert index_files_before == {
        p: os.stat(p).st_mtime_ns for p in _all_index_files(out_dir)
    }

    stored = load_ann_index(spark, out_dir)
    assert stored.where(F.col("candidate_id").isin(doomed)).count() == 0
    survivors = c.where(~F.col("vec_id").isin(doomed))
    assert stored.count() == survivors.count()

    served = ann_index_search(q, c, out_dir, k=5, shortlist=50, n_probe=8)
    assert served.where(F.col("candidate_id").isin(doomed)).count() == 0
    mem = ivfpq_search(
        q, ivfpq_index(survivors, built.coarse, built.models, residual=True),
        survivors, built.coarse, built.models,
        k=5, shortlist=50, n_probe=8, residual=True,
    )
    key = lambda rs: {(r.query_id, r.rn): r.candidate_id for r in rs}  # noqa: E731
    assert key(served.collect()) == key(mem.collect())

    # idempotent re-delete; a DataFrame of ids (any column name) works
    delete_ids(spark, out_dir, q.sparkSession.createDataFrame(
        [(doomed[0],)], "vec_id bigint"
    ))
    assert load_ann_index(spark, out_dir).count() == survivors.count()

    # a tombstone outranks an append: re-streaming a deleted id's row
    # does not resurrect it
    ivfpq_index(
        c.where(F.col("vec_id") == doomed[0]), built.coarse, built.models,
        residual=True,
    ).write.mode("append").partitionBy("cell").parquet(
        os.path.join(out_dir, "index")
    )
    assert (
        load_ann_index(spark, out_dir)
        .where(F.col("candidate_id") == doomed[0])
        .count()
        == 0
    )


def _all_index_files(out_dir):
    import glob

    return sorted(
        glob.glob(os.path.join(out_dir, "index", "cell=*", "*.parquet"))
    )


def test_purge_deleted_bounded_rewrite_preserves_tombstones(spark, tmp_path):
    """purge_deleted physically reclaims tombstoned rows: only the
    affected cells' files are rewritten (untouched cells byte-
    identical), the RAW parquet no longer contains the ids, search
    output is unchanged by the purge, and the epoch does not advance
    (layout-only — streams stay valid). The tombstone store is
    PRESERVED by default (compacted) — a checkpoint-lost replay that
    re-appends a purged id must still find it hidden (review r14) —
    and cleared only with the explicit opt-in flag."""
    from soccer_data_pipeline_spark.index_pipeline import (
        delete_ids,
        load_tombstones,
        purge_deleted,
    )

    q, c = _sides(spark)
    out_dir = str(tmp_path / "ann")
    run_ann_index_build(c, out_dir, n_centroids=8, m=16, n_codes=8)
    raw = spark.read.parquet(os.path.join(out_dir, "index"))
    # tombstone every member of ONE cell plus one member of another —
    # exactly two affected cells
    cells = sorted(
        int(r.cell) for r in raw.select("cell").distinct().collect()
    )
    doomed = [
        int(r.candidate_id)
        for r in raw.where(F.col("cell") == cells[0]).collect()
    ] + [
        int(
            raw.where(F.col("cell") == cells[1])
            .orderBy("candidate_id")
            .first()
            .candidate_id
        )
    ]
    delete_ids(spark, out_dir, doomed)
    served_before = sorted(
        map(tuple, ann_index_search(q, c, out_dir, k=5, n_probe=8).collect())
    )
    untouched_mtimes = {
        p: os.stat(p).st_mtime_ns
        for p in _all_index_files(out_dir)
        if f"cell={cells[0]}" not in p and f"cell={cells[1]}" not in p
    }

    purged = purge_deleted(spark, out_dir)
    assert set(purged) == {cells[0], cells[1]}
    assert sum(purged.values()) == len(doomed)
    # store preserved (compacted to one deduped file) — NOT cleared
    tomb_after = load_tombstones(spark, out_dir)
    assert tomb_after is not None
    assert {int(r.candidate_id) for r in tomb_after.collect()} == set(doomed)
    raw2 = spark.read.parquet(os.path.join(out_dir, "index"))
    assert raw2.where(F.col("candidate_id").isin(doomed)).count() == 0
    assert raw2.count() == c.count() - len(doomed)
    assert untouched_mtimes == {
        p: os.stat(p).st_mtime_ns
        for p in _all_index_files(out_dir)
        if f"cell={cells[0]}" not in p and f"cell={cells[1]}" not in p
    }
    assert load_ann_quantizers(out_dir)[2]["epoch"] == 0
    assert served_before == sorted(
        map(tuple, ann_index_search(q, c, out_dir, k=5, n_probe=8).collect())
    )

    # the replay worst case the standing store exists for: a purged
    # id's row re-appended (index append committed, checkpoint lost)
    # stays hidden
    coarse, models, _cfg = load_ann_quantizers(out_dir)
    ivfpq_index(
        c.where(F.col("vec_id") == doomed[0]), coarse, models,
        residual=bool(_cfg["residual"]),
    ).write.mode("append").partitionBy("cell").parquet(
        os.path.join(out_dir, "index")
    )
    assert (
        load_ann_index(spark, out_dir)
        .where(F.col("candidate_id") == doomed[0])
        .count()
        == 0
    )

    # explicit opt-in clears the store; then purge is a no-op
    purge_deleted(spark, out_dir, clear_tombstones=True)
    assert purge_deleted(spark, out_dir) == {}


def test_rebuild_clears_tombstones_and_rebalance_skips_deleted(spark, tmp_path):
    """A full in-place rebuild declares fresh truth (stale tombstones
    must not hide a legitimately re-added id), and rebalance_cell
    treats tombstoned ids as non-members (the coverage guard does not
    demand vectors the corpus dropped; the rewrite purges them)."""
    from soccer_data_pipeline_spark.index_pipeline import delete_ids

    _, c = _sides(spark)
    out_dir = str(tmp_path / "ann")
    run_ann_index_build(c, out_dir, n_centroids=8, m=16, n_codes=8)
    some_id = int(c.orderBy("vec_id").first().vec_id)
    delete_ids(spark, out_dir, [some_id])
    assert (
        load_ann_index(spark, out_dir)
        .where(F.col("candidate_id") == some_id)
        .count()
        == 0
    )
    run_ann_index_build(c, out_dir, n_centroids=8, m=16, n_codes=8)
    assert (
        load_ann_index(spark, out_dir)
        .where(F.col("candidate_id") == some_id)
        .count()
        == 1
    )

    # delete a few ids, then rebalance the hot cell with the SURVIVING
    # corpus only — the guard must not raise, and counts drop by
    # exactly the hot cell's tombstoned members (physically purged by
    # the rewrite; other cells keep theirs hidden read-side)
    manifest = load_ann_index(spark, out_dir).groupBy("cell").agg(
        F.count("*").alias("n")
    ).collect()
    hot = max(manifest, key=lambda r: (r.n, -r.cell)).cell
    hot_members = [
        int(r.candidate_id)
        for r in spark.read.parquet(os.path.join(out_dir, "index"))
        .where(F.col("cell") == hot)
        .orderBy("candidate_id")
        .limit(2)
        .collect()
    ]
    delete_ids(spark, out_dir, hot_members)
    survivors = c.where(~F.col("vec_id").isin(hot_members))
    before, after, _ = rebalance_cell(spark, survivors, out_dir, cell=int(hot))
    assert (
        sum(r.n_vectors for r in after.collect())
        == sum(r.n_vectors for r in before.collect())
    )
    assert load_ann_index(spark, out_dir).count() == survivors.count()


def test_corpus_drop_decisions_propagate_to_served_index(spark, tmp_path):
    """The corpus-build → delete → serve closure (VERDICT r13 #1): the
    semantic tier's drop decisions (the same action ledger
    run_corpus_build consumes) are deleted from a PERSISTED index, and
    the served results never contain a dropped id while every served
    id is a kept one."""
    from soccer_data_pipeline_spark.index_pipeline import delete_ids
    from soccer_data_pipeline_spark.operators.semdedup import semantic_actions

    q, c = _sides(spark)
    out_dir = str(tmp_path / "ann")
    run_ann_index_build(c, out_dir, n_centroids=8, m=16, n_codes=8)
    actions = semantic_actions(c)
    drops = actions.where(F.col("action") == "drop_semantic").select("vec_id")
    kept = {
        int(r.vec_id)
        for r in actions.where(F.col("action") == "keep").collect()
    }
    n = delete_ids(spark, out_dir, drops)
    assert n == actions.count() - len(kept)
    served = ann_index_search(q, c, out_dir, k=5, shortlist=50, n_probe=8)
    served_ids = {int(r.candidate_id) for r in served.collect()}
    assert served_ids <= kept
    assert served.groupBy("query_id").count().agg(
        F.min("count")
    ).first()[0] == 5


def test_merge_cells_inverse_lifecycle(spark, tmp_path):
    """merge_cells (r14, VERDICT r13 #5 — the split's inverse): merging
    two cells shrinks the quantizer k -> k-1 with counts preserved,
    re-encodes ONLY the two merged cells' members (every other cell's
    files byte-untouched; the swapped-in LAST cell's files are the
    SAME bytes under a renamed directory — codes survive the slot
    move bit-for-bit), advances the epoch, and the post-merge recall
    audit served from the rewritten artifacts passes its floor."""
    import glob

    import pytest

    from soccer_data_pipeline_spark.index_pipeline import merge_cells

    q, c = _sides(spark)
    out_dir = str(tmp_path / "ann")
    run_ann_index_build(c, out_dir, n_centroids=8, m=16, n_codes=8,
                        residual=True)
    rows_before = {
        r.candidate_id: r for r in load_ann_index(spark, out_dir).collect()
    }
    last_ids = {
        cid for cid, r in rows_before.items() if r.cell == 7
    }
    files_before = {
        p: os.stat(p).st_mtime_ns for p in _all_index_files(out_dir)
    }

    with pytest.raises(ValueError, match="must differ"):
        merge_cells(spark, c, out_dir, cell_a=2, cell_b=2)
    with pytest.raises(ValueError, match="cells must be in"):
        merge_cells(spark, c, out_dir, cell_a=0, cell_b=8)

    # merge 0 and 1 explicitly: drop=1 != last=7, so the rename path
    # runs. Audit at probe-all: the gate here checks the REWRITE kept
    # every neighbor reachable (merging two POPULOUS cells deliberately
    # costs partial-probe routing — the audit exists to measure that;
    # the production default merges the two coldest, where it doesn't)
    before, after, audit = merge_cells(
        spark, c, out_dir, cell_a=0, cell_b=1,
        audit_queries=q, n_probe=7, shortlist=200,
    )
    b = {r.cell: r.n_vectors for r in before.collect()}
    a = {r.cell: r.n_vectors for r in after.collect()}
    assert sum(a.values()) == sum(b.values()) == c.count()
    coarse2, _, config2 = load_ann_quantizers(out_dir)
    assert len(coarse2.centers_q) == 7 and config2["n_centroids"] == 7
    assert config2["epoch"] == 1
    assert set(a) <= set(range(7))

    # bounded IO: cells 2..6 byte-untouched in place; old cell 7's
    # files moved (same basename, same mtime) into cell=1
    for p, t in files_before.items():
        cell = int(p.split("cell=")[1].split(os.sep)[0])
        if 2 <= cell <= 6:
            assert os.stat(p).st_mtime_ns == t, p
        elif cell == 7:
            moved = p.replace(f"cell=7{os.sep}", f"cell=1{os.sep}")
            assert os.stat(moved).st_mtime_ns == t, p
    assert not os.path.isdir(os.path.join(out_dir, "index", "cell=7"))

    # the swapped-in cell's members: identical codes, relabeled cell
    rows_after = {
        r.candidate_id: r for r in load_ann_index(spark, out_dir).collect()
    }
    assert set(rows_after) == set(rows_before)
    code_cols = [
        f for f in rows_before[next(iter(last_ids))].asDict()
        if f not in ("candidate_id", "cell")
    ]
    for cid in last_ids:
        assert rows_after[cid].cell == 1
        assert all(
            rows_after[cid][f] == rows_before[cid][f] for f in code_cols
        ), cid

    # recall audit from the rewritten artifacts
    rows = audit.collect()
    assert len(rows) == 10
    bad = [r.query_id for r in rows if not r.recall_ok]
    assert not bad, f"post-merge recall below floor for {bad}"

    # default pick (the two coldest) merges again: k -> 6, counts kept
    before2, after2, _ = merge_cells(spark, c, out_dir)
    assert sum(r.n_vectors for r in after2.collect()) == c.count()
    coarse3, _, config3 = load_ann_quantizers(out_dir)
    assert len(coarse3.centers_q) == 6 and config3["epoch"] == 2

    # serving still returns k rows per query through the same surface
    got = ann_index_search(q, c, out_dir, k=5, shortlist=200, n_probe=4)
    per_q = got.groupBy("query_id").count().collect()
    assert len(per_q) == 10 and all(r["count"] == 5 for r in per_q)


def test_merge_cells_refuses_uncovered_members(spark, tmp_path):
    """The split's coverage guard, mirrored: merging with a
    `candidates` frame that misses a merged-cell member raises BEFORE
    any destructive step — index intact, epoch unchanged."""
    import pytest

    from soccer_data_pipeline_spark.index_pipeline import merge_cells

    _, c = _sides(spark)
    out_dir = str(tmp_path / "ann")
    run_ann_index_build(c, out_dir, n_centroids=4, m=16, n_codes=8)
    n = load_ann_index(spark, out_dir).count()
    member = int(
        spark.read.parquet(os.path.join(out_dir, "index"))
        .where(F.col("cell") == 0)
        .first()
        .candidate_id
    )
    with pytest.raises(ValueError, match="missing from `candidates`"):
        merge_cells(
            spark, c.where(F.col("vec_id") != member), out_dir,
            cell_a=0, cell_b=1,
        )
    assert load_ann_index(spark, out_dir).count() == n
    assert load_ann_quantizers(out_dir)[2]["epoch"] == 0


def test_streaming_index_deletes_consume_decision_ledger(spark, tmp_path):
    """The corpus-CDC → index closure (r14): a decision-ledger stream
    tombstones every drop_* id out of the served index per microbatch,
    keeps pass through, a second ledger file lands incrementally, and
    a checkpoint-lost full replay changes nothing (tombstone appends
    dedup on read)."""
    from soccer_data_pipeline_spark.index_pipeline import (
        load_tombstones,
        run_streaming_index_deletes,
    )

    q, c = _sides(spark)
    out_dir = str(tmp_path / "ann")
    run_ann_index_build(c, out_dir, n_centroids=8, m=16, n_codes=8)
    ids = sorted(int(r.vec_id) for r in c.select("vec_id").collect())
    batch1 = [(i, "drop_semantic" if i % 5 == 0 else "keep") for i in ids[:40]]
    batch2 = [(i, "drop_near_dup" if i % 7 == 0 else "keep") for i in ids[40:80]]
    dropped = {i for i, a in batch1 + batch2 if a != "keep"}

    src = str(tmp_path / "decisions")
    spark.createDataFrame(batch1, "vec_id bigint, action string").write.parquet(src)
    run_streaming_index_deletes(spark, src, out_dir, str(tmp_path / "ck1"))
    d1 = {i for i, a in batch1 if a != "keep"}
    assert {
        int(r.candidate_id) for r in load_tombstones(spark, out_dir).collect()
    } == d1

    spark.createDataFrame(batch2, "vec_id bigint, action string").write.mode(
        "append"
    ).parquet(src)
    run_streaming_index_deletes(spark, src, out_dir, str(tmp_path / "ck1"))
    assert {
        int(r.candidate_id) for r in load_tombstones(spark, out_dir).collect()
    } == dropped
    stored = load_ann_index(spark, out_dir)
    assert stored.count() == c.count() - len(dropped)
    served = ann_index_search(q, c, out_dir, k=5, shortlist=50, n_probe=8)
    assert served.where(F.col("candidate_id").isin(list(dropped))).count() == 0

    # checkpoint-lost full replay: same tombstone set, same loader rows
    run_streaming_index_deletes(spark, src, out_dir, str(tmp_path / "ck2"))
    assert {
        int(r.candidate_id) for r in load_tombstones(spark, out_dir).collect()
    } == dropped
    assert load_ann_index(spark, out_dir).count() == c.count() - len(dropped)
