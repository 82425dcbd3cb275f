"""S6-S9 sink round-trips: partitioned staging layout + warehouse tables."""

from __future__ import annotations

from soccer_data_pipeline_spark.pipeline import run_soccer_etl
from soccer_data_pipeline_spark.sources.lookup import leagues_from_pairs
from soccer_data_pipeline_spark.sources.sinks import (
    create_table_as,
    with_run_metrics,
    write_staging,
)

from .fixtures_soccer import LEAGUES, write_fixture_tree


def test_staging_partition_layout_and_roundtrip(spark, tmp_path):
    root = write_fixture_tree(str(tmp_path / "raw"))
    out = run_soccer_etl(spark, root, leagues_from_pairs(spark, LEAGUES))
    staging = str(tmp_path / "staging")
    write_staging(out.matches_normalized, staging)
    back = spark.read.parquet(staging)
    assert back.count() == out.matches_normalized.count()
    # partition columns materialized in the path (S7 layout)
    assert "ingest_date" in back.columns and "league" in back.columns
    import glob
    import os

    part_dirs = glob.glob(os.path.join(staging, "ingest_date=*", "league=*"))
    assert len(part_dirs) >= 2  # one dir per league

    # partition pruning: a league filter must prune to that league's dir
    pruned = back.where(back.league == "Deutsche Bundesliga")
    plan = pruned.explain(extended=False) or pruned._jdf.queryExecution().executedPlan().toString()
    assert pruned.count() == 4


def test_ctas_and_metrics(spark, tmp_path):
    root = write_fixture_tree(str(tmp_path / "raw"))
    out = run_soccer_etl(spark, root, leagues_from_pairs(spark, LEAGUES))
    observed = with_run_metrics(out.matches_normalized)
    create_table_as(spark, "season_results_test", out.season_results)
    assert spark.table("season_results_test").count() == out.season_results.count()
    n = observed.count()
    assert n == 9
    spark.sql("DROP TABLE season_results_test")


def test_compaction_reduces_files(spark, tmp_path):
    import glob
    import os

    from soccer_data_pipeline_spark.sources.sinks import compact_parquet

    path = str(tmp_path / "many_small")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.repartition(40).write.parquet(path)
    before = len(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    assert before >= 40
    n_rows = li.count()
    after = compact_parquet(spark, path, target_bytes=64 * 1024 * 1024)
    assert after < before
    assert spark.read.parquet(path).count() == n_rows

    # a stale __old dir (crashed prior swap) must fail fast with the
    # recovery hint, not die mid-rename (ADVICE r2)
    import pytest

    os.mkdir(path + "__old")
    with pytest.raises(RuntimeError, match="recover"):
        compact_parquet(spark, path, target_bytes=64 * 1024 * 1024)


def test_bucketed_table_join_has_no_shuffle_on_bucket_key(spark, tmp_path):
    from soccer_data_pipeline_spark.sources.sinks import write_bucketed_table

    # warehouse dir is a static conf; the unique table name isolates us
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    write_bucketed_table(orders, "orders_bucketed_t", "o_custkey", n_buckets=8)
    t = spark.table("orders_bucketed_t")
    agg = t.groupBy("o_custkey").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    # bucketed layout satisfies the groupBy distribution → no Exchange
    assert "Exchange" not in plan
    assert agg.count() == orders.select("o_custkey").distinct().count()
    spark.sql("DROP TABLE orders_bucketed_t")


def test_scan_budget_preflight(spark, tmp_path):
    """Cost-guard analog of the reference's --maximum_bytes_billed
    (README.md:167): plan-time refusal, partition-pruning-aware."""
    import pytest
    from pyspark.sql import functions as F

    from soccer_data_pipeline_spark.sources.sinks import (
        ScanBudgetExceeded,
        enforce_scan_budget,
        preflight_scan_bytes,
    )

    path = str(tmp_path / "part_events")
    rows = spark.range(2000).select(
        "id", (F.col("id") % 4).alias("bucket"), F.sha1(F.col("id").cast("string")).alias("payload")
    )
    rows.write.partitionBy("bucket").parquet(path)

    full = spark.read.parquet(path)
    pruned = full.where(F.col("bucket") == 1)
    est_full, est_pruned = preflight_scan_bytes(full), preflight_scan_bytes(pruned)
    assert est_full > 0
    # static partition pruning must be reflected in the preflight estimate
    assert est_pruned < est_full

    # within budget: pass-through; over budget: refuse BEFORE running
    assert enforce_scan_budget(pruned, est_full) is pruned
    with pytest.raises(ScanBudgetExceeded):
        enforce_scan_budget(full, est_pruned)

    # Exchange-bearing plans (join + agg): under AQE the executed plan
    # root is an AdaptiveSparkPlanExec leaf wrapper — the estimate must
    # still come from the real file scans, i.e. ~sum of both inputs,
    # NOT a multiplicative join-output estimate and NOT silently 0
    # (ADVICE r2, medium).
    dim_path = str(tmp_path / "dim")
    spark.range(4).select(
        F.col("id").alias("bucket"), F.concat(F.lit("name_"), "id").alias("bname")
    ).write.parquet(dim_path)
    dim = spark.read.parquet(dim_path)
    joined_agg = (
        full.join(dim, "bucket").groupBy("bname").count()
    )
    est_join = preflight_scan_bytes(joined_agg)
    assert est_join > 0, "budget silently unenforced on exchange plans"
    # both scan listings, within 2x slack (listing vs logical estimates)
    assert est_join <= 2 * (est_full + preflight_scan_bytes(dim))
    # pruning still reflected through the join
    pruned_join = (
        full.where(F.col("bucket") == 1).join(dim, "bucket").groupBy("bname").count()
    )
    assert preflight_scan_bytes(pruned_join) < est_join


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Source-side schema evolution (the 100 TB reality: years of
    files, columns added over time): mergeSchema unions the per-file
    schemas, old files read the new column as NULL, and an explicit
    reader schema keeps working against both vintages."""
    import pyspark.sql.functions as F

    p = str(tmp_path / "evolving")
    spark.range(0, 5).select(F.col("id"), F.lit("a").alias("v")).write.parquet(
        f"{p}/batch=1"
    )
    spark.range(5, 8).select(
        F.col("id"), F.lit("b").alias("v"), F.lit(7).alias("added")
    ).write.parquet(f"{p}/batch=2")

    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) >= {"id", "v", "added"}
    rows = {r.id: r.added for r in merged.collect()}
    assert rows[0] is None and rows[7] == 7 and len(rows) == 8

    # explicit reader schema: stable projection over both vintages
    explicit = spark.read.schema("id long, v string, added int").parquet(p)
    assert explicit.where(F.col("added").isNull()).count() == 5
