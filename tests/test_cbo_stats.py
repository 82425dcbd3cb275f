"""Cost-based-optimizer statistics surface: ANALYZE TABLE feeds the
catalog, and the optimizer can read those stats back into plan
estimates. The join_cardinality_estimate query audits the ARITHMETIC;
this test proves the ENGINE wiring (collect → store → plan) works, so
a 100 TB deployment can trust `ANALYZE TABLE` + CBO join reordering.
"""

from __future__ import annotations

import pyspark.sql.functions as F


def test_analyze_table_stats_reach_catalog_and_plans(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS cbo_probe")
    (
        spark.range(0, 1000)
        .select(F.col("id"), (F.col("id") % 7).alias("k"))
        .write.mode("overwrite")
        .saveAsTable("cbo_probe")
    )
    try:
        spark.sql("ANALYZE TABLE cbo_probe COMPUTE STATISTICS FOR COLUMNS id, k")

        # 1. table-level stats are in the catalog
        desc = {
            r.col_name: r.data_type
            for r in spark.sql("DESCRIBE TABLE EXTENDED cbo_probe").collect()
        }
        stats = desc.get("Statistics", "")
        assert "1000 rows" in stats, stats

        # 2. column-level stats are in the catalog
        kdesc = {
            r.info_name: r.info_value
            for r in spark.sql("DESCRIBE TABLE EXTENDED cbo_probe k").collect()
        }
        assert kdesc.get("distinct_count") == "7", kdesc

        # 3. with CBO on, the optimized plan carries the row count
        old = spark.conf.get("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.enabled", "true")
        try:
            df = spark.table("cbo_probe").where(F.col("k") == 3)
            stats_str = df._jdf.queryExecution().optimizedPlan().stats().toString()
            assert "rowCount" in stats_str, stats_str
        finally:
            spark.conf.set("spark.sql.cbo.enabled", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS cbo_probe")
