"""Z-order layout: hand-pinned interleave values (independent of the
generated oracle SQL) and the actual multi-dimensional file-skipping
property on written parquet."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pyspark.sql.functions as F

from soccer_data_pipeline_spark.functions.zorder import zvalue, zvalue_sql
from soccer_data_pipeline_spark.sources import load_table
from soccer_data_pipeline_spark.sources.sinks import write_zorder_layout

SF = "/root/testdata/sf0.001"


def _ref_interleave(vals: list[int], bits: int) -> int:
    k = len(vals)
    out = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            out += ((v >> i) & 1) << (i * k + j)
    return out


def test_zvalue_matches_hand_computed(spark):
    cases = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 0), (12345, 54321)]
    df = spark.createDataFrame(cases, "x long, y long").select(
        "x", "y", zvalue([F.col("x"), F.col("y")]).alias("z")
    )
    for x, y, z in df.collect():
        assert z == _ref_interleave([x, y], 16), (x, y)


def test_zvalue_sql_matches_spark(spark):
    import duckdb

    cases = [(3, 5), (100, 200), (65535, 65535)]
    expr = zvalue_sql(["x", "y"])
    got = duckdb.sql(
        f"SELECT {expr} FROM (VALUES {', '.join(map(str, cases))}) t(x, y)"
    ).fetchall()
    assert [g[0] for g in got] == [_ref_interleave([x, y], 16) for x, y in cases]


def test_zorder_layout_bounds_both_dims(spark, tmp_path):
    """Each z-ordered file must cover a narrow min/max band in BOTH
    dimensions: vs a 1-dim custkey sort, the day-dimension span per
    file collapses; vs the global range, the custkey span per file
    also collapses. This is the parquet-skipping property the layout
    exists for."""
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff("o_orderdate", F.lit("1970-01-01")).alias("day"),
    )
    zdir = str(tmp_path / "zorder")
    sdir = str(tmp_path / "custkey_sorted")
    write_zorder_layout(orders, zdir, ["o_custkey", "day"], n_files=8)
    (
        orders.repartitionByRange(8, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.parquet(sdir)
    )

    def spans(d, col):
        out = []
        for f in glob.glob(d + "/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
            out.append(hi - lo)
        return out

    z_day = sum(spans(zdir, "day")) / len(spans(zdir, "day"))
    s_day = sum(spans(sdir, "day")) / len(spans(sdir, "day"))
    z_ck = sum(spans(zdir, "o_custkey")) / len(spans(zdir, "o_custkey"))
    row = orders.agg(
        (F.max("o_custkey") - F.min("o_custkey")).alias("ck_range")
    ).collect()[0]
    # day locality: z-order beats the single-dim sort decisively
    assert z_day < 0.6 * s_day, (z_day, s_day)
    # custkey locality: far below the global range (files are rectangles)
    assert z_ck < 0.6 * row["ck_range"], (z_ck, row["ck_range"])
