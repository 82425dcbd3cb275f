"""operators/topk.py — the scale-safe global ranking primitives.

Each helper is differentially checked against the naive
single-partition window it replaces (the definitional form), on both
smooth and adversarial inputs, and its plan is asserted window-free /
TakeOrdered-shaped. VERDICT r6 #1 is the provenance: these primitives
exist so no vocabulary/journey/node/dim-sized frame ever funnels
through one WindowExec task.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from soccer_data_pipeline_spark.operators.topk import (
    bounded_topk,
    exclusive_prefix_offsets,
    value_bucketed_rank,
)


def _counts(spark, n=5000, mod=97):
    df = spark.range(0, n).select((F.col("id") % mod).alias("k"), F.col("id"))
    # + k%5 breaks the all-equal-counts degeneracy so ranks have real ties
    return df.groupBy("k").agg((F.count("*") + F.col("k") % 5).alias("n"))


def test_bounded_topk_matches_naive_window(spark):
    c = _counts(spark)
    w = Window.orderBy(F.desc("n"), F.asc("k"))
    ref = sorted(
        (r.k, r.n, r.rk)
        for r in c.select(
            "k", "n", F.row_number().over(w).cast("long").alias("rk")
        )
        .where(F.col("rk") <= 10)
        .collect()
    )
    got = bounded_topk(
        c,
        10,
        [F.desc("n"), F.asc("k")],
        [(-F.col("n")).alias("_s0"), F.col("k").alias("k"), F.col("n").alias("n")],
        ["k", "n"],
    )
    assert sorted((r.k, r.n, r.rk) for r in got.collect()) == ref


def test_bounded_topk_plan_is_takeordered_no_window(spark):
    c = _counts(spark)
    plan = (
        bounded_topk(
            c,
            10,
            [F.desc("n"), F.asc("k")],
            [(-F.col("n")).alias("_s0"), F.col("k").alias("k"), F.col("n").alias("n")],
            ["k", "n"],
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_bounded_topk_k_larger_than_frame_and_empty(spark):
    c = _counts(spark, n=30, mod=7)  # 7 rows < k
    got = bounded_topk(
        c,
        100,
        [F.desc("n"), F.asc("k")],
        [(-F.col("n")).alias("_s0"), F.col("k").alias("k"), F.col("n").alias("n")],
        ["k", "n"],
    ).collect()
    assert len(got) == 7 and [r.rk for r in got] == sorted(r.rk for r in got)
    empty = bounded_topk(
        c.where("k < 0"),
        5,
        [F.desc("n")],
        [(-F.col("n")).alias("_s0"), F.col("k").alias("k"), F.col("n").alias("n")],
        ["k", "n"],
    ).collect()
    assert empty == []


def test_exclusive_prefix_offsets_matches_running_total(spark):
    cnts = spark.createDataFrame(
        [("a", 3), ("b", 5), ("c", 2), ("0", 7)], "b string, n long"
    )
    offs = {r.b: r._off for r in exclusive_prefix_offsets(cnts, "b", "n").collect()}
    assert offs == {"0": 0, "a": 7, "b": 10, "c": 15}
    plan = (
        exclusive_prefix_offsets(cnts, "b", "n")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan


def test_value_bucketed_rank_matches_naive_window(spark):
    c = _counts(spark)
    w = Window.orderBy("n", "k")
    ref = {
        r.k: r.i
        for r in c.select(
            "k", F.row_number().over(w).cast("long").alias("i")
        ).collect()
    }
    got = {r.k: r.i for r in value_bucketed_rank(c, "n", ["k"], n_buckets=8).collect()}
    assert got == ref


def test_value_bucketed_rank_survives_constant_and_skewed_keys(spark):
    # all-equal sort key: the probe yields ZERO distinct boundaries, every
    # row lands in one bucket, and ties order purely by the tiebreak
    const = spark.range(0, 500).select(F.lit(7).alias("v"), F.col("id"))
    got = {r.id: r.i for r in value_bucketed_rank(const, "v", ["id"], n_buckets=8).collect()}
    assert got == {i: i + 1 for i in range(500)}
    # 90% of mass on one value: ties must never split across buckets
    skew = spark.range(0, 1000).select(
        F.when(F.col("id") < 900, 5).otherwise(F.col("id")).alias("v"), F.col("id")
    )
    w = Window.orderBy("v", "id")
    ref = {
        r.id: r.i
        for r in skew.select("id", F.row_number().over(w).cast("long").alias("i")).collect()
    }
    got2 = {r.id: r.i for r in value_bucketed_rank(skew, "v", ["id"], n_buckets=8).collect()}
    assert got2 == ref


def test_value_bucketed_rank_prefit_boundaries_skip_probe(spark):
    """Prefit boundaries must produce identical ranks with no probe job
    (the pq_topk(models=...) pattern) — even deliberately terrible
    boundaries only unbalance buckets, never change the ranks."""
    c = _counts(spark)
    ref = {r.k: r.i for r in value_bucketed_rank(c, "n", ["k"], n_buckets=8).collect()}
    for bounds in ([0.0], [1e18], [-5.0, 37.0, 37.0, 1e9], []):
        got = {
            r.k: r.i
            for r in value_bucketed_rank(
                c, "n", ["k"], boundaries=bounds
            ).collect()
        }
        assert got == ref, bounds


def test_exclusive_prefix_offsets_property_random_counts(spark):
    """Property: for seeded random bucket tables (string and int
    buckets, including zero counts), every offset equals the Python
    running total over the sorted buckets."""
    import random

    rng = random.Random(13)
    for trial in range(3):
        items = [
            (f"b{rng.randrange(50):02d}", rng.randrange(0, 7))
            for _ in range(rng.randrange(1, 40))
        ]
        # buckets must be unique keys (the helper takes a count table)
        table = {}
        for b, n in items:
            table[b] = table.get(b, 0) + n
        rows = sorted(table.items())
        expected, run = {}, 0
        for b, n in rows:
            expected[b] = run
            run += n
        cnts = spark.createDataFrame(rows, "b string, n long")
        got = {
            r.b: r._off
            for r in exclusive_prefix_offsets(cnts, "b", "n").collect()
        }
        assert got == expected, trial


def test_value_bucketed_rank_beyond_double_precision(spark):
    """Keys past 2^53: the bucket probe casts to double, so adjacent
    longs collapse to EQUAL doubles — assignment must stay monotone
    (same double → same bucket) while the LONG key + tiebreak keep the
    within-bucket order exact. This is the extreme-cents regime the
    100 TB contract promises (per-customer cent sums approaching
    int64)."""
    base = 2 ** 53
    rows = [(base + i, i) for i in range(200)]
    df = spark.createDataFrame(rows, "v long, id long")
    w = Window.orderBy("v", "id")
    ref = {
        r.id: r.i
        for r in df.select(
            "id", F.row_number().over(w).cast("long").alias("i")
        ).collect()
    }
    got = {r.id: r.i for r in value_bucketed_rank(df, "v", ["id"], n_buckets=8).collect()}
    assert got == ref


def test_value_bucketed_prefix_sum_matches_naive_window(spark):
    from soccer_data_pipeline_spark.operators.topk import value_bucketed_prefix_sum

    c = _counts(spark).withColumn("m", (F.col("n") * 3 + F.col("k")) % 11)
    w = (
        Window.orderBy("n", "k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ref = {
        (r.k): (r.cn, r.cm)
        for r in c.select(
            "k",
            F.sum("n").over(w).cast("long").alias("cn"),
            F.sum("m").over(w).cast("long").alias("cm"),
        ).collect()
    }
    got = {
        r.k: (r.cum_n, r.cum_m)
        for r in value_bucketed_prefix_sum(
            c, "n", ["n", "m"], tiebreak=["k"], n_buckets=8
        ).collect()
    }
    assert got == ref


def test_value_bucketed_prefix_sum_constant_key_and_prefit(spark):
    from soccer_data_pipeline_spark.operators.topk import value_bucketed_prefix_sum

    # all-equal key: zero boundaries, one bucket, order = tiebreak only
    const = spark.range(0, 300).select(
        F.lit(7).alias("v"), F.col("id"), F.lit(2).cast("long").alias("w")
    )
    got = {
        r.id: r.cum_w
        for r in value_bucketed_prefix_sum(
            const, "v", ["w"], tiebreak=["id"], n_buckets=8
        ).collect()
    }
    assert got == {i: 2 * (i + 1) for i in range(300)}
    # prefit (even terrible) boundaries: same totals, no probe job
    c = _counts(spark)
    ref = {
        r.k: r.cum_n
        for r in value_bucketed_prefix_sum(c, "n", ["n"], tiebreak=["k"]).collect()
    }
    for bounds in ([0.0], [1e18], [-5.0, 37.0, 1e9], []):
        got2 = {
            r.k: r.cum_n
            for r in value_bucketed_prefix_sum(
                c, "n", ["n"], tiebreak=["k"], boundaries=bounds
            ).collect()
        }
        assert got2 == ref, bounds


def test_value_bucketed_prefix_sum_no_unpartitioned_window(spark):
    """The whole point: the plan must contain no empty-partition-spec
    window — every WindowExec it plans is partitioned by the bucket."""
    from soccer_data_pipeline_spark.operators.topk import value_bucketed_prefix_sum

    c = _counts(spark)
    plan = (
        value_bucketed_prefix_sum(c, "n", ["n"], tiebreak=["k"], boundaries=[50.0])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    window_lines = [l for l in plan.splitlines() if "windowspecdefinition" in l]
    assert window_lines, "expected the per-bucket window in the plan"
    for line in window_lines:
        assert "_b" in line, f"unpartitioned window in plan: {line}"

def test_total_col_rides_the_offsets_fold(spark):
    """r8: `total_col` must equal the exact row count on EVERY row of
    value_bucketed_rank's output (and the weight grand totals on every
    row of value_bucketed_prefix_sum's) — taken from the broadcast
    bucket fold, with no count(*)+crossJoin re-traversal in the plan."""
    from soccer_data_pipeline_spark.operators.topk import value_bucketed_prefix_sum

    c = _counts(spark)  # 97 rows
    ranked = value_bucketed_rank(c, "n", ["k"], n_buckets=8, total_col="nn")
    rows = ranked.collect()
    assert len(rows) == 97
    assert {r.nn for r in rows} == {97}
    assert sorted(r.i for r in rows) == list(range(1, 98))

    c2 = c.withColumn("m", (F.col("n") * 3 + F.col("k")) % 11)
    tot_n = c2.agg(F.sum("n")).first()[0]
    tot_m = c2.agg(F.sum("m")).first()[0]
    ps = value_bucketed_prefix_sum(
        c2, "n", ["n", "m"], tiebreak=["k"], n_buckets=8, total_prefix="tot_"
    ).collect()
    assert {r.tot_n for r in ps} == {tot_n}
    assert {r.tot_m for r in ps} == {tot_m}
    # the inclusive cumulative of the LAST row equals the grand total
    last = max(ps, key=lambda r: (r.n, r.k))
    assert last.cum_n == tot_n and last.cum_m == tot_m
