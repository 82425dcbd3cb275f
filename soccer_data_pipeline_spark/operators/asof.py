"""[beyond-ref] As-of and range (interval) joins — operators Spark has
no native physical operator for (pyspark_guide "As-of / range join").

``asof_join``: the distributed sort-based construction — tag both
sides, union, one hash-partition by key + sort by (time, side), then a
running ``last(..., ignorenulls)`` carries the most recent right-side
row onto each left row. Cost: ONE shuffle of L+R and one sort —
exactly what a native as-of operator would do; no per-key loops, no
Python. (The ``pd.merge_asof``-in-``applyInPandas`` alternative ships
every group through Arrow; this stays JVM-side.)

``range_join_bucketed``: |t_L − t_R| ≤ window joins explode into a
bucket equi-join: bucket = floor(t / window); each left row probes its
own and both neighbor buckets, then an exact filter. Work scales with
matches-per-bucket, never |L|×|R|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_time <= left_time (direction='backward'; 'forward' mirrors).

    Right side should be unique per (key, time) — pre-aggregate for a
    deterministic result (ties on time are otherwise arbitrary in any
    engine's as-of).
    """
    sign = 1 if direction == "backward" else -1
    # NTZ timestamps (parquet isAdjustedToUTC=false) can't feed
    # unix_micros directly; cast to TIMESTAMP first (session TZ is UTC).
    _us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    lt, rt = _us(F.col(left_time)), _us(F.col(right_time))

    l_tagged = left.select(
        F.col(left_key).alias("_k"),
        (lt * sign).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in right_cols],
    )
    r_tagged = right.select(
        F.col(right_key).alias("_k"),
        (rt * sign).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tagged.schema["_l"].dataType).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    u = l_tagged.unionByName(r_tagged)
    # right rows (_side=0) sort before left rows at equal time → a right
    # row AT the left timestamp is visible to it (<= semantics).
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "_side",
        "_l",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}")
            for c in right_cols
        ],
    ).where(F.col("_side") == 1)
    return filled.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_r_{c}").alias(c) for c in right_cols],
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    max_gap_seconds: int,
) -> DataFrame:
    """All (left, right) pairs with equal keys and
    |left_time − right_time| ≤ max_gap_seconds.

    Bucketized: equi-join on (key, bucket) with each left row probing
    bucket−1/bucket/bucket+1, then the exact predicate. At 100 TB the
    shuffle key (key, bucket) keeps partitions bounded; a naive
    key-only join would put a customer's whole history in one task.
    """
    lb = F.floor(F.unix_micros(F.col(left_time)) / (max_gap_seconds * 1_000_000))
    rb = F.floor(F.unix_micros(F.col(right_time)) / (max_gap_seconds * 1_000_000))
    l = left.withColumn(
        "_bucket", F.explode(F.array(lb - 1, lb, lb + 1))
    ).withColumn("_lk", F.col(left_key))
    r = right.withColumn("_bucket", rb).withColumn("_rk", F.col(right_key))
    joined = l.join(
        r, (F.col("_lk") == F.col("_rk")) & (l["_bucket"] == r["_bucket"])
    )
    # Resolve the time columns through the side references — with bare
    # F.col the filter is ambiguous whenever both sides name their time
    # column the same (the common event-to-event case).
    gap_ok = (
        F.abs(F.unix_micros(l[left_time]) - F.unix_micros(r[right_time]))
        <= max_gap_seconds * 1_000_000
    )
    return (
        joined.where(gap_ok)
        .drop(l["_bucket"])
        .drop(r["_bucket"])
        .drop("_lk", "_rk")
    )
