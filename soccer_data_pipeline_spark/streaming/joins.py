"""Watermarked stream-stream joins (SURVEY §2.9 streaming family).

Joining two unbounded streams requires BOUNDED state on both sides:
each side buffers rows only until the watermark says no matching row
can still arrive. Two things bound that buffer:

- a watermark on each input (late-data horizon), and
- an event-time range constraint in the join condition (how far apart
  matching timestamps can be).

Without the range constraint, Spark must keep every row forever (any
future row might match) and the state store grows without bound — the
join still "works" on a toy run and falls over at 100 TB/day. With it,
state per key is ``O(watermark + interval)`` regardless of stream
length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    interval: str = "10 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two event streams on ``key`` where the right event lands in
    ``(left.ts, left.ts + interval]``.

    The canonical attribution shape (view → click within N minutes).
    Both inputs are watermarked and the join condition carries the
    event-time range, so each side's buffered state is bounded by
    ``watermark + interval`` — the only stream-stream join shape that
    survives unbounded input. ``how='left_outer'`` additionally emits
    unmatched left rows once the watermark passes their match horizon
    (outer results are inherently watermark-delayed).
    """
    l = (  # noqa: E741
        left.withWatermark("ts", watermark)
        .select(
            F.col(key).alias("l_key"),
            F.col("ts").alias("l_ts"),
            F.col("event_id").alias("l_event_id"),
        )
    )
    r = right.withWatermark("ts", watermark).select(
        F.col(key).alias("r_key"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
    )
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {interval}"))
    )
    joined = l.join(r, cond, how)
    return joined.select(
        F.col("l_key").alias(key),
        "l_event_id",
        "r_event_id",
        "l_ts",
        "r_ts",
    )


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
    how: str = "left",
) -> DataFrame:
    """Enrich an event stream with a STATIC dimension (broadcast
    stream-static join) — the zero-state streaming join shape.

    Unlike a stream-stream join, a stream-static join keeps NO
    streaming state: each micro-batch plans a plain batch join against
    the dimension, so no watermark is required and nothing accumulates.
    The dimension is broadcast-hinted — at 100 TB/day of stream the
    dim lookup must never become a per-batch shuffle; if the dimension
    outgrows broadcast, pre-bucket it on the key instead.

    For file/table-backed dimensions Spark re-resolves the static side
    per micro-batch, so slowly-changing dims are picked up on batch
    boundaries without restarting the query (the lookup-refresh
    pattern; the exactly-once MERGE sink in incremental.py is the
    write-side twin).
    """
    return stream.join(F.broadcast(dim), on=key, how=how)
