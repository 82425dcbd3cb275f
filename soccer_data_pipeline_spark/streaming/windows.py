"""Streaming event-time windows — the continuous twins of the batch
event ops in plans/llm_queries (SURVEY §2.10).

Watermarked tumbling/sliding aggregation and native gap-based session
windows. The batch forms (date_trunc / lag+cumsum) are the
oracle-checked semantics; these run the same logic over an unbounded
source with bounded state:

- watermark bounds state: windows older than (max event time − delay)
  are finalized and dropped — without it, state grows forever.
- ``session_window`` merges rows into [start, last+gap) intervals
  per key, the streaming-native form of the lag+cumsum trick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_tumbling_agg(
    events: DataFrame,
    window_len: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling count/sum per (window, event_type) with late-data bound."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_len), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / F.lit(100.0)).alias(
                "sum_value"
            ),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def streaming_session_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session windows per user (session_window merges rows
    whose timestamps are within ``gap`` of the session's end)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / F.lit(100.0)).alias(
                "session_value"
            ),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
    within_watermark: bool = True,
) -> DataFrame:
    """Streaming exact dedup on ``keys`` with BOUNDED state.

    ``dropDuplicatesWithinWatermark`` keeps a key's fingerprint only
    until the watermark passes it, so state size tracks the watermark
    horizon, not stream history — the only viable form at 100 TB/day
    ingest (plain ``dropDuplicates`` on a stream retains every key seen
    forever). Duplicates arriving within the watermark window are
    dropped; a re-send after the horizon re-emits (at-least-once
    contract — pair with the batch exact-dedup for final storage).
    """
    keys = keys or ["event_id"]
    wm = events.withWatermark("ts", watermark)
    if within_watermark:
        return wm.dropDuplicatesWithinWatermark(keys)
    return wm.dropDuplicates(keys)
