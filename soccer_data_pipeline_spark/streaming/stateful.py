"""Custom stateful streaming operator (SURVEY §2.10 / pyspark_guide
"Stateful"): per-user running statistics with
``applyInPandasWithState``.

Demonstrates the full custom-operator surface Spark offers when
built-in windowed aggs can't express the semantics: arbitrary state
schema, per-group pandas logic, timeout-driven eviction. The example
keeps a per-user running (count, sum, max gap) and emits one row per
batch per active user — a template for online featurizers / anomaly
detectors over unbounded streams.

State is bounded by key cardinality (not stream length) and evicted
via processing-time timeout, so the operator holds at 100 TB/day as
long as the active-key working set fits the cluster's state store.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total_cents", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("max_gap_us", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_gap_us", T.LongType()),
    ]
)


def user_running_stats(events: DataFrame, evict_idle_ms: int = 0) -> DataFrame:
    """events(user_id, ts, value) stream → per-user running stats.

    ``evict_idle_ms > 0`` enables processing-time state eviction for
    always-on deployments. Leave 0 for ``Trigger.AvailableNow``
    drains: a processing-time timeout keeps the query scheduling empty
    epochs to fire timeouts, so an AvailableNow run never terminates.

    The update function is a closure so ``evict_idle_ms`` ships inside
    the pickled function to every worker (module globals don't — a
    fresh worker re-imports the module and would see the default).
    """

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        n, total_cents, last_ts_us, max_gap_us = (
            state.get if state.exists else (0, 0, None, 0)
        )
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            for ts, value in zip(pdf["ts"], pdf["value"]):
                ts_us = int(pd.Timestamp(ts).value // 1000)
                if last_ts_us is not None:
                    max_gap_us = max(max_gap_us, ts_us - last_ts_us)
                last_ts_us = ts_us
                n += 1
                total_cents += int(round(float(value) * 100))
        state.update((n, total_cents, last_ts_us, max_gap_us))
        if evict_idle_ms:
            state.setTimeoutDuration(evict_idle_ms)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total_cents / 100.0],
                "max_gap_us": [max_gap_us],
            }
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if evict_idle_ms
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
