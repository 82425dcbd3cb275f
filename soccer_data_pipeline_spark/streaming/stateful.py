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


HH_STATE_SCHEMA = T.StructType(
    [
        T.StructField("tokens", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("n_seen", T.LongType()),
    ]
)

HH_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.LongType()),
        T.StructField("token", T.StringType()),
        T.StructField("est_count", T.LongType()),
        T.StructField("n_seen", T.LongType()),
    ]
)


def sharded_heavy_hitters(
    tokens: DataFrame, capacity: int = 8, shard_col: str = "shard"
) -> DataFrame:
    """tokens(shard, token) stream → per-shard Misra–Gries heavy-hitter
    summaries, one row per tracked token per batch.

    The scale-correct streaming heavy-hitter shape: the token stream is
    pre-sharded (``shard = pmod(hash(token), n_shards)`` upstream, so a
    token's occurrences all land in one shard), each shard maintains a
    Misra–Gries summary of at most ``capacity`` counters, and the
    cross-shard union of emitted rows is the candidate set. Total state
    is n_shards × capacity entries — INDEPENDENT of stream length and
    vocabulary size, unlike the exact batch form
    (plans/analytics_queries.heavy_hitter_tokens) whose agg carries the
    whole vocabulary. MG guarantee per shard: any token with true count
    > n_seen/(capacity+1) is present, and estimates undercount by at
    most n_seen/(capacity+1).
    """

    def update(
        key: tuple, pdfs, state: GroupState
    ):
        (shard,) = key
        if state.exists:
            toks, counts, n_seen = state.get
            summary = dict(zip(list(toks), list(counts)))
        else:
            summary, n_seen = {}, 0
        for pdf in pdfs:
            for tok in pdf["token"]:
                tok = str(tok)
                n_seen += 1
                if tok in summary:
                    summary[tok] += 1
                elif len(summary) < capacity:
                    summary[tok] = 1
                else:
                    # decrement-all step: drop every counter by one,
                    # evicting zeros — the classic MG space bound
                    summary = {t: c - 1 for t, c in summary.items() if c > 1}
        items = sorted(summary.items())
        state.update((list(t for t, _ in items), list(c for _, c in items), n_seen))
        yield pd.DataFrame(
            {
                "shard": [shard] * len(items),
                "token": [t for t, _ in items],
                "est_count": [c for _, c in items],
                "n_seen": [n_seen] * len(items),
            }
        )

    return tokens.groupBy(shard_col).applyInPandasWithState(
        update,
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
