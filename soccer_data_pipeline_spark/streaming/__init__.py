from .incremental import (
    merge_upsert_batch,
    run_incremental_etl,
    run_incremental_merge,
)
from .joins import streaming_interval_join
from .windows import streaming_dedup, streaming_session_agg, streaming_tumbling_agg

__all__ = [
    "run_incremental_etl",
    "run_incremental_merge",
    "merge_upsert_batch",
    "streaming_tumbling_agg",
    "streaming_session_agg",
    "streaming_dedup",
]
