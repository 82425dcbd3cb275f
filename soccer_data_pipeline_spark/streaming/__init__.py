from .incremental import (
    merge_upsert_batch,
    read_sketch_estimates,
    run_incremental_etl,
    run_incremental_merge,
    run_incremental_sketch_store,
)
from .joins import stream_static_enrich, streaming_interval_join
from .windows import streaming_dedup, streaming_session_agg, streaming_tumbling_agg

__all__ = [
    "run_incremental_etl",
    "run_incremental_merge",
    "run_incremental_sketch_store",
    "read_sketch_estimates",
    "merge_upsert_batch",
    "streaming_tumbling_agg",
    "streaming_session_agg",
    "streaming_dedup",
    "streaming_interval_join",
    "stream_static_enrich",
]
