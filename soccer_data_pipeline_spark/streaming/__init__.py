from .incremental import run_incremental_etl
from .joins import streaming_interval_join
from .windows import streaming_dedup, streaming_session_agg, streaming_tumbling_agg

__all__ = [
    "run_incremental_etl",
    "streaming_tumbling_agg",
    "streaming_session_agg",
    "streaming_dedup",
]
