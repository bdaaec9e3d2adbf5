from etsd_time_series_database_spark.streaming.ingest import (
    SOURCE_REGISTRY,
    carry_forward_batch,
    dedup_stream,
    ingest_to_parquet,
    register_source,
    replay,
    session_gaps,
    sim_source,
    union_sources,
    windowed_aggregate,
)
from etsd_time_series_database_spark.streaming.stateful import (
    carry_forward_stream,
    counter_rate_stream,
)

__all__ = [
    "SOURCE_REGISTRY",
    "carry_forward_batch",
    "carry_forward_stream",
    "counter_rate_stream",
    "dedup_stream",
    "ingest_to_parquet",
    "register_source",
    "replay",
    "session_gaps",
    "sim_source",
    "union_sources",
    "windowed_aggregate",
]
