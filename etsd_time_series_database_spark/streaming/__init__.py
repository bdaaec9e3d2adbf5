from etsd_time_series_database_spark.streaming.ingest import (
    SOURCE_REGISTRY,
    carry_forward_batch,
    ingest_to_parquet,
    register_source,
    session_gaps,
    sim_source,
    windowed_aggregate,
)

__all__ = [
    "SOURCE_REGISTRY",
    "carry_forward_batch",
    "ingest_to_parquet",
    "register_source",
    "session_gaps",
    "sim_source",
    "windowed_aggregate",
]
