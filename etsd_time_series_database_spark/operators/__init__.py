from etsd_time_series_database_spark.operators.asof import asof_join
from etsd_time_series_database_spark.operators.range_stats import (
    downsample,
    etsd_ks,
    first_crossing,
    gaps,
    interpolated_total,
    range_stats,
    rate,
    reconstruct_from_deltas,
    rollover_corrected,
    time_of_extreme,
    value_at,
)

__all__ = [
    "asof_join",
    "downsample",
    "etsd_ks",
    "first_crossing",
    "gaps",
    "interpolated_total",
    "range_stats",
    "rate",
    "reconstruct_from_deltas",
    "rollover_corrected",
    "time_of_extreme",
    "value_at",
]
