from etsd_time_series_database_spark.operators.asof import asof_join, asof_join_scalable
from etsd_time_series_database_spark.operators.range_stats import (
    counter_total,
    downsample,
    etsd_ks,
    exact_percentiles,
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
from etsd_time_series_database_spark.operators.sketches import (
    approx_distinct,
    approx_percentiles,
)
from etsd_time_series_database_spark.operators.reshape import to_long, to_wide
from etsd_time_series_database_spark.operators.scalable_window import (
    cumsum_scalable,
    lag_stitched,
    rate_scalable,
    rollover_corrected_scalable,
)
from etsd_time_series_database_spark.operators.skew import salted_agg, salted_join

__all__ = [
    "approx_distinct",
    "approx_percentiles",
    "asof_join",
    "asof_join_scalable",
    "counter_total",
    "cumsum_scalable",
    "downsample",
    "exact_percentiles",
    "etsd_ks",
    "first_crossing",
    "gaps",
    "interpolated_total",
    "lag_stitched",
    "range_stats",
    "rate",
    "rate_scalable",
    "reconstruct_from_deltas",
    "rollover_corrected",
    "rollover_corrected_scalable",
    "salted_agg",
    "salted_join",
    "time_of_extreme",
    "to_long",
    "to_wide",
    "value_at",
]
