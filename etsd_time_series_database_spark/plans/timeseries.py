"""Time-series catalog queries Q01–Q19, Q23, Q27–Q34 (SURVEY.md §2.2 + §2.4).

These exercise the reference's query surface — scans, time-range
filters, as-of lookups, range aggregation (etsdAMT, reference
code/etsdQuery.c:218-401), counter rate/rollover semantics
(code/etsdSave.c:396-398, code/etsdQuery.c:332-336), RRA downsampling
(code/plugins/edoRRD.c:44-74), threshold statistics (ETSD_KS,
code/etsdQuery.h:25-55) and boundary interpolation
(code/etsdQuery.c:254,279) — over the driver's ``events`` table where
``event_type`` plays the ETSD channel role.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etsd_time_series_database_spark.functions.exprs import DEC, bucket_epoch, davg, epoch_us
from etsd_time_series_database_spark.operators.range_stats import counter_total
from etsd_time_series_database_spark.operators import (
    asof_join,
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
from etsd_time_series_database_spark.plans.registry import register
from etsd_time_series_database_spark.sources.store import load_table

# Deterministic parameters (events spans 2024-01-01 .. 2024-01-30 UTC).
T0 = "2024-01-05 00:00:00"
T1 = "2024-01-20 00:00:00"
TP = "2024-01-15 12:00:00"
K = 250.0
GAP_S = 600
A_INTERP = "2024-01-05 00:30:00"
B_INTERP = "2024-01-19 23:15:00"
A_EPOCH = 1704414600  # 2024-01-05 00:30:00 UTC
B_EPOCH = 1705706100  # 2024-01-19 23:15:00 UTC


def _events(
    spark: SparkSession,
    sf_dir: str,
    ts_range: tuple[str | None, str | None] | None = None,
) -> DataFrame:
    """events scan; pass ts_range so the predicate hits the raw parquet
    column (PushedFilters) — see sources.store.load_table."""
    return load_table(spark, sf_dir, "events", ts_range=ts_range)


@register(
    "q01_scan_project",
    "scan+project",
    """
    SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, user_id, event_type, value
    FROM events ORDER BY event_id LIMIT 100
    """,
    doc="Full scan + projection (reference O3/O5 sequential decode).",
)
def q01(spark, sf_dir):
    e = _events(spark, sf_dir)
    return (
        e.select(
            "event_id",
            epoch_us("ts").alias("ts_us"),
            "user_id",
            "event_type",
            "value",
        )
        .orderBy("event_id")
        .limit(100)
    )


@register(
    "q02_time_range_filter",
    "filter",
    f"""
    SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, event_type, value
    FROM events
    WHERE ts >= TIMESTAMP '{T0}' AND ts <= TIMESTAMP '{T1}'
    ORDER BY event_id
    """,
    doc="Time-range scan; the ts predicate reaches the Parquet scan "
    "(PushedFilters) = reference block skip O4 (code/etsdRead.c:300-353).",
    headline=True,
)
def q02(spark, sf_dir):
    e = _events(spark, sf_dir, (T0, T1))
    return (
        e.filter(
            (F.col("ts") >= F.lit(T0).cast("timestamp"))
            & (F.col("ts") <= F.lit(T1).cast("timestamp"))
        )
        .select("event_id", epoch_us("ts").alias("ts_us"), "event_type", "value")
        .orderBy("event_id")
    )


@register(
    "q03_asof_point_lookup",
    "as-of",
    f"""
    WITH f AS (SELECT * FROM events WHERE ts <= TIMESTAMP '{TP}'),
    m AS (SELECT event_type, max(ts) AS mts FROM f GROUP BY event_type)
    SELECT f.event_type,
           CAST(max(epoch_us(f.ts)) AS BIGINT) AS asof_ts_us,
           max(f.value) AS asof_value
    FROM f JOIN m ON f.event_type = m.event_type AND f.ts = m.mts
    GROUP BY f.event_type ORDER BY f.event_type
    """,
    doc="Value-at-time per channel (reference etsdVAT, code/etsdQuery.c:206-215).",
)
def q03(spark, sf_dir):
    return value_at(_events(spark, sf_dir, (None, TP)), TP)


@register(
    "q04_range_aggregate",
    "aggregate",
    f"""
    SELECT event_type,
           CAST(count(value) AS BIGINT) AS n,
           min(value) AS min_value,
           max(value) AS max_value,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(value) AS avg_value,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    WHERE ts >= TIMESTAMP '{T0}' AND ts <= TIMESTAMP '{T1}'
    GROUP BY event_type ORDER BY event_type
    """,
    doc="Per-channel min/max/avg/total over a range — the reference's core "
    "query etsdAMT (code/etsdQuery.c:316-396) for all channels in one scan.",
    headline=True,
)
def q04(spark, sf_dir):
    return range_stats(_events(spark, sf_dir, (T0, T1)), T0, T1)


@register(
    "q05_count_distinct",
    "aggregate",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(DISTINCT value) AS BIGINT) AS n_values
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q05(spark, sf_dir):
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.countDistinct("value").alias("n_values"),
        )
        .orderBy("event_type")
    )


@register(
    "q06_time_bucket",
    "time-bucket",
    f"""
    SELECT event_type,
           (epoch_us(ts) // 3600000000) * 3600 AS bucket_s,
           CAST(count(*) AS BIGINT) AS n,
           min(value) AS min_value,
           max(value) AS max_value,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(value) AS avg_value
    FROM events
    WHERE ts >= TIMESTAMP '{T0}' AND ts < TIMESTAMP '{T1}'
    GROUP BY event_type, bucket_s ORDER BY event_type, bucket_s
    """,
    doc="Tumbling-window consolidation (reference RRA AVERAGE, O22).",
    headline=True,
)
def q06(spark, sf_dir):
    e = _events(spark, sf_dir, (T0, T1)).filter(
        (F.col("ts") >= F.lit(T0).cast("timestamp"))
        & (F.col("ts") < F.lit(T1).cast("timestamp"))
    )
    return (
        e.withColumn("bucket_s", bucket_epoch("ts", 3600))
        .groupBy("event_type", "bucket_s")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            davg("value", "avg_value"),
        )
        .orderBy("event_type", "bucket_s")
    )


@register(
    "q07_delta_rate",
    "window",
    """
    WITH d AS (
      SELECT event_id, event_type,
             value - lag(value) OVER w AS dv,
             epoch_us(ts) - lag(epoch_us(ts)) OVER w AS dt_us
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    )
    SELECT event_id, event_type, dv * 1000000.0 / dt_us AS rate_per_s
    FROM d ORDER BY event_id
    """,
    doc="Counter->rate via stitched (channel, day-bucket) lag "
    "(reference delta encoding O10, code/etsdSave.c:396-398, re-derived "
    "at query time) — skew-proof default: parallelism channels x "
    "buckets, not n_channels.",
    headline=True,
)
def q07(spark, sf_dir):
    return rate(_events(spark, sf_dir))


@register(
    "q08_rollover_correction",
    "window",
    """
    WITH b AS (
      SELECT event_id, event_type, value, ts,
             CASE WHEN value < lag(value) OVER w THEN 1 ELSE 0 END AS bump
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    )
    SELECT event_id, event_type,
           value + CAST(SUM(bump) OVER (PARTITION BY event_type ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   * 4294967296.0 AS corrected_value
    FROM b ORDER BY event_id
    """,
    doc="Cumulative 2^32 rollover correction — the reference's 'bump' "
    "(code/etsdQuery.c:332-336,383) — via stitched lag + distributed "
    "prefix sum (skew-proof default).",
    headline=True,
)
def q08(spark, sf_dir):
    return rollover_corrected(_events(spark, sf_dir))


@register(
    "q09_topk_per_channel",
    "window",
    """
    WITH r AS (
      SELECT event_id, event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
      FROM events
    )
    SELECT event_type, rn, event_id, value FROM r WHERE rn <= 3
    ORDER BY event_type, rn
    """,
    doc="Top-k per channel via ranking window.",
)
def q09(spark, sf_dir):
    w = Window.partitionBy("event_type").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        _events(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("event_type", "rn", "event_id", "value")
        .orderBy("event_type", "rn")
    )


@register(
    "q10_moving_average",
    "window",
    """
    SELECT event_id, event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
             / COUNT(value) OVER w AS mov_avg
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
    doc="Moving average with an explicit ROWS frame.",
)
def q10(spark, sf_dir):
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(-5, 0)
    )
    return (
        _events(spark, sf_dir)
        .select(
            "event_id",
            "event_type",
            (
                F.sum(F.col("value").cast(DEC)).over(w).cast("double")
                / F.count("value").over(w)
            ).alias("mov_avg"),
        )
        .orderBy("event_id")
    )


@register(
    "q11_threshold_stats",
    "threshold",
    f"""
    SELECT event_type,
           CAST(SUM(CASE WHEN value > {K} THEN 1 ELSE 0 END) AS BIGINT) AS n_over,
           CAST(SUM(CASE WHEN value < {K} THEN 1 ELSE 0 END) AS BIGINT) AS n_under,
           CAST(SUM(CASE WHEN value = {K} THEN 1 ELSE 0 END) AS BIGINT) AS n_equal,
           CAST(SUM(CASE WHEN value > {K} THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE)
             / SUM(CASE WHEN value > {K} THEN 1 END) AS avg_when_over,
           CAST(SUM(CASE WHEN value < {K} THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE)
             / SUM(CASE WHEN value < {K} THEN 1 END) AS avg_when_under
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="ETSD_KS nOver/nUnder/nEqual/AWO/AWU (reference "
    "code/etsdQuery.h:25-55 — declared but stubbed in C, implemented here).",
)
def q11(spark, sf_dir):
    v = F.col("value")
    k = F.lit(K)
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.sum(F.when(v > k, 1).otherwise(0)).alias("n_over"),
            F.sum(F.when(v < k, 1).otherwise(0)).alias("n_under"),
            F.sum(F.when(v == k, 1).otherwise(0)).alias("n_equal"),
            (
                F.sum(F.when(v > k, v.cast(DEC))).cast("double")
                / F.sum(F.when(v > k, 1))
            ).alias("avg_when_over"),
            (
                F.sum(F.when(v < k, v.cast(DEC))).cast("double")
                / F.sum(F.when(v < k, 1))
            ).alias("avg_when_under"),
        )
        .orderBy("event_type")
    )


@register(
    "q12_first_crossing",
    "threshold",
    f"""
    SELECT event_type,
           MIN(CASE WHEN value > {K} THEN epoch_us(ts) END) AS first_over_us,
           MIN(CASE WHEN value < {K} THEN epoch_us(ts) END) AS first_under_us,
           MIN(CASE WHEN value = {K} THEN epoch_us(ts) END) AS first_equal_us
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="First interval crossing a constant (ETSD_KS fOver/fUnder/fEqual).",
)
def q12(spark, sf_dir):
    return first_crossing(_events(spark, sf_dir), K)


@register(
    "q13_time_of_extreme",
    "threshold",
    """
    WITH ext AS (
      SELECT event_type, min(value) AS minv, max(value) AS maxv
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           MIN(CASE WHEN e.value = x.minv THEN epoch_us(e.ts) END) AS t_min_us,
           MIN(CASE WHEN e.value = x.maxv THEN epoch_us(e.ts) END) AS t_max_us,
           MIN(x.minv) AS min_value,
           MAX(x.maxv) AS max_value
    FROM events e JOIN ext x ON e.event_type = x.event_type
    GROUP BY e.event_type ORDER BY e.event_type
    """,
    doc="Timestamp of each channel's extreme (ETSD_KS tMin/tMax); "
    "deterministic ties via earliest-ts, not engine max_by.",
)
def q13(spark, sf_dir):
    return time_of_extreme(_events(spark, sf_dir))


@register(
    "q14_gap_detection",
    "quality",
    f"""
    WITH d AS (
      SELECT event_type, value,
             epoch_us(ts) - lag(epoch_us(ts)) OVER
               (PARTITION BY event_type ORDER BY ts, event_id) AS dt_us
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           CAST(SUM(CASE WHEN dt_us > {GAP_S * 1_000_000} THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps
    FROM d GROUP BY event_type ORDER BY event_type
    """,
    doc="Invalid-sample + gap accounting (reference O28 validity words).",
)
def q14(spark, sf_dir):
    return gaps(_events(spark, sf_dir), GAP_S)


@register(
    "q15_boundary_interpolation",
    "interpolation",
    f"""
    WITH h AS (
      SELECT event_type,
             (epoch_us(ts) // 3600000000) * 3600 AS bucket_s,
             SUM(CAST(value AS DECIMAL(18,6))) AS tot
      FROM events GROUP BY event_type, bucket_s
    )
    SELECT event_type,
           CAST(SUM(CAST(tot AS DECIMAL(25,6))
                    * CAST(LEAST((bucket_s + 3600) * 1000000, {B_EPOCH * 1_000_000})
                           - GREATEST(bucket_s * 1000000, {A_EPOCH * 1_000_000})
                      AS DECIMAL(13,0))) AS DOUBLE)
             / 3600000000.0 AS interp_total
    FROM h
    WHERE (bucket_s + 3600) * 1000000 > {A_EPOCH * 1_000_000}
      AND bucket_s * 1000000 < {B_EPOCH * 1_000_000}
    GROUP BY event_type ORDER BY event_type
    """,
    doc="Pro-rata partial-interval total (reference head/tail interpolation, "
    "code/etsdQuery.c:254,279) over a non-aligned range.",
)
def q15(spark, sf_dir):
    return interpolated_total(
        _events(spark, sf_dir, ("2024-01-04 23:30:00", "2024-01-20 00:15:00")),
        A_INTERP,
        B_INTERP,
        3600,
    )


@register(
    "q16_global_topk",
    "sort",
    """
    SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, event_type, value
    FROM events ORDER BY value DESC, event_id LIMIT 50
    """,
    doc="Global top-k (TakeOrderedAndProject — no full sort at scale).",
)
def q16(spark, sf_dir):
    return (
        _events(spark, sf_dir)
        .select("event_id", epoch_us("ts").alias("ts_us"), "event_type", "value")
        .orderBy(F.col("value").desc(), F.col("event_id"))
        .limit(50)
    )


@register(
    "q17_downsample_average",
    "downsample",
    f"""
    SELECT event_type, (epoch_us(ts) // 60000000) * 60 AS bucket_s,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(value) AS avg_value
    FROM events
    WHERE ts >= TIMESTAMP '{T0}' AND ts < TIMESTAMP '{T1}'
    GROUP BY event_type, bucket_s ORDER BY event_type, bucket_s
    """,
    doc="RRA AVERAGE consolidation at 60 s (reference edoRRD O22).",
)
def q17(spark, sf_dir):
    return downsample(_events(spark, sf_dir, (T0, T1)), 60, "avg", T0, T1)


@register(
    "q18_downsample_minmax",
    "downsample",
    f"""
    SELECT event_type, (epoch_us(ts) // 60000000) * 60 AS bucket_s,
           min(value) AS min_value, max(value) AS max_value
    FROM events
    WHERE ts >= TIMESTAMP '{T0}' AND ts < TIMESTAMP '{T1}'
    GROUP BY event_type, bucket_s ORDER BY event_type, bucket_s
    """,
    doc="RRA MIN/MAX consolidation.",
)
def q18(spark, sf_dir):
    return downsample(_events(spark, sf_dir, (T0, T1)), 60, "minmax", T0, T1)


@register(
    "q19_downsample_last",
    "downsample",
    f"""
    WITH b AS (
      SELECT *, (epoch_us(ts) // 60000000) * 60 AS bucket_s
      FROM events
      WHERE ts >= TIMESTAMP '{T0}' AND ts < TIMESTAMP '{T1}'
    ),
    r AS (
      SELECT event_type, bucket_s, value,
             row_number() OVER (PARTITION BY event_type, bucket_s
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM b
    )
    SELECT event_type, bucket_s, value AS last_value
    FROM r WHERE rn = 1 ORDER BY event_type, bucket_s
    """,
    doc="RRA LAST consolidation; deterministic via (ts, event_id) ordering.",
)
def q19(spark, sf_dir):
    return downsample(_events(spark, sf_dir, (T0, T1)), 60, "last", T0, T1)


@register(
    "q23_asof_join",
    "join",
    """
    SELECT p.event_id, p.user_id,
           CAST(epoch_us(p.ts) AS BIGINT) AS p_ts_us,
           (SELECT CAST(epoch_us(max(c.ts)) AS BIGINT) FROM events c
             WHERE c.event_type = 'click' AND c.user_id = p.user_id
               AND c.ts <= p.ts) AS click_ts_us
    FROM events p WHERE p.event_type = 'purchase'
    ORDER BY event_id
    """,
    doc="As-of join: each purchase matched to the user's latest preceding "
    "click — union-tag window formulation, one shuffle, no theta join "
    "(operators/asof.py; reference etsdVAT generalized).",
    headline=True,
)
def q23(spark, sf_dir):
    e = _events(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join(purchases, clicks, on="user_id")
    return joined.select(
        "event_id",
        "user_id",
        epoch_us("ts").alias("p_ts_us"),
        epoch_us("ts_asof").alias("click_ts_us"),
    ).orderBy("event_id")


@register(
    "q78_asof_tolerance",
    "join",
    """
    SELECT p.event_id, p.user_id,
           CAST(epoch_us(p.ts) AS BIGINT) AS p_ts_us,
           (SELECT CAST(epoch_us(max(c.ts)) AS BIGINT) FROM events c
             WHERE c.event_type = 'click' AND c.user_id = p.user_id
               AND c.ts <= p.ts
               AND epoch_us(p.ts) - epoch_us(c.ts) <= 3600000000
           ) AS click_ts_us
    FROM events p WHERE p.event_type = 'purchase'
    ORDER BY event_id
    """,
    doc="Staleness-bounded as-of join (q23 with tolerance_s=3600, the "
    "kdb/merge_asof tolerance): each purchase matched to the user's "
    "latest preceding click ONLY if it is at most an hour old — the "
    "monitoring semantics 'join the latest reading unless too old to "
    "trust'. The latest-preceding row is also the closest, so "
    "'latest within tolerance' == 'latest preceding, NULLed when "
    "stale' — the bound is applied to the carried whole-row struct "
    "and can never mix right rows. Same one-shuffle union-tag plan "
    "as q23; the tolerance is a scan-side comparison.",
)
def q78(spark, sf_dir):
    e = _events(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join(purchases, clicks, on="user_id", tolerance_s=3600)
    return joined.select(
        "event_id",
        "user_id",
        epoch_us("ts").alias("p_ts_us"),
        epoch_us("ts_asof").alias("click_ts_us"),
    ).orderBy("event_id")


@register(
    "q27_etsd_ks_composite",
    "composite",
    f"""
    WITH f AS (
      SELECT * FROM events
      WHERE ts >= TIMESTAMP '{T0}' AND ts <= TIMESTAMP '{T1}'
    ),
    ext AS (
      SELECT event_type, min(value) AS minv, max(value) AS maxv
      FROM f GROUP BY event_type
    ),
    base AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS intv_cnt,
             CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS err_cnt,
             min(value) AS min_value,
             max(value) AS max_value,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(value) AS avg_value,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
             CAST(SUM(CASE WHEN value > {K} THEN 1 ELSE 0 END) AS BIGINT) AS n_over,
             CAST(SUM(CASE WHEN value < {K} THEN 1 ELSE 0 END) AS BIGINT) AS n_under,
             CAST(SUM(CASE WHEN value = {K} THEN 1 ELSE 0 END) AS BIGINT) AS n_equal,
             MIN(CASE WHEN value > {K} THEN epoch_us(ts) END) AS first_over_us,
             MIN(CASE WHEN value < {K} THEN epoch_us(ts) END) AS first_under_us,
             MIN(CASE WHEN value = {K} THEN epoch_us(ts) END) AS first_equal_us,
             CAST(SUM(CASE WHEN value > {K} THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE)
               / SUM(CASE WHEN value > {K} THEN 1 END) AS avg_when_over,
             CAST(SUM(CASE WHEN value < {K} THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE)
               / SUM(CASE WHEN value < {K} THEN 1 END) AS avg_when_under
      FROM f GROUP BY event_type
    ),
    tx AS (
      SELECT f.event_type,
             MIN(CASE WHEN f.value = x.minv THEN epoch_us(f.ts) END) AS t_min_us,
             MIN(CASE WHEN f.value = x.maxv THEN epoch_us(f.ts) END) AS t_max_us
      FROM f JOIN ext x ON f.event_type = x.event_type
      GROUP BY f.event_type
    )
    SELECT base.*, tx.t_min_us, tx.t_max_us
    FROM base JOIN tx ON base.event_type = tx.event_type
    ORDER BY base.event_type
    """,
    doc="The full ETSD_KS record (reference code/etsdQuery.h:25-55) for "
    "every channel over a range in one query.",
    headline=True,
)
def q27(spark, sf_dir):
    return etsd_ks(_events(spark, sf_dir, (T0, T1)), K, T0, T1)


@register(
    "q28_delta_reconstruction",
    "roundtrip",
    """
    WITH d AS (
      SELECT event_type, value, ts, event_id,
             value - lag(value) OVER w AS delta
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    ),
    r AS (
      SELECT event_type, value,
             SUM(COALESCE(delta, value)) OVER
               (PARTITION BY event_type ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS recon
      FROM d
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN abs(recon - value) > 1e-9 THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch
    FROM r GROUP BY event_type ORDER BY event_type
    """,
    doc="Delta-encode -> cumsum-reconstruct round trip (reference encode "
    "code/etsdSave.c:396-398, decode code/etsdRead.c:274).",
)
def q28(spark, sf_dir):
    return reconstruct_from_deltas(_events(spark, sf_dir))


@register(
    "q29_session_gaps",
    "sessionization",
    f"""
    WITH g AS (
      SELECT event_type, ts, event_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                       OVER (PARTITION BY event_type ORDER BY ts, event_id)
                       > {GAP_S} * 1000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    s AS (
      SELECT event_type, ts,
             SUM(new_session) OVER
               (PARTITION BY event_type ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM g
    )
    SELECT event_type, CAST(session_id AS BIGINT) AS session_id,
           MIN(epoch_us(ts)) AS session_start_us,
           MAX(epoch_us(ts)) AS session_end_us,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY event_type, session_id
    ORDER BY event_type, session_id
    """,
    doc="Batch sessionization: sessions split by > GAP_S of silence per "
    "channel via lag+cumsum (the batch equivalent of the streaming "
    "session_window in streaming/ingest.py; reference missed-update "
    "tracking, code/etsdSave.c:450-458).",
)
def q29(spark, sf_dir):
    e = _events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    new_s = F.when(
        epoch_us("ts") - F.lag(epoch_us("ts")).over(w) > GAP_S * 1_000_000, 1
    ).otherwise(0)
    return (
        e.withColumn("__new", new_s)
        .withColumn("session_id", F.sum("__new").over(cum))
        .groupBy("event_type", "session_id")
        .agg(
            F.min(epoch_us("ts")).alias("session_start_us"),
            F.max(epoch_us("ts")).alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type", "session_id")
    )


# q30_rate_scalable / q31_rollover_scalable were dropped from the
# catalog in round 3: since the round-2 default swap, q07/q08 route to
# the SAME stitched plans (operators/range_stats.py rate/rollover ->
# operators/scalable_window.py), so the pair were exact plan-identical
# duplicates whose only effect was pushing later q-entries out of the
# driver's ~50-entry verification window. The scalable operators stay
# covered by q07/q08's oracles and tests/test_scalable_window.py.


@register(
    "q32_counter_total_rate",
    "aggregate",
    f"""
    WITH r AS (
      SELECT event_type, value, ts, event_id,
             CASE WHEN value < lag(value)
                       OVER (PARTITION BY event_type ORDER BY ts, event_id)
                  THEN 1 ELSE 0 END AS wrap
      FROM events
      WHERE ts >= TIMESTAMP '{T0}' AND ts <= TIMESTAMP '{T1}'
    ),
    fl AS (
      SELECT event_type, wrap,
             first_value(value) OVER w AS firstv,
             last_value(value) OVER w AS lastv
      FROM r
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ),
    g AS (
      SELECT event_type,
             any_value(firstv) AS firstv,
             any_value(lastv) AS lastv,
             SUM(wrap) AS wraps
      FROM fl GROUP BY event_type
    )
    SELECT event_type,
           lastv - firstv + wraps * 4294967296.0 AS counter_total,
           (lastv - firstv + wraps * 4294967296.0)
             / ((epoch_us(TIMESTAMP '{T1}') - epoch_us(TIMESTAMP '{T0}')) / 1000000.0)
             AS rate_per_s
    FROM g ORDER BY event_type
    """,
    doc="Counter-mode range total and rate (SURVEY §2.1 detail #1; "
    "reference code/etsdQuery.c:374-396): last - first + 2^32*wraps, "
    "'ave' divides by wall seconds, not sample count.",
)
def q32(spark, sf_dir):
    return counter_total(_events(spark, sf_dir, (T0, T1)), T0, T1)


@register(
    "q33_exact_percentiles",
    "aggregate",
    """
    WITH ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn
      FROM events WHERE value IS NOT NULL
    ),
    counts AS (SELECT event_type, max(rn) AS n FROM ranked GROUP BY event_type),
    targets AS (
      SELECT event_type, p,
             CAST(floor(p * (n - 1)) AS INTEGER) AS lo,
             p * (n - 1) - floor(p * (n - 1)) AS frac,
             least(CAST(floor(p * (n - 1)) AS INTEGER) + 1, n - 1) AS hi
      FROM counts, (SELECT unnest(CAST([0.5, 0.9, 0.99] AS DOUBLE[])) AS p)
    )
    SELECT t.event_type, t.p,
           l.value + (h.value - l.value) * t.frac AS pct_value
    FROM targets t
    JOIN ranked l ON l.event_type = t.event_type AND l.rn = t.lo + 1
    JOIN ranked h ON h.event_type = t.event_type AND h.rn = t.hi + 1
    ORDER BY t.event_type, t.p
    """,
    doc="Exact interpolated p50/p90/p99 per channel via explicit rank "
    "arithmetic — same expression shape both engines, bit-exact "
    "(builtin percentile impls drift by ulps).",
    headline=True,
)
def q33(spark, sf_dir):
    from etsd_time_series_database_spark.operators.range_stats import (
        exact_percentiles,
    )

    return exact_percentiles(_events(spark, sf_dir))


@register(
    "q34_asof_join_scalable",
    "join",
    """
    SELECT p.event_id, p.user_id,
           CAST(epoch_us(p.ts) AS BIGINT) AS p_ts_us,
           (SELECT CAST(epoch_us(max(c.ts)) AS BIGINT) FROM events c
             WHERE c.event_type = 'click' AND c.user_id = p.user_id
               AND c.ts <= p.ts) AS click_ts_us
    FROM events p WHERE p.event_type = 'purchase'
    ORDER BY event_id
    """,
    doc="q23's as-of join computed with the skew-proof (key, bucket) "
    "boundary-stitch variant (operators/asof.py asof_join_scalable): "
    "identical results, parallelism bounded by buckets not keys.",
    headline=True,
)
def q34(spark, sf_dir):
    from etsd_time_series_database_spark.operators.asof import asof_join_scalable

    e = _events(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join_scalable(purchases, clicks, on="user_id", bucket_s=86400)
    return joined.select(
        "event_id",
        "user_id",
        epoch_us("ts").alias("p_ts_us"),
        epoch_us("ts_asof").alias("click_ts_us"),
    ).orderBy("event_id")


@register(
    "q51_longest_gaps",
    "quality",
    """
    WITH d AS (
      SELECT event_type, event_id,
             epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER w AS prev_us
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    ),
    g AS (
      SELECT event_type, us - prev_us AS gap_us, prev_us, us,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY us - prev_us DESC, prev_us,
                                         event_id) AS rn
      FROM d WHERE prev_us IS NOT NULL
    )
    SELECT event_type, CAST(rn AS INTEGER) AS rank, gap_us,
           prev_us AS gap_start_us, us AS gap_end_us
    FROM g WHERE rn <= 3
    ORDER BY event_type, rank
    """,
    doc="Top-3 longest silences per channel with endpoints (the outage "
    "report behind q14's counts); rank filter plans as "
    "WindowGroupLimit — k rows per channel kept per task, no full "
    "sort — and since r7 the lag defaults to the stitched (channel, "
    "bucket) form, so no channel-capped sort either.",
)
def q51(spark, sf_dir):
    from etsd_time_series_database_spark.operators.range_stats import (
        longest_gaps,
    )

    return longest_gaps(_events(spark, sf_dir), k=3)


ALARM_T = 250.0


@register(
    "q56_alarm_episodes",
    "anomaly",
    f"""
    WITH m AS (
      SELECT event_type, epoch_us(ts) AS us, event_id,
             value > {ALARM_T} AS above,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts, event_id)
             - row_number() OVER (PARTITION BY event_type, value > {ALARM_T}
                                  ORDER BY ts, event_id) AS island
      FROM events WHERE value IS NOT NULL
    ),
    e AS (
      SELECT event_type, island,
             CAST(count(*) AS BIGINT) AS n_samples,
             min(us) AS start_us, max(us) AS end_us,
             max(us) - min(us) AS span_us
      FROM m WHERE above GROUP BY event_type, island
    ),
    rk AS (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY span_us DESC, start_us) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n_episodes,
             max(span_us) OVER (PARTITION BY event_type) AS longest_span_us
      FROM e
    )
    SELECT event_type,
           CAST(n_episodes AS BIGINT) AS n_episodes,
           CAST(longest_span_us AS BIGINT) AS longest_span_us,
           start_us AS longest_start_us,
           n_samples AS longest_n_samples
    FROM rk WHERE rn = 1 ORDER BY event_type
    """,
    doc="Alarm-episode accounting: consecutive above-threshold runs "
    "via gaps-and-islands, with the LONGEST episode's span/start/"
    "samples per channel (packed-decimal argmax, earliest on ties) — "
    "which incident was worst, completing q49 (total time above) and "
    "q51 (longest silences). Since r7 the island id is a distributed "
    "prefix sum of the not-above indicator (cumsum_scalable), not a "
    "channel-capped double row_number.",
)
def q56(spark, sf_dir):
    from etsd_time_series_database_spark.operators.range_stats import (
        alarm_episodes,
    )

    return alarm_episodes(_events(spark, sf_dir), ALARM_T)


@register(
    "q57_alarm_coverage",
    "anomaly",
    f"""
    WITH m AS (
      SELECT event_type, epoch_us(ts) AS us, event_id,
             value > {ALARM_T} AS above,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts, event_id)
             - row_number() OVER (PARTITION BY event_type, value > {ALARM_T}
                                  ORDER BY ts, event_id) AS island
      FROM events WHERE value IS NOT NULL
    ),
    e AS (
      SELECT event_type, island,
             min(us) AS start_us, max(us) AS end_us
      FROM m WHERE above GROUP BY event_type, island
    ),
    o AS (
      SELECT *, CASE WHEN max(end_us) OVER w_prev IS NULL
                     OR start_us > max(end_us) OVER w_prev
                THEN 1 ELSE 0 END AS opened
      FROM e
      WINDOW w_prev AS (ORDER BY start_us, end_us, event_type
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    iv AS (
      SELECT sum(opened) OVER (ORDER BY start_us, end_us, event_type
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS interval_id,
             start_us, end_us
      FROM o
    ),
    g AS (
      SELECT interval_id, min(start_us) AS i_start, max(end_us) AS i_end,
             CAST(count(*) AS BIGINT) AS i_eps
      FROM iv GROUP BY interval_id
    )
    SELECT CAST(sum(i_eps) AS BIGINT) AS n_episodes,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(sum(i_end - i_start) AS BIGINT) AS covered_us,
           CAST(max(i_end - i_start) AS BIGINT) AS longest_interval_us,
           min(i_start) AS first_start_us,
           max(i_end) AS last_end_us
    FROM g
    """,
    doc="Fleet-level alarm coverage: union of the time intervals where "
    "ANY channel was above threshold (q56's episodes merged across "
    "channels without double-counting overlaps) — total covered "
    "wall-clock, merged-interval count, and the longest combined "
    "incident. The global ordered window rides the episode table "
    "(one row per episode), never the samples.",
)
def q57(spark, sf_dir):
    from etsd_time_series_database_spark.operators.range_stats import (
        alarm_coverage,
    )

    return alarm_coverage(_events(spark, sf_dir), ALARM_T)


HYST_HI = 250.0
HYST_LO = 50.0


@register(
    "q62_hysteresis_episodes",
    "anomaly",
    f"""
    WITH dec AS (
      SELECT event_type, epoch_us(ts) AS us, event_id,
             CASE WHEN value >= {HYST_HI} THEN 1 ELSE 0 END AS s
      FROM events
      WHERE value IS NOT NULL
        AND (value >= {HYST_HI} OR value <= {HYST_LO})
    ),
    l AS (
      SELECT *, coalesce(lag(s) OVER (PARTITION BY event_type
                                      ORDER BY us, event_id), 0) AS ps
      FROM dec
    ),
    kk AS (
      SELECT *, sum(CASE WHEN s = 1 AND ps = 0 THEN 1 ELSE 0 END)
               OVER (PARTITION BY event_type ORDER BY us, event_id
                     ROWS UNBOUNDED PRECEDING) AS k
      FROM l
    ),
    cm AS (
      SELECT event_type, max(epoch_us(ts)) AS max_us
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    ),
    ep AS (
      SELECT event_type, k, min(us) AS start_us,
             min(CASE WHEN s = 0 THEN us END) AS end_raw
      FROM kk WHERE k >= 1 GROUP BY event_type, k
    ),
    sp AS (
      SELECT ep.event_type, start_us,
             CAST(coalesce(end_raw, cm.max_us) - start_us AS BIGINT)
               AS span_us,
             CASE WHEN end_raw IS NULL THEN 1 ELSE 0 END AS open_flag
      FROM ep JOIN cm USING (event_type)
    ),
    best AS (
      SELECT event_type, start_us,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY span_us DESC, start_us) AS rn
      FROM sp
    ),
    agg AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_episodes,
             CAST(sum(span_us) AS BIGINT) AS total_active_us,
             CAST(max(span_us) AS BIGINT) AS longest_span_us,
             CAST(max(open_flag) AS INT) AS has_open
      FROM sp GROUP BY event_type
    )
    SELECT agg.event_type, n_episodes, total_active_us, longest_span_us,
           b.start_us AS longest_start_us, has_open
    FROM agg JOIN (SELECT event_type, start_us FROM best WHERE rn = 1) b
      USING (event_type)
    ORDER BY event_type
    """,
    headline=True,
    doc="Two-threshold alarm accounting with hysteresis: an episode "
    "opens at value >= hi and closes only at value <= lo (in-band "
    "samples carry state — no chatter; q56 is the hi == lo case). "
    "State machine reduced to DECISIVE rows at the scan; stitched "
    "lag marks starts, ONE stitched prefix sum numbers episodes, "
    "first-reset closes each in a single hash-agg; open episodes "
    "close at the channel's last sample. q56's packed-decimal argmax "
    "rollup.",
)
def q62(spark, sf_dir):
    from etsd_time_series_database_spark.operators.range_stats import (
        hysteresis_episodes,
    )

    return hysteresis_episodes(_events(spark, sf_dir), HYST_HI, HYST_LO)


@register(
    "q63_rle_profile",
    "storage",
    """
    WITH d AS (
      SELECT event_type, epoch_us(ts) AS us, event_id, value,
             lag(value) OVER (PARTITION BY event_type
                              ORDER BY us, event_id) AS pv
      FROM events WHERE value IS NOT NULL
    ),
    r AS (
      SELECT *, sum(CASE WHEN pv IS NULL OR value != pv
                         THEN 1 ELSE 0 END)
               OVER (PARTITION BY event_type ORDER BY us, event_id
                     ROWS UNBOUNDED PRECEDING) AS k
      FROM d
    ),
    runs AS (
      SELECT event_type, k, CAST(count(*) AS BIGINT) AS n,
             min(us) AS start_us, min(value) AS v
      FROM r GROUP BY event_type, k
    ),
    best AS (
      SELECT event_type, n, v, start_us,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY n DESC, start_us) AS rn
      FROM runs
    ),
    agg AS (
      SELECT event_type, CAST(sum(n) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_runs,
             round(CAST(count(*) AS DOUBLE) / sum(n), 6) AS rle_ratio,
             CAST(max(n) AS BIGINT) AS longest_run
      FROM runs GROUP BY event_type
    )
    SELECT agg.event_type, n_rows, n_runs, rle_ratio, longest_run,
           b.v AS longest_value, b.start_us AS longest_start_us
    FROM agg JOIN (SELECT event_type, v, start_us FROM best
                   WHERE rn = 1) b
      USING (event_type)
    ORDER BY event_type
    """,
    doc="Run-length compressibility profile: consecutive-equal-value "
    "runs per channel, RLE ratio (runs/rows), and the longest run "
    "with value and start — the accounting view of the reference's "
    "1-2-bit repeated-reading packing (Parquet RLE-dictionary's job "
    "here). q62's physical family: stitched lag + ONE stitched "
    "prefix sum + per-run hash-agg + packed-decimal argmax.",
)
def q63(spark, sf_dir):
    from etsd_time_series_database_spark.operators.range_stats import (
        rle_profile,
    )

    return rle_profile(_events(spark, sf_dir))


@register(
    "q64_freshness_report",
    "monitoring",
    """
    WITH base AS (
      SELECT event_type, epoch_us(ts) AS us, event_id FROM events
    ),
    g AS (
      SELECT event_type,
             us - lag(us) OVER (PARTITION BY event_type
                                ORDER BY us, event_id) AS gap_us,
             us AS tie
      FROM base
    ),
    gaps AS (SELECT * FROM g WHERE gap_us IS NOT NULL),
    ranked AS (
      SELECT event_type, gap_us,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY gap_us, tie) AS rn
      FROM gaps
    ),
    counts AS (
      SELECT event_type, max(rn) AS n FROM ranked GROUP BY event_type
    ),
    targets AS (
      SELECT event_type,
             CAST(floor(0.5 * (n - 1)) AS INT) AS lo,
             0.5 * (n - 1) - floor(0.5 * (n - 1)) AS frac,
             least(CAST(floor(0.5 * (n - 1)) AS INT) + 1, n - 1) AS hi
      FROM counts
    ),
    med AS (
      SELECT t.event_type,
             l.gap_us + (h.gap_us - l.gap_us) * t.frac AS med_gap
      FROM targets t
      JOIN ranked l ON t.event_type = l.event_type AND t.lo + 1 = l.rn
      JOIN ranked h ON t.event_type = h.event_type AND t.hi + 1 = h.rn
    ),
    stats AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_samples,
             min(us) AS first_us, max(us) AS last_us
      FROM base GROUP BY event_type
    ),
    now_t AS (SELECT max(last_us) AS now_us FROM stats)
    SELECT s.event_type, s.n_samples, s.first_us, s.last_us,
           round(CAST(m.med_gap AS DOUBLE), 6) AS median_gap_us,
           CAST(n.now_us - s.last_us AS BIGINT) AS staleness_us,
           CASE WHEN m.med_gap IS NOT NULL THEN
             CAST(n.now_us - s.last_us > 3.0 * m.med_gap AS INT)
           END AS overdue
    FROM stats s
    LEFT JOIN med m USING (event_type)
    CROSS JOIN now_t n
    ORDER BY s.event_type
    """,
    doc="Per-channel freshness: last/first sample, exact MEDIAN "
    "inter-sample gap (empirical cadence, q33 rank-lerp over the "
    "stitched-lag gap table), staleness vs the dataset's now, and an "
    "overdue flag at 3x the median cadence — the 'which feeds have "
    "silently stopped' view (the reference's MissedUpdate accounting "
    "made cadence-relative).",
)
def q64(spark, sf_dir):
    from etsd_time_series_database_spark.operators.range_stats import (
        freshness_report,
    )

    return freshness_report(_events(spark, sf_dir))


CO_ALARM_T = 100.0  # lower than ALARM_T: episodes must be long
# enough to overlap across channels, or the matrix is trivially empty


@register(
    "q65_co_alarm_matrix",
    "anomaly",
    f"""
    WITH m AS (
      SELECT event_type, epoch_us(ts) AS us, event_id,
             value > {CO_ALARM_T} AS above,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts, event_id)
             - row_number() OVER (PARTITION BY event_type, value > {CO_ALARM_T}
                                  ORDER BY ts, event_id) AS island
      FROM events WHERE value IS NOT NULL
    ),
    e AS (
      SELECT event_type, island,
             min(us) AS start_us, max(us) AS end_us
      FROM m WHERE above GROUP BY event_type, island
    ),
    p AS (
      SELECT a.event_type AS channel_a, b.event_type AS channel_b,
             least(a.end_us, b.end_us)
             - greatest(a.start_us, b.start_us) AS pair_ov
      FROM e a JOIN e b
        ON a.event_type < b.event_type
       AND a.start_us < b.end_us AND b.start_us < a.end_us
    )
    SELECT channel_a, channel_b,
           CAST(count(*) AS BIGINT) AS n_copairs,
           CAST(sum(pair_ov) AS BIGINT) AS overlap_us
    FROM p GROUP BY channel_a, channel_b
    ORDER BY channel_a, channel_b
    """,
    doc="Pairwise co-alarm matrix: for every channel pair, how many "
    "alarm episodes overlap in time and for how many total "
    "microseconds — which feeds fail TOGETHER (the correlation view "
    "q56's per-channel rollup and q57's any-channel union both "
    "erase). Default path splits episodes at time buckets so the "
    "overlap theta-join becomes a bucket EQUI-join (shuffle key is "
    "time, never a channel); split pieces re-aggregate per episode "
    "pair so overlaps sum exactly.",
)
def q65(spark, sf_dir):
    from etsd_time_series_database_spark.operators.range_stats import (
        co_alarm_matrix,
    )

    return co_alarm_matrix(_events(spark, sf_dir), CO_ALARM_T)


@register(
    "q66_coverage_timeline",
    "anomaly",
    f"""
    WITH m AS (
      SELECT event_type, epoch_us(ts) AS us, event_id,
             value > {CO_ALARM_T} AS above,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts, event_id)
             - row_number() OVER (PARTITION BY event_type, value > {CO_ALARM_T}
                                  ORDER BY ts, event_id) AS island
      FROM events WHERE value IS NOT NULL
    ),
    e AS (
      SELECT event_type, island,
             min(us) AS start_us, max(us) AS end_us
      FROM m WHERE above GROUP BY event_type, island
    ),
    seg AS (
      SELECT b, event_type,
             greatest(start_us, b * 86400000000) AS s,
             least(end_us, (b + 1) * 86400000000) AS e2,
             CASE WHEN b = start_us // 86400000000 THEN 1 ELSE 0 END AS w
      FROM (SELECT e.*, unnest(range(start_us // 86400000000,
                                     end_us // 86400000000 + 1)) AS b
            FROM e)
    ),
    o AS (
      SELECT *, CASE WHEN max(e2) OVER w_prev IS NULL
                     OR s > max(e2) OVER w_prev
                THEN 1 ELSE 0 END AS opened
      FROM seg
      WINDOW w_prev AS (PARTITION BY b ORDER BY s, e2, event_type
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    iv AS (
      SELECT b, s, e2, w,
             sum(opened) OVER (PARTITION BY b
                               ORDER BY s, e2, event_type
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS ivid
      FROM o
    ),
    g AS (
      SELECT b, ivid, min(s) AS m_s, max(e2) AS m_e, sum(w) AS m_eps
      FROM iv GROUP BY b, ivid
      HAVING NOT (max(e2) = min(s) AND sum(w) = 0)
    )
    SELECT CAST(b * 86400000000 AS BIGINT) AS bucket_start_us,
           CAST(sum(m_e - m_s) AS BIGINT) AS covered_us,
           round(CAST(sum(m_e - m_s) AS DOUBLE) / 86400000000, 6)
             AS pct_covered,
           CAST(count(*) AS BIGINT) AS n_stretches,
           CAST(sum(m_eps) AS BIGINT) AS n_episode_starts
    FROM g GROUP BY b ORDER BY bucket_start_us
    """,
    doc="Fleet alarm-coverage timeline: per DAY, microseconds any "
    "channel was above threshold, the covered fraction, distinct "
    "alarm stretches intersecting the day, and episodes starting in "
    "it — q57's single-row union unrolled into the chartable health "
    "series. The q57 split-and-merge machinery stopped one stage "
    "early: per-bucket union windows (never a global sort), one "
    "hash-agg rollup; output <= days in range. Totals cross-check "
    "q57 exactly (pytest-pinned).",
)
def q66(spark, sf_dir):
    from etsd_time_series_database_spark.operators.range_stats import (
        coverage_timeline,
    )

    return coverage_timeline(_events(spark, sf_dir), CO_ALARM_T)


@register(
    "q67_alarm_reliability",
    "anomaly",
    f"""
    WITH m AS (
      SELECT event_type, epoch_us(ts) AS us, event_id,
             value > {CO_ALARM_T} AS above,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts, event_id)
             - row_number() OVER (PARTITION BY event_type, value > {CO_ALARM_T}
                                  ORDER BY ts, event_id) AS island
      FROM events WHERE value IS NOT NULL
    ),
    e AS (
      SELECT event_type, island,
             min(us) AS start_us, max(us) AS end_us,
             max(us) - min(us) AS span_us
      FROM m WHERE above GROUP BY event_type, island
    ),
    g AS (
      SELECT *, start_us - lag(end_us) OVER (PARTITION BY event_type
                                             ORDER BY start_us, end_us)
               AS gap
      FROM e
    ),
    per_ch AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_episodes,
             CAST(sum(span_us) AS BIGINT) AS alarm_us,
             CAST(sum(span_us) // count(span_us) AS BIGINT) AS mttr_us,
             CASE WHEN count(gap) > 0
                  THEN CAST(sum(gap) // count(gap) AS BIGINT)
             END AS mtbf_us
      FROM g GROUP BY event_type
    ),
    bounds AS (
      SELECT event_type,
             CAST(max(us) - min(us) AS BIGINT) AS observed_us
      FROM m GROUP BY event_type
    )
    SELECT p.event_type, p.n_episodes, p.alarm_us, p.mttr_us, p.mtbf_us,
           b.observed_us,
           CASE WHEN b.observed_us > 0
                THEN round(1.0 - CAST(p.alarm_us AS DOUBLE) / b.observed_us, 6)
           END AS availability
    FROM per_ch p JOIN bounds b USING (event_type)
    ORDER BY p.event_type
    """,
    doc="Per-channel reliability report: MTTR (mean incident span), "
    "MTBF (mean healthy gap between incidents, NULL for single-"
    "episode channels), total alarm time, observed span, and "
    "availability — the ops triple completing q56 (worst incident) "
    "and q64 (freshness). Windows ride the episode table (cardinality "
    "= incidents, never samples); bounds are one per-channel hash-agg.",
)
def q67(spark, sf_dir):
    from etsd_time_series_database_spark.operators.range_stats import (
        alarm_reliability,
    )

    return alarm_reliability(_events(spark, sf_dir), CO_ALARM_T)


@register(
    "q68_burstiness",
    "analytics",
    """
    WITH b AS (
      SELECT event_type, epoch_us(ts) // 3600000000 AS bk,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT max(epoch_us(ts) // 3600000000)
           - min(epoch_us(ts) // 3600000000) + 1 AS nb
      FROM events
    ),
    per AS (
      SELECT event_type, CAST(sum(c) AS BIGINT) AS s1,
             CAST(sum(c * c) AS BIGINT) AS s2,
             CAST(count(*) AS BIGINT) AS active_buckets,
             CAST(max(c) AS BIGINT) AS peak_bucket
      FROM b GROUP BY 1
    )
    SELECT event_type,
           CAST(nb AS BIGINT) AS n_buckets,
           s1 AS n_events, active_buckets, peak_bucket,
           round(greatest(CAST(s2 AS DOUBLE) / nb
                          - (CAST(s1 AS DOUBLE) / nb)
                            * (CAST(s1 AS DOUBLE) / nb), 0)
                 / (CAST(s1 AS DOUBLE) / nb), 6) AS fano,
           round(sqrt(greatest(CAST(s2 AS DOUBLE) / nb
                               - (CAST(s1 AS DOUBLE) / nb)
                                 * (CAST(s1 AS DOUBLE) / nb), 0))
                 / (CAST(s1 AS DOUBLE) / nb), 6) AS cv
    FROM per, bounds ORDER BY event_type
    """,
    doc="Traffic-burstiness profile: Fano factor (variance/mean of "
    "hourly arrival counts; 1.0 = Poisson, >1 bursty, <1 metronomic) "
    "and CV per channel, with total/active/peak bucket ingredients — "
    "which feeds arrive on a clock (the reference's fixed-interval "
    "ingest contract) and which in bursts. One hash-agg reduces the "
    "scan to (channel, bucket) counts; absent buckets inside the "
    "observed span count as exact zeros via the span length, never "
    "materialized; moments fold exact integer sums through an "
    "identical double expression on both engines.",
)
def q68(spark, sf_dir):
    from etsd_time_series_database_spark.operators.trends import (
        burstiness_profile,
    )

    return burstiness_profile(_events(spark, sf_dir), bucket_s=3600)
