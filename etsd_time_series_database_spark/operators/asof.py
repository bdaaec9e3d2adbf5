"""As-of (point-in-time) join — an operator Spark lacks natively.

Reference capability: ``etsdVAT`` value-at-time (code/etsdQuery.c:206-215)
generalized to joining a whole left relation against the latest right
row at-or-before each left timestamp.

Implementation: the union-tag / last-value-carry-forward formulation —
tag both sides, union, and per key take
``last(right_row, ignorenulls) over (key order by ts, side)``.
This is pure DataFrame/window (no UDF, no per-row Python):

  * ONE shuffle on (key) — same cost as the sort-merge join Spark
    would need anyway; no range-explosion like a naive
    ``l.ts >= r.ts`` theta join (which is O(n·m) at scale);
  * deterministic inclusive semantics: at equal timestamps the right
    row sorts before the left probe, so ``right.ts <= left.ts``
    matches inclusively;
  * the matched timestamp and every carried value column travel as ONE
    struct through a single ``last(ignorenulls)``, so the output is
    always a consistent snapshot of one right row — a NULL value in
    the newest right row is carried as that row's NULL, never silently
    substituted by an older row's value.

For grossly skewed keys, :func:`asof_join_scalable` pre-buckets by
(key, day) and carries the last row of earlier buckets — measured
~2.5x faster than the per-key form at 20M rows / 3 keys in bench.py's
memory-bounded skew regime (the bigger the per-key volume, the wider
the gap). An `applyInPandas` + ``pd.merge_asof`` variant was
rejected: it leaves the JVM and gains nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def _right_row_struct_type(
    right: DataFrame, right_ts: str, value_cols: list[str]
) -> StructType:
    return StructType(
        [StructField("__rts", right.schema[right_ts].dataType)]
        + [StructField(f"__r_{c}", right.schema[c].dataType) for c in value_cols]
    )


def _right_row_struct(right_ts: str, value_cols: list[str]) -> F.Column:
    return F.struct(
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )


def _project(
    carried: DataFrame,
    lcols: list[str],
    right_ts: str,
    value_cols: list[str],
    suffix: str,
) -> DataFrame:
    return carried.select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        F.col("__m.__rts").alias(f"{right_ts}{suffix}"),
        *[F.col(f"__m.__r_{c}").alias(f"{c}{suffix}") for c in value_cols],
    )


def _apply_tolerance(carried: DataFrame, tolerance_s) -> DataFrame:
    """Staleness bound: NULL the whole matched right-row struct when it
    is older than ``tolerance_s`` seconds before the probe — the match
    is all-or-nothing (one right row or no right row), so a tolerance
    miss can never surface a column-wise mixture. Applied to the
    carried struct BEFORE projection; ``None`` keeps the unbounded
    as-of semantics exactly."""
    if tolerance_s is None:
        return carried
    tol_us = int(float(tolerance_s) * 1_000_000)
    fresh = F.col("__m").isNotNull() & (
        F.unix_micros(F.col("__t")) - F.unix_micros(F.col("__m.__rts"))
        <= F.lit(tol_us)
    )
    return carried.withColumn(
        "__m", F.when(fresh, F.col("__m"))
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
    tolerance_s: float | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` within the same ``on`` key.

    Returns all left columns plus ``<right_ts><suffix>`` and each
    requested right value column as ``<col><suffix>``.

    ``tolerance_s`` bounds staleness (the kdb/pandas ``merge_asof``
    tolerance): a match older than the bound comes back as NULLs, the
    same left-row-preserving shape as no match at all — the monitoring
    semantics "join the latest reading unless it is too old to trust"
    (the reference's value-at-time has an implicit bound: it never
    reads past its query range, code/etsdQuery.c:206-215). Applied to
    the carried whole-row struct, so it can never mix rows.

    Determinism contract: the matched timestamp and values always come
    from the SAME right row (single-struct carry). With duplicate right
    timestamps inside one key, which of the tied rows wins is engine
    order — but it is one whole row, never a column-wise mixture.
    De-dup the right side first if tie identity matters.
    """
    value_cols = value_cols or []
    lcols = left.columns
    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in lcols]).alias("__l"),
        F.lit(None)
        .cast(_right_row_struct_type(right, right_ts, value_cols))
        .alias("__rrow"),
    )
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(left.select(*lcols).schema).alias("__l"),
        _right_row_struct(right_ts, value_cols).alias("__rrow"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    # right rows (side=0) sort before left probes (side=1) at equal ts
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # __t rides past the window ONLY when the tolerance needs it:
    # keeping it unconditionally costs ~9% extra shuffle bytes on the
    # untolerated path (measured on q23 at sf0.1)
    probe_t = ["__t"] if tolerance_s is not None else []
    carried = unioned.select(
        "__side",
        *probe_t,
        "__l",
        F.last("__rrow", ignorenulls=True).over(w).alias("__m"),
    ).filter(F.col("__side") == 1)
    carried = _apply_tolerance(carried, tolerance_s)
    return _project(carried, lcols, right_ts, value_cols, suffix)


def asof_join_scalable(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
    bucket_s: int = 86400,
    max_span_buckets: int = 1_000_000,
    tolerance_s: float | None = None,
) -> DataFrame:
    """Skew-proof :func:`asof_join`: identical semantics (including
    the ``tolerance_s`` staleness bound), but the
    carry-forward window partitions by ``(key, time-bucket)`` instead of
    key alone — the same boundary-stitch trick as
    operators.scalable_window, applied to the union-tag as-of.

    Each bucket's probes see (a) the in-bucket right rows at-or-before
    them, or — when none precede them in the bucket — (b) the latest
    right row of ANY earlier bucket, delivered by a tiny per-(key,
    bucket) summary joined back (unhinted — AQE broadcasts it at
    runtime while keys x buckets is actually small, and degrades to a
    shuffle join instead of OOMing when it is not). Parallelism is
    bounded by
    (keys x buckets), so one hot key no longer serializes the sort.
    The cross-bucket seed is the same whole-row struct as the in-bucket
    carry, so a bucket boundary can never mix columns from different
    right rows.

    ``max_span_buckets`` guards the dense per-key bucket grid: one
    corrupt outlier timestamp (an epoch-0 or year-9999 row) would
    otherwise inflate a single key's ``sequence(b0, b1)`` to millions
    of elements and eventually hit Spark's opaque sequence-length cap.
    A key whose bucket span exceeds the guard raises a clear runtime
    error naming the key and span — increase ``bucket_s`` (or clean
    the outlier rows) to proceed. The default (1M buckets ≈ 2,700
    years of day buckets) only trips on data-quality problems.
    """
    from etsd_time_series_database_spark.functions.exprs import epoch_us

    value_cols = value_cols or []
    lcols = left.columns
    bkt = lambda ts: (epoch_us(ts) / F.lit(bucket_s * 1_000_000)).cast("bigint")  # noqa: E731

    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in lcols]).alias("__l"),
        F.lit(None)
        .cast(_right_row_struct_type(right, right_ts, value_cols))
        .alias("__rrow"),
    ).withColumn("__bkt", bkt("__t"))
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(left.select(*lcols).schema).alias("__l"),
        _right_row_struct(right_ts, value_cols).alias("__rrow"),
    ).withColumn("__bkt", bkt("__t"))

    unioned = l_tagged.unionByName(r_tagged)

    # per-(key, bucket) last right row -> previous-bucket seed. The
    # summary must cover EVERY (key, bucket) either side touches: a
    # probe bucket with no right rows still needs the carry from
    # earlier buckets. The grid is the DENSE per-key bucket span
    # (map-side min/max agg + sequence explode) rather than
    # ``unioned.select(k, bkt).distinct()``: the distinct re-shuffled
    # the entire input a second time, while the span agg combines
    # map-side to one row per key. The dense grid is a superset of the
    # present buckets; absent buckets inherit the running carry and
    # then join to nothing, so the output is bit-identical. Grid size
    # is keys x (time-span / bucket_s) — pick bucket_s so that stays
    # far below the row count (the default day bucket gives years of
    # span per thousand rows).
    lasts = r_tagged.groupBy("__k", "__bkt").agg(
        F.max_by("__rrow", "__t").alias("__lastrow")
    )
    span = unioned.groupBy("__k").agg(
        F.min("__bkt").alias("__b0"), F.max("__bkt").alias("__b1")
    )
    # span guard: raise a clear error instead of letting an outlier
    # timestamp blow up the sequence (when/otherwise keeps the check
    # inside the sequence bound so column pruning can't drop it)
    b1_guarded = F.when(
        F.col("__b1") - F.col("__b0") < F.lit(max_span_buckets),
        F.col("__b1"),
    ).otherwise(
        F.raise_error(
            F.format_string(
                "asof_join_scalable: key '%s' spans %s buckets of "
                + str(int(bucket_s))
                + "s (max_span_buckets=" + str(int(max_span_buckets))
                + ") - likely an outlier timestamp; increase bucket_s "
                "or clean the outlier rows",
                F.col("__k").cast("string"),
                (F.col("__b1") - F.col("__b0")).cast("string"),
            )
        ).cast("bigint")
    )
    buckets = span.select(
        "__k", F.explode(F.sequence("__b0", b1_guarded)).alias("__bkt")
    )
    summary = buckets.join(lasts, ["__k", "__bkt"], "left")
    w_bkt = Window.partitionBy("__k").orderBy("__bkt")
    # latest right row of ANY earlier bucket = running last (nulls
    # skipped, so empty buckets inherit), shifted by one bucket
    running = summary.select(
        "__k",
        "__bkt",
        F.last("__lastrow", ignorenulls=True)
        .over(w_bkt.rowsBetween(Window.unboundedPreceding, 0))
        .alias("__run"),
    )
    prev = running.select(
        "__k", "__bkt", F.lag("__run").over(w_bkt).alias("__prevrow")
    )
    w_in = (
        Window.partitionBy("__k", "__bkt")
        .orderBy(F.col("__t"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    probe_t = ["__t"] if tolerance_s is not None else []
    carried = (
        unioned.join(prev, ["__k", "__bkt"], "left")
        .select(
            "__side",
            *probe_t,
            "__l",
            F.coalesce(
                F.last("__rrow", ignorenulls=True).over(w_in),
                F.col("__prevrow"),
            ).alias("__m"),
        )
        .filter(F.col("__side") == 1)
    )
    carried = _apply_tolerance(carried, tolerance_s)
    return _project(carried, lcols, right_ts, value_cols, suffix)
