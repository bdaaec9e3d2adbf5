"""As-of (point-in-time) join — an operator Spark lacks natively.

Reference capability: ``etsdVAT`` value-at-time (code/etsdQuery.c:206-215)
generalized to joining a whole left relation against the latest right
row at-or-before each left timestamp.

Implementation: the union-tag / last-value-carry-forward formulation —
tag both sides, union, and per key take
``last(right_value, ignorenulls) over (key order by ts, side)``.
This is pure DataFrame/window (no UDF, no per-row Python):

  * ONE shuffle on (key) — same cost as the sort-merge join Spark
    would need anyway; no range-explosion like a naive
    ``l.ts >= r.ts`` theta join (which is O(n·m) at scale);
  * deterministic inclusive semantics: at equal timestamps the right
    row sorts before the left probe, so ``right.ts <= left.ts``
    matches inclusively.

For grossly skewed keys, pre-bucket by (key, day) and carry the last
value of the previous bucket — not needed at current scale; noted for
the 100 TB plan. An `applyInPandas` + ``pd.merge_asof`` variant was
rejected: it leaves the JVM and gains nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` within the same ``on`` key.

    Returns all left columns plus ``<right_ts><suffix>`` and each
    requested right value column as ``<col><suffix>``.

    Determinism contract: the matched TIMESTAMP is always
    deterministic. The carried VALUE columns are deterministic provided
    the right side has at most one row per (key, ts) — with duplicate
    right timestamps inside one key, which of the tied rows wins is
    engine order. De-dup the right side first if that matters.
    """
    value_cols = value_cols or []
    lcols = left.columns
    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in lcols]).alias("__l"),
        F.lit(None).cast("timestamp").alias("__rts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(left.select(*lcols).schema).alias("__l"),
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    # right rows (side=0) sort before left probes (side=1) at equal ts
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "__side",
        "__l",
        F.last("__rts", ignorenulls=True).over(w).alias(f"{right_ts}{suffix}"),
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    ).filter(F.col("__side") == 1)
    return carried.select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        f"{right_ts}{suffix}",
        *[f"{c}{suffix}" for c in value_cols],
    )


def asof_join_scalable(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
    bucket_s: int = 86400,
) -> DataFrame:
    """Skew-proof :func:`asof_join`: identical semantics, but the
    carry-forward window partitions by ``(key, time-bucket)`` instead of
    key alone — the same boundary-stitch trick as
    operators.scalable_window, applied to the union-tag as-of.

    Each bucket's probes see (a) the in-bucket right rows at-or-before
    them, or — when none precede them in the bucket — (b) the latest
    right row of ANY earlier bucket, delivered by a tiny per-(key,
    bucket) summary joined back broadcast. Parallelism is bounded by
    (keys x buckets), so one hot key no longer serializes the sort.
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
        F.lit(None).cast("timestamp").alias("__rts"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
            for c in value_cols
        ],
    ).withColumn("__bkt", bkt("__t"))
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(left.select(*lcols).schema).alias("__l"),
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    ).withColumn("__bkt", bkt("__t"))

    unioned = l_tagged.unionByName(r_tagged)

    # per-(key, bucket) last right row -> previous-bucket seed. The
    # summary must cover EVERY (key, bucket) either side touches: a
    # probe bucket with no right rows still needs the carry from
    # earlier buckets.
    fields = ["__rts", *[f"__r_{c}" for c in value_cols]]
    lasts = r_tagged.groupBy("__k", "__bkt").agg(
        F.max_by(F.struct(*fields), "__t").alias("__lastrow")
    )
    buckets = unioned.select("__k", "__bkt").distinct()
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
    carried = (
        unioned.join(F.broadcast(prev), ["__k", "__bkt"], "left")
        .select(
            "__side",
            "__l",
            F.coalesce(
                F.last("__rts", ignorenulls=True).over(w_in),
                F.col("__prevrow.__rts"),
            ).alias(f"{right_ts}{suffix}"),
            *[
                F.coalesce(
                    F.last(f"__r_{c}", ignorenulls=True).over(w_in),
                    F.col(f"__prevrow.__r_{c}"),
                ).alias(f"{c}{suffix}")
                for c in value_cols
            ],
        )
        .filter(F.col("__side") == 1)
    )
    return carried.select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        f"{right_ts}{suffix}",
        *[f"{c}{suffix}" for c in value_cols],
    )
