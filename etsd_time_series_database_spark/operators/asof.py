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
