"""Approximate aggregation sketches — the 100 TB path for the
statistics q05 (exact distinct) and q33 (exact percentiles) compute
exactly.

Exact COUNT(DISTINCT) shuffles every distinct value; HyperLogLog++
(`approx_count_distinct`) merges fixed-size registers map-side, so the
shuffle is O(channels), not O(distinct values). Exact percentiles sort;
`percentile_approx` (Greenwald-Khanna) streams with bounded memory.
Both are engine-builtin sketches surfaced here with explicit accuracy
knobs and bounds-tested against their exact counterparts.

No DuckDB oracle is possible (sketch internals are engine-specific);
the correctness contract is the error bound, asserted in
tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(
    df: DataFrame,
    cols: list[str],
    channel: str = "event_type",
    rsd: float = 0.02,
) -> DataFrame:
    """HLL++ distinct counts per channel. rsd = target relative
    standard deviation (2% default ~ 1.5 KB of registers per group)."""
    return (
        df.groupBy(channel)
        .agg(
            *[
                F.approx_count_distinct(c, rsd=rsd).alias(f"approx_n_{c}")
                for c in cols
            ]
        )
        .orderBy(channel)
    )


def approx_percentiles(
    df: DataFrame,
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
    channel: str = "event_type",
    value: str = "value",
    accuracy: int = 10_000,
) -> DataFrame:
    """Greenwald-Khanna approximate percentiles per channel. Rank error
    <= n / accuracy; memory is O(accuracy), independent of n."""
    return (
        df.groupBy(channel)
        .agg(
            F.percentile_approx(
                value, F.array(*[F.lit(p) for p in ps]), accuracy
            ).alias("pcts")
        )
        .select(
            channel,
            *[F.col("pcts")[i].alias(f"p{int(p * 100)}") for i, p in enumerate(ps)],
        )
        .orderBy(channel)
    )
