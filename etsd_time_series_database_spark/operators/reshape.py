"""Wide <-> long reshaping of the events matrix.

The reference's physical layout is a wide per-interval matrix
``(timestamp, channel_0 .. channel_N)`` stored column-major per block
(reference 'ECM-1240 storage format 2.txt:6-16'); this engine stores
long ``(ts, channel, value)`` (SURVEY.md §1.4 rationale). These
helpers convert between the two views.

Scale: ``to_wide`` pivots on an explicit channel list — never the
two-pass inferred pivot, which scans once just to discover values.
Channel count is bounded (the reference caps at 63/127,
code/etsd.h:57-69), so the pivoted row stays narrow; the shuffle key
is the timestamp bucket, which is high-cardinality and skew-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_wide(
    df: DataFrame,
    channels: list[str],
    channel: str = "event_type",
    value: str = "value",
    ts: str = "ts",
    agg: str = "max",
) -> DataFrame:
    """Long -> wide: one row per timestamp, one column per channel.
    ``channels`` must be explicit (single-pass pivot). Collisions at the
    same (ts, channel) resolve by ``agg`` (max/min/avg/first)."""
    agg_fn = {"max": F.max, "min": F.min, "avg": F.avg}[agg if agg != "first" else "max"]
    return (
        df.groupBy(ts)
        .pivot(channel, channels)
        .agg(agg_fn(value))
        .orderBy(ts)
    )


def to_long(
    df: DataFrame,
    channels: list[str],
    channel: str = "event_type",
    value: str = "value",
    ts: str = "ts",
    drop_null: bool = True,
) -> DataFrame:
    """Wide -> long via stack (single projection, no shuffle)."""
    pairs = ", ".join(f"'{c}', `{c}`" for c in channels)
    out = df.select(
        F.col(ts),
        F.expr(f"stack({len(channels)}, {pairs}) as ({channel}, {value})"),
    )
    if drop_null:
        out = out.filter(F.col(value).isNotNull())
    return out
