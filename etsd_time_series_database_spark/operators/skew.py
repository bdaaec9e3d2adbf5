"""Skew-mitigation operators: salted two-phase aggregation and salted
broadcast-side explode joins.

AQE's skew-join splitting handles sort-merge skew automatically
(session.py turns it on), but two cases still need explicit salting at
100 TB:

  * **aggregation skew** — a groupBy where one key owns most rows
    (e.g. channel='view' holding 90% of events): the single reducer
    for that key becomes the straggler. ``salted_agg`` splits every
    key into ``n_salts`` sub-keys for the partial aggregate, then
    merges the tiny per-salt partials — two shuffles, but the second
    one moves n_keys x n_salts rows, not n_rows;
  * **broadcast-skew join** — joining a huge skewed fact against a
    small dim replicates fine (broadcast), but when the build side is
    too big to broadcast and one probe key dominates,
    ``salted_join`` salts the probe side and explodes the build side
    across the salt domain.

Only aggregates that decompose over a disjoint partition of the rows
are supported in ``salted_agg`` (sum/count/min/max — the merge is the
same function; avg = sum/count at merge time). That covers the entire
reference aggregation surface (etsdAMT computes min/max/sum/count,
reference code/etsdQuery.c:316-340).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 32,
    avg_pairs: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """Two-phase skew-proof groupBy.

    ``aggs``: out_name -> (fn, col) with fn in sum/count/min/max.
    ``avg_pairs``: out_name -> (sum_name, count_name) computed at merge
    time from already-requested sum/count outputs.

    Phase 1 groups by (keys..., salt) — at most n_keys x n_salts groups
    reach phase 2, so the hottest key is spread over n_salts reducers.
    """
    salted = df.withColumn("__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)))
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[
            (F.count(c) if fn == "count" else getattr(F, fn)(c)).alias(name)
            for name, (fn, c) in aggs.items()
        ]
    )
    phase2 = phase1.groupBy(*keys).agg(
        *[_MERGE[fn](name).alias(name) for name, (fn, _) in aggs.items()]
    )
    for out, (s, c) in (avg_pairs or {}).items():
        phase2 = phase2.withColumn(out, F.col(s) / F.col(c))
    return phase2


def salted_join(
    fact: DataFrame,
    build: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi join: salt the fact side, explode the build side
    across the full salt domain, join on (key, salt).

    The build side is replicated n_salts times — use only when it is
    small enough to replicate but too big (or too mid-sized) to
    broadcast outright, and the fact side has dominating keys.
    """
    f = fact.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )
    b = build.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>")),
    )
    return f.join(b, [on, "__salt"], how).drop("__salt")
