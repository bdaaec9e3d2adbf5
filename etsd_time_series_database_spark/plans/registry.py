"""Registry of catalog queries.

Each entry pairs an idiomatic-PySpark builder ``(spark, sf_dir) ->
DataFrame`` with an equivalent ANSI/DuckDB oracle SQL string (or None
for ops that SQL cannot express — the driver then does a weaker
rows-only check).

Determinism contract (both sides):
  * a total ORDER BY on every query;
  * timestamps exported as epoch microseconds BIGINT;
  * doubles aggregated via DECIMAL(18,6) so results are bit-identical
    regardless of parallel execution order (see functions/exprs.py);
  * integer aggregates CAST to BIGINT in the oracle (DuckDB SUM(int)
    is HUGEINT, Spark's is BIGINT);
  * ties broken by unique columns (event_id), never engine-specific
    max_by/min_by tie rules.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class CatalogQuery:
    name: str
    category: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    headline: bool = field(default=False)  # include in bench.py


_REGISTRY: dict[str, CatalogQuery] = {}


def register(
    name: str, category: str, oracle: str | None, doc: str = "", headline: bool = False
):
    def deco(fn):
        _REGISTRY[name] = CatalogQuery(name, category, fn, oracle, doc, headline)
        return fn

    return deco


def catalog() -> dict[str, CatalogQuery]:
    return dict(_REGISTRY)
