"""Query catalog: every operator capability as a named (Spark builder,
oracle SQL) pair. Importing this package registers all queries."""

from etsd_time_series_database_spark.plans.registry import CatalogQuery, catalog, register

# registration side-effects
from etsd_time_series_database_spark.plans import timeseries as _ts  # noqa: F401
from etsd_time_series_database_spark.plans import relational as _rel  # noqa: F401
from etsd_time_series_database_spark.plans import pipeline as _pipe  # noqa: F401
from etsd_time_series_database_spark.plans import analytics as _an  # noqa: F401
from etsd_time_series_database_spark.plans import streaming_replay as _sr  # noqa: F401

__all__ = ["CatalogQuery", "catalog", "register"]
