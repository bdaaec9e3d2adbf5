"""etsd_time_series_database_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of ``pvanderwal/ETSD-Time-Series-Database`` (a C
time-series database; reference studied at /root/reference, see
SURVEY.md). This is NOT a port: the reference's bit-packed 512-byte
block storage is replaced by partitioned Parquet + Catalyst; its
hand-rolled range-aggregation loop (reference code/etsdQuery.c:218-401)
is re-expressed as declarative DataFrame plans that Catalyst optimizes
(predicate pushdown == the reference's block-skip search,
code/etsdRead.c:300-353; column pruning == its per-stream offset
arithmetic, code/etsdRead.c:191-223).

Design for scale (100 TB / 1000 executors):
  * long format events table -> partition-prunable, shuffle keyed on
    low-cardinality channel is avoided in favor of time-bucket keys;
  * small dimensions always broadcast;
  * all hot-path expressions JVM-side (pyspark.sql.functions);
    Pandas UDFs only for genuinely non-relational ops (MinHash,
    multimodal decode) and always Arrow-batched.
"""

from etsd_time_series_database_spark.session import get_spark
from etsd_time_series_database_spark.sources.store import load_table, load_tables

__all__ = ["get_spark", "load_table", "load_tables"]
__version__ = "0.1.0"
