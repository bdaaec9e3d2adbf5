"""Relational catalog queries Q20–Q26 (SURVEY.md §2.2): joins, set ops,
grouping sets, scalar-function battery — the general relational surface
a Spark-based engine provides beyond the reference's single-table
queries, exercised over the TPC-H-ish driver tables.

Scale notes: dimension joins carry NO hard ``F.broadcast`` hint. Unlike
nation/region (fixed 25/5 rows), part and customer grow linearly with
scale factor — at a 100 TB lineitem they are billions of rows, and a
hard broadcast hint on a side that large does not degrade, it OOMs the
driver. Instead the plans stay declarative and AQE /
``autoBroadcastJoinThreshold`` picks broadcast-hash when the dim side's
runtime size fits (it does at every test SF — plan-asserted in
``tests/test_plan_shape.py::test_dim_join_broadcasts``) and falls back
to sort-merge with skew splitting when it doesn't. Fact-fact joins are
plain equi-joins that AQE plans as sort-merge.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etsd_time_series_database_spark.functions.exprs import DEC
from etsd_time_series_database_spark.plans.registry import register
from etsd_time_series_database_spark.sources.store import load_table


@register(
    "q20_broadcast_join",
    "join",
    """
    SELECT p.p_brand,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)))
                AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand ORDER BY p_brand
    """,
    doc="Fact x dim equi join; no hard hint — AQE broadcasts the dim side "
    "while it fits and degrades to sort-merge when it grows past threshold.",
    headline=True,
)
def q20(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(DEC)
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(rev).cast("double").alias("revenue"),
        )
        .orderBy("p_brand")
    )


@register(
    "q21_multiway_join_agg",
    "join",
    """
    SELECT c.c_mktsegment, o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)))
                AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment, o.o_orderpriority
    ORDER BY c_mktsegment, o_orderpriority
    """,
    doc="TPC-H-style pricing summary over a 3-way join.",
    headline=True,
)
def q21(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    rev = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(DEC)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(rev).cast("double").alias("revenue"),
        )
        .orderBy("c_mktsegment", "o_orderpriority")
    )


@register(
    "q22_semi_anti_join",
    "join",
    """
    WITH f AS (
      SELECT c.c_nationkey,
             CASE WHEN EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
                  THEN 1 ELSE 0 END AS has_order
      FROM customer c
    )
    SELECT n.n_name,
           CAST(SUM(has_order) AS BIGINT) AS n_with_orders,
           CAST(SUM(1 - has_order) AS BIGINT) AS n_without_orders
    FROM f JOIN nation n ON f.c_nationkey = n.n_nationkey
    GROUP BY n.n_name ORDER BY n_name
    """,
    doc="EXISTS / NOT EXISTS as left-semi + left-anti joins.",
)
def q22(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    n = load_table(spark, sf_dir, "nation")
    semi = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_with_orders"))
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_without_orders"))
    )
    return (
        semi.join(anti, "c_nationkey", "full_outer")
        .join(n, F.col("c_nationkey") == n.n_nationkey)
        .select(
            "n_name",
            F.coalesce("n_with_orders", F.lit(0)).alias("n_with_orders"),
            F.coalesce("n_without_orders", F.lit(0)).alias("n_without_orders"),
        )
        .orderBy("n_name")
    )


@register(
    "q24_set_ops",
    "setops",
    """
    WITH a AS (SELECT user_id FROM events WHERE event_type IN ('click','view')),
         b AS (SELECT user_id FROM events WHERE event_type IN ('view','purchase'))
    SELECT 'except' AS op,
           CAST(count(*) AS BIGINT) AS n
    FROM (SELECT DISTINCT user_id FROM a EXCEPT SELECT DISTINCT user_id FROM b)
    UNION ALL
    SELECT 'intersect',
           CAST(count(*) AS BIGINT)
    FROM (SELECT DISTINCT user_id FROM a INTERSECT SELECT DISTINCT user_id FROM b)
    UNION ALL
    SELECT 'union_all', CAST(count(*) AS BIGINT)
    FROM (SELECT user_id FROM a UNION ALL SELECT user_id FROM b)
    ORDER BY op
    """,
    doc="UNION ALL / INTERSECT / EXCEPT over channel subsets.",
)
def q24(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    a = e.filter(F.col("event_type").isin("click", "view")).select("user_id")
    b = e.filter(F.col("event_type").isin("view", "purchase")).select("user_id")

    def one(op: str, df):
        return df.agg(F.count(F.lit(1)).alias("n")).select(F.lit(op).alias("op"), "n")

    return (
        one("except", a.distinct().subtract(b.distinct()))
        .unionByName(one("intersect", a.intersect(b)))
        .unionByName(one("union_all", a.unionByName(b)))
        .orderBy("op")
    )


@register(
    "q25_rollup",
    "grouping-sets",
    """
    WITH d AS (
      SELECT event_type, (epoch_us(ts) // 86400000000) AS day FROM events
    )
    SELECT COALESCE(event_type, 'ALL') AS event_type_g,
           COALESCE(day, -1) AS day_g,
           CAST(count(*) AS BIGINT) AS n
    FROM d GROUP BY ROLLUP(event_type, day)
    ORDER BY event_type_g, day_g
    """,
    doc="GROUP BY ROLLUP(channel, day) counts.",
)
def q25(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr("unix_micros(ts) div 86400000000").alias("day")
    )
    return (
        e.rollup("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type_g"),
            F.coalesce("day", F.lit(-1)).alias("day_g"),
            "n",
        )
        .orderBy("event_type_g", "day_g")
    )


@register(
    "q26_scalar_battery",
    "scalar",
    """
    SELECT l_orderkey, l_linenumber,
           upper(l_returnflag) AS rf_upper,
           concat(l_returnflag, '-', l_linestatus) AS rf_ls,
           CAST(length(concat(l_returnflag, l_linestatus)) AS INTEGER) AS len2,
           substr(concat(l_returnflag, l_linestatus, l_returnflag), 2, 2) AS sub2,
           abs(l_extendedprice - 1000.0) AS abs_diff,
           l_orderkey % 7 AS mod7,
           CAST(floor(l_extendedprice / 100.0) AS BIGINT) AS price_band,
           CAST(extract(year FROM l_shipdate) AS INTEGER) AS ship_year,
           CAST(extract(month FROM l_shipdate) AS INTEGER) AS ship_month,
           CAST(l_quantity AS VARCHAR) AS qty_str
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber LIMIT 200
    """,
    doc="String/date/math scalar expression battery (reference O16 analog "
    "surface); all whole-stage-codegen JVM expressions.",
)
def q26(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.select(
            "l_orderkey",
            "l_linenumber",
            F.upper("l_returnflag").alias("rf_upper"),
            F.concat_ws("-", "l_returnflag", "l_linestatus").alias("rf_ls"),
            F.length(F.concat("l_returnflag", "l_linestatus")).alias("len2"),
            F.substring(
                F.concat("l_returnflag", "l_linestatus", "l_returnflag"), 2, 2
            ).alias("sub2"),
            F.abs(F.col("l_extendedprice") - 1000.0).alias("abs_diff"),
            (F.col("l_orderkey") % 7).alias("mod7"),
            F.floor(F.col("l_extendedprice") / 100.0).alias("price_band"),
            F.year("l_shipdate").alias("ship_year"),
            F.month("l_shipdate").alias("ship_month"),
            F.col("l_quantity").cast("string").alias("qty_str"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(200)
    )
