"""Head-to-head: the k-means per-cell mean at volume (round-15).

kmeans_refine's round-13 mean posexploded every assigned vector to
(cell, dim_pos, component) rows — corpus x dims row multiplication,
shuffled twice (the (cell, dim) decimal-mean exchange plus the
collect_list re-assembly exchange). The round-15 wide form aggregates
``dims`` DECIMAL(38,12) sum buffers in ONE groupBy(cent_id) hash
aggregation (map-side combinable: n_cells partial rows per task) and
re-assembles the centroid with a plain projection.

Both forms asserted bit-identical on the full output before timing
(exact decimal sums are order-independent). Timed: one mean pass over
a pre-assigned corpus (the assignment itself is out of scope — it is
the argmax measured in scripts/bench_ivf_argmax.py).

Usage: python scripts/bench_kmeans_mean.py [n] [dims] [cells]
Results go to metrics_history/README.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dims = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    cells = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from pyspark.sql import functions as F

    import bench
    from etsd_time_series_database_spark import get_spark
    from etsd_time_series_database_spark.operators.similarity import DEC_KM

    spark = get_spark("bench_kmeans_mean", {"spark.ui.enabled": "true"})
    path = "/tmp/_kmeans_mean_corpus"
    if not os.path.isdir(path):
        comp = lambda j: (  # noqa: E731
            F.pmod(F.xxhash64(F.col("id"), F.lit(j)), F.lit(1000)).cast(
                "double"
            )
            / F.lit(500.0)
            - F.lit(1.0)
        ).cast("float")
        (
            spark.range(n)
            .select(
                F.pmod(F.col("id"), F.lit(cells)).alias("cent_id"),
                F.array(*[comp(j) for j in range(dims)]).alias("embedding"),
            )
            .write.mode("overwrite")
            .parquet(path)
        )
    assigned = spark.read.parquet(path)

    def mean_explode():
        comps = assigned.select(
            "cent_id", F.posexplode(F.col("embedding")).alias("__pos", "__x")
        )
        means = comps.groupBy("cent_id", "__pos").agg(
            (
                F.sum(F.col("__x").cast("double").cast(DEC_KM)).cast("double")
                / F.count(F.lit(1))
            ).alias("__m")
        )
        return (
            means.groupBy("cent_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("__pos", "__m"))
                ).alias("__pm")
            )
            .select(
                "cent_id",
                F.transform(
                    F.col("__pm"), lambda s: s["__m"].cast("float")
                ).alias("cent_vec"),
            )
        )

    def mean_wide():
        sums = assigned.groupBy("cent_id").agg(
            F.count(F.col("embedding")).alias("__n"),
            *[
                F.sum(
                    F.element_at(F.col("embedding"), i + 1)
                    .cast("double")
                    .cast(DEC_KM)
                ).alias(f"__s{i}")
                for i in range(dims)
            ],
        )
        return sums.select(
            "cent_id",
            F.array(
                *[
                    (F.col(f"__s{i}").cast("double") / F.col("__n")).cast(
                        "float"
                    )
                    for i in range(dims)
                ]
            ).alias("cent_vec"),
        )

    a = sorted((r["cent_id"], tuple(r["cent_vec"])) for r in mean_explode().collect())
    b = sorted((r["cent_id"], tuple(r["cent_vec"])) for r in mean_wide().collect())
    assert a == b, "wide mean diverges from the explode mean"
    print(f"equality gate: identical centroids over {n} x {dims}", flush=True)

    out = {"n": n, "dims": dims, "cells": cells}
    for name, f in {"R13_posexplode": mean_explode, "R15_wide": mean_wide}.items():
        spark.sparkContext.setJobDescription(f"kmeans_mean: {name}")
        q = f()
        q.write.format("noop").mode("overwrite").save()
        best, task_ms = float("inf"), None
        for _ in range(2):
            before = bench._executor_totals(spark)
            t0 = time.perf_counter()
            q.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            after = bench._executor_totals(spark)
            if dt < best and before and after:
                task_ms = after["task_time_ms"] - before["task_time_ms"]
            best = min(best, dt)
        out[name] = {"wall_s": round(best, 3), "task_ms": task_ms}
        print(name, out[name], flush=True)
    print("KMEANSMEAN:" + json.dumps(out), flush=True)
    shutil.rmtree(path, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
