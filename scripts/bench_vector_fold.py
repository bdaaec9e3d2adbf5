"""Head-to-head: the vector-math fold itself (round-15; feeds #1/#5).

The 20M assignment head-to-head (scripts/bench_ivf_argmax.py) showed
executor task time dominated not by the aggregate strategy but by the
cosine evaluation: zip_with/aggregate higher-order functions are
CodegenFallback — every scored row pays an interpreted 3-lambda fold
plus intermediate array allocations.

Candidate: a STATICALLY UNROLLED arithmetic chain over element_at
(pure codegen'd double math, no lambdas, no intermediate arrays),
guarded by CASE WHEN size(a) = <w> so any other vector width falls
back to the fold — result-identical by construction (the unrolled
chain IS the fold's left-associated sum, starting from the same 0.0).

Forms (cosine over ``dims``-wide float arrays, n rows):
  HOF       shipped zip_with/aggregate fold
  UNROLL    unrolled chain, width pinned to the true width
  GUARDED   the shipped form after round 15: CASE size guard ->
            unrolled, else fold (what production code runs)

Usage: python scripts/bench_vector_fold.py [n] [dims]
Equality asserted on a slice before timing (bitwise, incl. the
0.0 + -0.0 head-of-fold edge). Results go to metrics_history/README.md.
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    dims = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    from pyspark.sql import functions as F

    import bench
    from etsd_time_series_database_spark import get_spark
    from etsd_time_series_database_spark.functions import exprs

    spark = get_spark("bench_vector_fold", {"spark.ui.enabled": "true"})
    path = "/tmp/_vector_fold_corpus"
    if not os.path.isdir(path):
        comp = lambda col, j: (  # noqa: E731
            F.pmod(F.xxhash64(col, F.lit(j)), F.lit(1000)).cast("double")
            / F.lit(500.0)
            - F.lit(1.0)
        ).cast("float")
        (
            spark.range(n)
            .select(
                F.col("id").alias("vec_id"),
                F.array(*[comp(F.col("id"), j) for j in range(dims)]).alias(
                    "a"
                ),
                F.array(
                    *[comp(F.col("id") + 7, j) for j in range(dims)]
                ).alias("b"),
            )
            .write.mode("overwrite")
            .parquet(path)
        )
    df = spark.read.parquet(path)

    def hof_cos(a, b):
        prods = F.zip_with(
            F.col(a),
            F.col(b),
            lambda x, y: x.cast("double") * y.cast("double"),
        )
        dot = F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)
        nrm = lambda c: F.sqrt(  # noqa: E731
            F.aggregate(
                F.col(c),
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        )
        return dot / (nrm(a) * nrm(b))

    def unrolled_cos(a, b, w):
        el = lambda c, i: F.element_at(F.col(c), i + 1).cast(  # noqa: E731
            "double"
        )
        dot = F.lit(0.0)
        na = F.lit(0.0)
        nb = F.lit(0.0)
        for i in range(w):
            dot = dot + el(a, i) * el(b, i)
            na = na + el(a, i) * el(a, i)
            nb = nb + el(b, i) * el(b, i)
        return dot / (F.sqrt(na) * F.sqrt(nb))

    def guarded_cos(a, b, w):
        return F.when(
            (F.size(F.col(a)) == w) & (F.size(F.col(b)) == w),
            unrolled_cos(a, b, w),
        ).otherwise(hof_cos(a, b))

    forms = {
        "HOF_fold": lambda: df.select(hof_cos("a", "b").alias("c")),
        "UNROLL": lambda: df.select(unrolled_cos("a", "b", dims).alias("c")),
        "GUARDED": lambda: df.select(guarded_cos("a", "b", dims).alias("c")),
    }

    sl = df.filter(F.col("vec_id") < 100_000)
    base = [
        r["c"] for r in sl.select(hof_cos("a", "b").alias("c")).collect()
    ]
    for name, expr_f in [
        ("UNROLL", unrolled_cos("a", "b", dims)),
        ("GUARDED", guarded_cos("a", "b", dims)),
    ]:
        got = [r["c"] for r in sl.select(expr_f.alias("c")).collect()]
        assert all(repr(x) == repr(y) for x, y in zip(base, got)), name
    print("equality gate: unrolled == fold bitwise on 100k rows", flush=True)

    out = {"n": n, "dims": dims}
    for name, f in forms.items():
        spark.sparkContext.setJobDescription(f"vector_fold: {name}")
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
    print("VECFOLD:" + json.dumps(out), flush=True)
    shutil.rmtree(path, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
