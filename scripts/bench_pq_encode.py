"""Head-to-head: the PQ encode at volume (round-15 #5, x56's heaviest
stage — the O(n·m·k_c) subspace scoring).

Three forms of the per-subspace squared-L2, all REQUIRED to produce
identical codes (asserted on a slice first):

  R13_slice_hof   slice(vec, s*w+1, w) + interpreted zip_with/aggregate
                  fold (the pre-round-15 shipped form)
  R15_slice_un    slice + CASE-width-guarded unrolled chain
                  (what exprs.sq_l2_distance(width=w) now emits)
  R15_direct      no slice at all: element_at(vec, s*w + j + 1) terms
                  read straight from the full vector (measured 5%
                  WORSE than R15_slice_un at 500k x 64 — dynamic
                  index arithmetic per term beats one slice; rejected,
                  R15_slice_un is the shipped form)

Corpus: n vectors x dim floats; codebook = first n_cents ids, m
subspaces. The timed query is the full encode (crossJoin broadcast +
packed-decimal argmin hash agg), noop sink, min-of-2 after warm-up.

Usage: python scripts/bench_pq_encode.py [n] [dim] [m] [n_cents]
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    m = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n_cents = int(sys.argv[4]) if len(sys.argv) > 4 else 16

    from pyspark.sql import functions as F

    import bench
    from etsd_time_series_database_spark import get_spark
    from etsd_time_series_database_spark.functions import exprs

    spark = get_spark("bench_pq_encode", {"spark.ui.enabled": "true"})
    path = "/tmp/_pq_encode_corpus"
    sub_len = dim // m
    if not os.path.isdir(path):
        comp = lambda j: (  # noqa: E731
            F.pmod(F.xxhash64(F.col("id"), F.lit(j)), F.lit(1000)).cast(
                "double"
            )
            / F.lit(500.0)
            - F.lit(1.0)
        ).cast("float")
        (
            spark.range(1, n + 1)
            .select(
                F.col("id").alias("vec_id"),
                F.array(*[comp(j) for j in range(dim)]).alias("embedding"),
            )
            .write.mode("overwrite")
            .parquet(path)
        )
    emb = spark.read.parquet(path)
    s_col = F.explode(F.array(*[F.lit(s) for s in range(m)])).alias("s")
    cents = (
        emb.filter(F.col("vec_id").between(1, n_cents))
        .select(F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cv"))
        .select("cent_id", s_col, "cv")
        .select(
            "cent_id",
            "s",
            F.slice("cv", F.col("s") * sub_len + 1, sub_len).alias("cvs"),
        )
    )

    def hof_slice_d2():
        sub = F.slice("embedding", F.col("s") * sub_len + 1, sub_len)
        return exprs.sq_l2_distance(sub, F.col("cvs"))

    def unroll_slice_d2():
        sub = F.slice("embedding", F.col("s") * sub_len + 1, sub_len)
        return exprs.sq_l2_distance(sub, F.col("cvs"), width=sub_len)

    def direct_d2():
        # the rejected slice-free form, kept inline for reproducibility
        vec_col, s_col, cvs_col = F.col("embedding"), F.col("s"), F.col("cvs")
        acc = F.lit(0.0)
        for j in range(sub_len):
            d = F.element_at(vec_col, s_col * sub_len + j + 1).cast(
                "double"
            ) - F.element_at(cvs_col, j + 1).cast("double")
            acc = acc + d * d
        fb = exprs.sq_l2_distance(
            F.slice(vec_col, s_col * sub_len + 1, sub_len), cvs_col,
            width=sub_len,
        )
        return F.when(
            (F.size(vec_col) == F.lit(dim))
            & (F.size(cvs_col) == F.lit(sub_len)),
            acc,
        ).otherwise(fb)

    def encode(d2_f):
        return (
            emb.select("vec_id", "embedding")
            .crossJoin(F.broadcast(cents))
            .select("vec_id", "s", "cent_id", d2_f().alias("d2"))
            .withColumn(
                "__ord",
                F.col("d2").cast("decimal(19,6)")
                * F.expr("CAST(10000000000000 AS DECIMAL(14,0))")
                + F.col("cent_id").cast("decimal(13,0)"),
            )
            .groupBy("vec_id", "s")
            .agg(F.min_by("cent_id", "__ord").alias("cent_id"))
        )

    forms = {"R13_slice_hof": hof_slice_d2, "R15_slice_un": unroll_slice_d2,
             "R15_direct": direct_d2}

    sl = 50_000
    base = sorted(
        map(
            tuple,
            encode(hof_slice_d2).filter(F.col("vec_id") <= sl).collect(),
        )
    )
    for name, f in list(forms.items())[1:]:
        got = sorted(
            map(tuple, encode(f).filter(F.col("vec_id") <= sl).collect())
        )
        assert got == base, f"{name} diverges on the {sl}-vector slice"
    print(f"equality gate: all encodes identical on {sl} vectors", flush=True)

    out = {"n": n, "dim": dim, "m": m, "n_cents": n_cents}
    for name, f in forms.items():
        spark.sparkContext.setJobDescription(f"pq_encode: {name}")
        q = encode(f)
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
    print("PQENCODE:" + json.dumps(out), flush=True)
    shutil.rmtree(path, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
