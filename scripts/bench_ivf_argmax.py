"""Head-to-head: the IVF assignment argmax at volume (round-15 #1).

The assignment `max_by(cent_id, struct(cos DOUBLE, -cent_id))` +
`any_value(vec)` plans as SortAggregate (non-primitive comparison and
carry buffers): every scored row (n x k) pays a per-partition sort by
the vector key, twice (partial + final). Three candidate forms, all
REQUIRED to produce bit-identical assignments (asserted before any
timing, on a corpus that includes zero vectors -> NaN cosines, the
tie-heavy edge):

  A  current: groupBy(key) max_by(struct) + any_value(vec)  [SortAgg]
  B  groupBy(key, vec) max_by(cent_id, pack) where pack is the
     IEEE-754 sortable-bits image of cos (exprs.double_sortable_bits,
     clamped to the |cos| < 2 domain) packed with the tie-break
     cent_id into one DECIMAL(38,0)                        [HashAgg]
  C  no aggregation at all: per-row fold over the LITERAL centroid
     array (argmax inside one projection; zero shuffle)    [no agg]

Timed to a noop sink, min-of-2 after a warm-up, isolated from input
generation (the corpus is materialized to parquet first). Executor
task time via the bench's REST snapshot-diff. Records go to
metrics_history/README.md; not part of the per-round bench.

Usage: python scripts/bench_ivf_argmax.py [n] [dims] [k]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MAXL = (1 << 63) - 1


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    dims = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from pyspark.sql import functions as F

    import bench
    from etsd_time_series_database_spark import get_spark
    from etsd_time_series_database_spark.functions.exprs import (
        cosine_similarity,
        double_sortable_bits,
    )

    spark = get_spark("bench_ivf_argmax", {"spark.ui.enabled": "true"})
    path = "/tmp/_ivf_argmax_corpus"
    if not os.path.isdir(path):
        # deterministic pseudo-random float vectors. Centroid rows
        # (id < k) come in IDENTICAL pairs (0==1, 2==3, ...), so every
        # corpus row has an exact cosine tie between two cent_ids —
        # the tie-break the struct ordering resolves by lowest id is
        # exercised on every single row. (Zero vectors are not a
        # reachable edge: ANSI raises on the 0/0 norm division before
        # any NaN cosine exists.)
        eff = F.when(
            F.col("id") < k, F.floor(F.col("id") / 2) * 2
        ).otherwise(F.col("id"))
        comp = lambda j: (  # noqa: E731
            F.pmod(F.xxhash64(eff, F.lit(j)), F.lit(1000)).cast("double")
            / F.lit(500.0)
            - F.lit(1.0)
        ).cast("float")
        vec = F.array(*[comp(j) for j in range(dims)])
        (
            spark.range(n)
            .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
            .write.mode("overwrite")
            .parquet(path)
        )
    emb = spark.read.parquet(path)
    cents = emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    cents_rows = sorted(
        (int(r["cent_id"]), list(r["cent_vec"])) for r in cents.collect()
    )

    def scored():
        return emb.crossJoin(F.broadcast(cents)).select(
            "vec_id",
            "embedding",
            "cent_id",
            cosine_similarity("embedding", "cent_vec").alias("__cos"),
        )

    def form_a():
        return (
            scored()
            .groupBy("vec_id")
            .agg(
                F.max_by(
                    "cent_id",
                    F.struct(
                        F.col("__cos"), (-F.col("cent_id")).alias("__nid")
                    ),
                ).alias("cent_id"),
                F.any_value("embedding").alias("embedding"),
            )
            .select("vec_id", "embedding", "cent_id")
        )

    def form_b():
        # the production path: sortable-bits ordering materialized via
        # the projection chain (exprs.with_sortable_bits), DECIMAL(38,0)
        # pack, HashAggregate on (key, vec)
        from etsd_time_series_database_spark.operators.similarity import (
            _nearest_cell,
        )

        return _nearest_cell(scored(), "vec_id", "embedding")

    def form_c():
        carr = F.array(
            *[
                F.struct(
                    F.lit(cid).cast("bigint").alias("cid"),
                    F.array(*[F.lit(float(v)) for v in cv])
                    .cast("array<float>")
                    .alias("cv"),
                )
                for cid, cv in cents_rows
            ]
        )
        so = F.transform(
            carr,
            lambda c: F.struct(
                double_sortable_bits(
                    cosine_similarity(F.col("embedding"), c["cv"])
                ).alias("o"),
                c["cid"].alias("cid"),
            ),
        )
        init = F.struct(
            F.lit(-(1 << 63)).cast("bigint").alias("o"),
            F.lit(None).cast("bigint").alias("cid"),
        )
        best = F.aggregate(
            so,
            init,
            lambda acc, s: F.when(
                (s["o"] > acc["o"])
                | ((s["o"] == acc["o"]) & (s["cid"] < acc["cid"])),
                s,
            ).otherwise(acc),
        )
        return emb.select(
            "vec_id", "embedding", best["cid"].alias("cent_id")
        )

    forms = {"A_sortagg_struct": form_a, "B_hashagg_bits": form_b}
    if os.environ.get("SPARK_GRAFT_BENCH_LITERAL_FOLD") == "1":
        # 30x WORSE at 300k rows (interpreted HOF class) — off by default
        forms["C_literal_fold"] = form_c

    # equality gate on a slice before any timing
    sl = 200_000
    base = {
        r["vec_id"]: r["cent_id"]
        for r in form_a().filter(F.col("vec_id") < sl).collect()
    }
    for name, f in list(forms.items())[1:]:
        got = {
            r["vec_id"]: r["cent_id"]
            for r in f().filter(F.col("vec_id") < sl).collect()
        }
        assert got == base, f"{name} diverges from A on the {sl}-row slice"
    print(f"equality gate: all forms identical on {sl} rows "
          "(every row carries an exact duplicate-centroid cosine tie)",
          flush=True)

    # INTERLEAVED timing (A,B,A,B,...): the 20M task-time band between
    # separate passes measured +-30-40% this session, so only
    # alternating same-process passes give a fair A/B ratio. Min and
    # per-pass lists are both reported.
    out = {"n": n, "dims": dims, "k": k}
    dfs = {}
    for name, f in forms.items():
        dfs[name] = f()
        dfs[name].write.format("noop").mode("overwrite").save()  # warm-up
        plan = dfs[name]._jdf.queryExecution().executedPlan().toString()
        out[name] = {
            "wall_s": [],
            "task_ms": [],
            "sortagg": plan.count("SortAggregate"),
            "hashagg": plan.count("HashAggregate"),
            "exchange": plan.count("Exchange hashpartitioning"),
        }
    n_rounds = int(os.environ.get("SPARK_GRAFT_BENCH_ROUNDS", "3"))
    for _ in range(n_rounds):
        for name, df in dfs.items():
            spark.sparkContext.setJobDescription(f"ivf_argmax: {name}")
            before = bench._executor_totals(spark)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            after = bench._executor_totals(spark)
            out[name]["wall_s"].append(round(dt, 3))
            if before and after:
                out[name]["task_ms"].append(
                    after["task_time_ms"] - before["task_time_ms"]
                )
    for name in dfs:
        print(name, out[name], flush=True)
    print("IVFARGMAX:" + json.dumps(out), flush=True)
    shutil.rmtree(path, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
