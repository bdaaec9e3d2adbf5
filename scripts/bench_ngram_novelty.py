"""Head-to-head: ngram_novelty at volume (round-15 #2 — the verdict
ordered a 20M-gram measurement of the round-14 rewrite, whose own side
file read task 794 -> 2082 ms at sf0.1 against the doc's "~equal").

Three forms, all REQUIRED to produce identical results (asserted on a
slice before timing):

  OLD  (pre-round-14): firsts = (gram -> min doc); grams JOIN firsts
       on the gram key; groupBy(doc) count + sum(first == doc).
       Two extra gram-sized shuffles at scale (join probe + rollup).
  R14  firsts.groupBy(min_doc).count() for n_novel; n_ngrams a second
       aggregation OVER THE EXPLODED GRAM ROWS grouped by doc.
  NEW  (round 15, the shipped form): n_ngrams = sum per doc of
       size(array_distinct(grams)) — computed from the UN-exploded
       per-doc array at scan speed; the only gram-sized pass left is
       the unavoidable first-occurrence min.

Corpus: ``docs`` documents of ``words_per_doc`` words; the second half
of the corpus repeats the first half's text (heavy re-crawl overlap,
the workload the operator exists for), so the firsts table is half the
gram rows and attribution does real work.

Usage: python scripts/bench_ngram_novelty.py [docs] [words_per_doc]
Timed to a noop sink, min-of-2 after warm-up; executor task time via
the bench REST snapshot-diff. Results go to metrics_history/README.md.
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
    docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    wpd = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    from pyspark.sql import functions as F

    import bench
    from etsd_time_series_database_spark import get_spark
    from etsd_time_series_database_spark.operators.dedup import shingle_expr
    from etsd_time_series_database_spark.operators.textstats import (
        _tokens,
        ngram_novelty,
    )

    spark = get_spark("bench_ngram_novelty", {"spark.ui.enabled": "true"})
    path = "/tmp/_ngram_novelty_corpus"
    if not os.path.isdir(path):
        eff = F.when(
            F.col("id") >= docs // 2, F.col("id") - docs // 2
        ).otherwise(F.col("id"))
        word = lambda w: F.concat(  # noqa: E731
            F.lit("w"),
            F.pmod(F.xxhash64(eff, F.lit(w)), F.lit(5000)).cast("string"),
        )
        text = F.concat_ws(" ", F.array(*[word(w) for w in range(wpd)]))
        (
            spark.range(docs)
            .select(F.col("id").alias("doc_id"), text.alias("text"))
            .write.mode("overwrite")
            .parquet(path)
        )
    df = spark.read.parquet(path)
    n = 3

    def form_old():
        toks = df.select(F.col("doc_id"), _tokens("text").alias("__toks"))
        grams = toks.select(
            F.col("doc_id"),
            F.explode(F.array_distinct(shingle_expr("__toks", n))).alias(
                "__g"
            ),
        )
        grams = grams.withColumn("__gfp", F.xxhash64("__g")).drop("__g")
        firsts = grams.groupBy("__gfp").agg(F.min("doc_id").alias("__first"))
        per = (
            grams.join(firsts, "__gfp")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_ngrams"),
                F.sum(
                    F.when(F.col("__first") == F.col("doc_id"), 1).otherwise(0)
                ).alias("n_novel"),
            )
        )
        return (
            df.select("doc_id")
            .join(per, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("n_ngrams", F.lit(0).cast("bigint")).alias(
                    "n_ngrams"
                ),
                F.coalesce("n_novel", F.lit(0).cast("bigint")).alias(
                    "n_novel"
                ),
            )
            .withColumn("novelty", F.try_divide("n_novel", "n_ngrams"))
            .orderBy("doc_id")
        )

    def form_r14():
        toks = df.select(F.col("doc_id"), _tokens("text").alias("__toks"))
        grams = toks.select(
            F.col("doc_id"),
            F.explode(F.array_distinct(shingle_expr("__toks", n))).alias(
                "__g"
            ),
        )
        grams = grams.withColumn("__gfp", F.xxhash64("__g")).drop("__g")
        firsts = grams.groupBy("__gfp").agg(F.min("doc_id").alias("__first"))
        novel = firsts.groupBy(F.col("__first").alias("doc_id")).agg(
            F.count(F.lit(1)).alias("n_novel")
        )
        totals = grams.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_ngrams")
        )
        per = totals.join(novel, "doc_id", "left")
        return (
            df.select("doc_id")
            .join(per, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("n_ngrams", F.lit(0).cast("bigint")).alias(
                    "n_ngrams"
                ),
                F.coalesce("n_novel", F.lit(0).cast("bigint")).alias(
                    "n_novel"
                ),
            )
            .withColumn("novelty", F.try_divide("n_novel", "n_ngrams"))
            .orderBy("doc_id")
        )

    def form_new():
        return ngram_novelty(df, n=n)

    forms = {"OLD_join": form_old, "R14_two_agg": form_r14,
             "NEW_size_totals": form_new}

    sl = 100_000
    base = {
        (r["doc_id"], r["n_ngrams"], r["n_novel"], r["novelty"])
        for r in form_old().filter(F.col("doc_id") < sl).collect()
    }
    for name, f in list(forms.items())[1:]:
        got = {
            (r["doc_id"], r["n_ngrams"], r["n_novel"], r["novelty"])
            for r in f().filter(F.col("doc_id") < sl).collect()
        }
        assert got == base, f"{name} diverges from OLD on the {sl}-doc slice"
    print(f"equality gate: all forms identical on {sl} docs", flush=True)

    out = {"docs": docs, "words_per_doc": wpd,
           "gram_rows": docs * (wpd - n + 1)}
    for name, f in forms.items():
        spark.sparkContext.setJobDescription(f"ngram_novelty: {name}")
        df_out = f()
        df_out.write.format("noop").mode("overwrite").save()
        best = float("inf")
        task_ms = None
        for _ in range(2):
            before = bench._executor_totals(spark)
            t0 = time.perf_counter()
            df_out.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            after = bench._executor_totals(spark)
            if dt < best and before and after:
                task_ms = after["task_time_ms"] - before["task_time_ms"]
            best = min(best, dt)
        out[name] = {"wall_s": round(best, 3), "task_ms": task_ms}
        print(name, out[name], flush=True)
    print("NGRAMNOVELTY:" + json.dumps(out), flush=True)
    shutil.rmtree(path, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
