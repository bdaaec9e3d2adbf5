"""Hot-band pair: measure the LSH degenerate-bucket pathology and its
guard (round-10 verdict finding #2), the dedup analog of the q65
co-alarm chatter pair.

Corpus: ``unique`` random documents plus ``hot`` documents sharing ONE
text, so every MinHash band holds one bucket with ``hot`` members. Two
measured pairs, each old-quadratic vs new-linear:

  * in-run keep-lowest drop set: the ORIGINAL pair self-join
    (hot²/2 join rows PER BAND) vs keep_lowest_drop_ids (bucket-min
    window, ``hot`` rows per band);
  * cross-run probe drop set: the ORIGINAL (new x index) pair
    enumeration (k x hot rows per band) vs the bucket-statistics
    probe incremental_dedup now runs (count/min per touched bucket).

Both forms of each pair are asserted to produce the IDENTICAL drop
set before timing (correctness first, then speed). Timed to a noop
sink, min-of-2 after a warm-up, matching the skew harness discipline.

Usage: python scripts/bench_band_hotspot.py [unique] [hot] [shard_hot]
Env:   SPARK_GRAFT_BENCH_HOT_DOCS overrides ``hot``.

Results are recorded in metrics_history/README.md; this script exists
so the number is reproducible, it is not part of the per-round bench.
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
         "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omicron"]


def main() -> None:
    unique = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    hot = int(
        sys.argv[2]
        if len(sys.argv) > 2
        else os.environ.get("SPARK_GRAFT_BENCH_HOT_DOCS", "4000")
    )
    shard_hot = int(sys.argv[3]) if len(sys.argv) > 3 else 500

    from pyspark.sql import functions as F

    from etsd_time_series_database_spark import get_spark
    from etsd_time_series_database_spark.operators.dedup import (
        keep_lowest_drop_ids,
        minhash_band_table,
    )

    spark = get_spark("bench_band_hotspot")
    rng = random.Random(42)
    hot_text = "omega omega omega repeated boilerplate banner text"
    rows = [
        (i, " ".join(rng.choices(WORDS, k=rng.randint(5, 14))))
        for i in range(unique)
    ] + [(unique + j, hot_text) for j in range(hot)]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    bands = minhash_band_table(corpus, hash_mode="hash64").localCheckpoint()

    shard_rows = [
        (10_000_000 + i, " ".join(rng.choices(WORDS, k=rng.randint(5, 14))))
        for i in range(2_000)
    ] + [(10_100_000 + j, hot_text) for j in range(shard_hot)]
    shard = spark.createDataFrame(shard_rows, "doc_id long, text string")
    shard_bands = minhash_band_table(shard, hash_mode="hash64").localCheckpoint()

    def pairjoin_inrun():
        x, y = bands.alias("x"), bands.alias("y")
        return (
            x.join(
                y,
                on=(F.col("x.band") == F.col("y.band"))
                & (F.col("x.sig") == F.col("y.sig"))
                & (F.col("x.doc_id") > F.col("y.doc_id")),
            )
            .select(F.col("x.doc_id").alias("doc_id"))
            .distinct()
        )

    def bucketmin_inrun():
        return keep_lowest_drop_ids(bands)

    def pairjoin_probe():
        s, i = shard_bands.alias("s"), bands.alias("i")
        return (
            s.join(i, ["band", "sig"])
            .select(F.col("s.doc_id").alias("doc_id"))
            .distinct()
        )

    def stats_probe():
        touched = bands.join(
            F.broadcast(shard_bands.select("band", "sig").distinct()),
            ["band", "sig"],
            "left_semi",
        )
        stats = touched.groupBy("band", "sig").agg(
            F.count(F.lit(1)).alias("__n_idx"),
            F.min("doc_id").alias("__min_idx"),
        )
        return (
            shard_bands.join(stats, ["band", "sig"])
            .filter(
                (F.col("__n_idx") >= 2)
                | (F.col("__min_idx") != F.col("doc_id"))
            )
            .select("doc_id")
            .distinct()
        )

    # correctness first: both members of each pair agree exactly
    assert (
        {r.doc_id for r in bucketmin_inrun().collect()}
        == {r.doc_id for r in pairjoin_inrun().collect()}
    )
    assert (
        {r.doc_id for r in stats_probe().collect()}
        == {r.doc_id for r in pairjoin_probe().collect()}
    )

    out = {"unique": unique, "hot": hot, "shard_hot": shard_hot}
    forms = {
        "inrun_pairjoin_s": pairjoin_inrun,
        "inrun_bucketmin_s": bucketmin_inrun,
        "probe_pairjoin_s": pairjoin_probe,
        "probe_stats_s": stats_probe,
    }
    for name, build in forms.items():
        spark.sparkContext._jvm.System.gc()
        build().write.format("noop").mode("overwrite").save()  # warm-up
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 4)
    print("HOTBANDJSON:" + json.dumps(out))


if __name__ == "__main__":
    main()
