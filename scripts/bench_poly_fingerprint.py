"""Head-to-head: poly_fingerprint's per-character fold (round-15 #7).

The shipped form walks the string with substr(c, i, 1): UTF8String
substring seeks from the head each call, so one fingerprint is
O(len^2) in code points — and the sequence/transform/aggregate chain
is CodegenFallback-interpreted. Round 14 measured a split('')-based
linear form at -26% on 400k shingles but rejected it: split('')
splits UTF-16 CODE UNITS, so non-BMP text hashes differently from the
substr walk (and from the DuckDB oracle twin), breaking bit-equality.

Round-15 candidates, all REQUIRED to hash identically to the shipped
form on an adversarial corpus (ASCII, Latin-1, CJK, combining marks,
and non-BMP emoji / SMP ideographs — asserted before timing):

  CUR      substr walk (shipped)
  REGEX    regexp_extract_all('(?s).') -> one string per CODE POINT,
           then the same ascii() fold (linear, one regex pass)
  UTF32    encode(c,'UTF-32') -> binary (Java: BE, no BOM); code point i is
           big-endian int at byte 4i, read with an O(1) binary
           substr + hex + conv (linear, no regex)
  SPLIT    split('') reference (code units — EXPECTED to diverge on
           the non-BMP rows; shown for the speed bound only)

Usage: python scripts/bench_poly_fingerprint.py [n_shingles]
Timed to a noop sink, min-of-2 after warm-up. Results go to
metrics_history/README.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FP_MOD = 1_000_000_007
FP_BASE = 31


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000

    from pyspark.sql import functions as F

    import bench
    from etsd_time_series_database_spark import get_spark
    from etsd_time_series_database_spark.functions.exprs import (
        poly_fingerprint,
    )

    spark = get_spark("bench_poly_fp", {"spark.ui.enabled": "true"})

    def fold(codes):
        return F.aggregate(
            codes,
            F.lit(0).cast("bigint"),
            lambda acc, x: (acc * FP_BASE + x.cast("bigint"))
            % F.lit(FP_MOD),
        )

    def fp_regex(c):
        codes = F.transform(
            F.regexp_extract_all(c, F.lit("(?s)."), 0), lambda ch: F.ascii(ch)
        )
        # empty string: the shipped walk degenerates to ascii('') = 0
        # folds (hash 0); short-circuit the same value
        return F.when(F.length(c) == 0, F.lit(0).cast("bigint")).otherwise(
            fold(codes)
        )

    def fp_utf32(c):
        # Java's UTF-32 charset encodes big-endian with NO BOM
        b = F.encode(c, "UTF-32")
        codes = F.transform(
            F.sequence(F.lit(0), F.length(c) - 1),
            lambda i: F.conv(F.hex(F.substr(b, i * 4 + 1, F.lit(4))), 16, 10),
        )
        # sequence(0, -1) on an empty string is a DESCENDING range —
        # guard it to the shipped walk's hash-0 value
        return F.when(F.length(c) == 0, F.lit(0).cast("bigint")).otherwise(
            fold(codes)
        )

    def fp_split(c):
        return fold(F.transform(F.split(c, ""), lambda ch: F.ascii(ch)))

    forms = {
        "CUR_substr": poly_fingerprint,
        "REGEX_dot": fp_regex,
        "UTF32_bytes": fp_utf32,
        "SPLIT_units": fp_split,
    }

    # ---- equality gate on an adversarial corpus ------------------------
    adv = [
        "", "a", "hello world shingle", "x" * 120,
        "café naïve über",            # Latin-1 range
        "日本語 漢字 한글",  # CJK / Hangul
        "é combining acute",                    # combining mark
        "emoji \U0001f4a9 pile \U0001f600 grin",      # non-BMP (SMP)
        "\U00020000\U0002a700 ideographs",            # CJK ext B (SMP)
        "mixed aé\U0001f600z end",
    ]
    df_adv = spark.createDataFrame([(s,) for s in adv], "s string")
    got = df_adv.select(
        poly_fingerprint(F.col("s")).alias("cur"),
        fp_regex(F.col("s")).alias("rx"),
        fp_utf32(F.col("s")).alias("u32"),
        fp_split(F.col("s")).alias("sp"),
    ).collect()
    split_diverges = False
    for i, r in enumerate(got):
        assert r["rx"] == r["cur"], (adv[i], r["rx"], r["cur"])
        assert r["u32"] == r["cur"], (adv[i], r["u32"], r["cur"])
        if r["sp"] != r["cur"]:
            split_diverges = True
    print(
        "equality gate: REGEX and UTF32 identical to CUR on all "
        f"{len(adv)} adversarial strings; split('') diverges on "
        f"non-BMP = {split_diverges}",
        flush=True,
    )

    # ---- timing on a shingle-shaped corpus -----------------------------
    word = lambda w: F.concat(  # noqa: E731
        F.lit("tok"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(w)), F.lit(30000)).cast(
            "string"
        ),
    )
    sh = spark.range(n).select(
        F.concat_ws(" ", word(0), word(1), word(2)).alias("s")
    )
    sh.write.mode("overwrite").parquet("/tmp/_polyfp_corpus")
    sh = spark.read.parquet("/tmp/_polyfp_corpus")

    out = {"n": n}
    for name, f in forms.items():
        spark.sparkContext.setJobDescription(f"poly_fp: {name}")
        q = sh.select(f(F.col("s")).alias("h"))
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
    print("POLYFP:" + json.dumps(out), flush=True)
    import shutil

    shutil.rmtree("/tmp/_polyfp_corpus", ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
