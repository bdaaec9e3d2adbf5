"""Driver-style correctness self-check.

Replicates the round driver's gate: run every ``__spark_entry__.queries()``
entry on a *vanilla* SparkSession (no repo conf), run the matching
``oracle_sql()`` string in DuckDB over the same parquet tables, and compare
row counts, schemas (column-name sets), and a value hash computed over
columns sorted by name.

Usage: python scripts/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import traceback

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _hash_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)
    import hashlib

    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        # Pin the session zone: queries cast timestamp string literals,
        # which Spark otherwise parses in the JVM-local zone while
        # DuckDB's TIMESTAMP literal + epoch_us is zone-naive (== UTC).
        .config("spark.sql.session.timeZone", "UTC")
        .appName("selfcheck")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    import __spark_entry__ as entry

    queries = entry.queries()
    oracles = entry.oracle_sql()

    results = {}
    bad = []
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        rec = {"rows_match": None, "schema_match": None, "hash_match": None,
               "err": None}
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
            rec["spark_rows"] = len(srows)
            sql = oracles.get(name)
            if sql is None:
                rec["rows_match"] = rec["spark_rows"] >= 0
                results[name] = rec
                continue
            ores = con.execute(sql)
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
            rec["oracle_rows"] = len(orows)
            rec["rows_match"] = len(srows) == len(orows)
            rec["schema_match"] = sorted(scols) == sorted(ocols)
            rec["hash_match"] = (
                rec["rows_match"]
                and rec["schema_match"]
                and _hash_rows(scols, [tuple(r) for r in srows])
                == _hash_rows(ocols, orows)
            )
            if not rec["hash_match"]:
                bad.append(name)
        except Exception:
            rec["err"] = traceback.format_exc(limit=3)
            bad.append(name)
        results[name] = rec
        ok = rec["hash_match"] if rec.get("hash_match") is not None else (
            rec["rows_match"] and not rec["err"])
        print(f"{name}: {'OK' if ok else 'FAIL'}"
              + (f"  rows={rec.get('spark_rows')}" if not rec["err"] else ""))
        if rec["err"]:
            print(rec["err"].splitlines()[-1])

    n_ok = sum(
        1 for r in results.values()
        if (r.get("hash_match") or (r.get("hash_match") is None
                                    and r.get("rows_match") and not r["err"]))
    )
    print(f"\n{n_ok}/{len(results)} green; failing: {bad}")
    # Route the snapshot by scale factor: sf0.1 evidence lives in
    # SELFCHECK_SF01.json, everything else in SELFCHECK.json. Without
    # this, an sf0.1 run silently overwrites the sf0.01 snapshot with
    # sf0.1 row counts/hashes (which is exactly what happened mid
    # round 6 before the split).
    base = os.path.basename(os.path.normpath(sf_dir))
    out_name = "SELFCHECK_SF01.json" if base == "sf0.1" else "SELFCHECK.json"
    out_path = os.path.join(REPO, out_name)
    print(f"snapshot -> {out_name}")
    if only and os.path.exists(out_path):
        # Filtered run: MERGE into the existing snapshot instead of
        # truncating it to the filter set — a partial refresh must
        # never discard other entries' evidence (the staleness the
        # round-4 verdict flagged came from exactly this workflow:
        # full refresh, then later registrations with no snapshot row).
        with open(out_path) as f:
            merged = json.load(f)
        merged.update(results)
        # drop rows for entries no longer in the catalog
        results = {k: merged[k] for k in sorted(merged) if k in queries}
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1, default=str)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
