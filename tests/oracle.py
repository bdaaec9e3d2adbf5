"""Local mirror of the driver's differential gate: run a catalog query
on Spark and its oracle SQL on DuckDB, canonicalize, compare exactly.

Stricter than the driver (exact float equality, not hash-of-rounded):
if this passes, any reasonable canonicalization also matches.
"""

from __future__ import annotations

import math
from pathlib import Path

from etsd_time_series_database_spark.sources.store import TABLES


def register_duck_views(con, sf_dir: str) -> None:
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")


def canon(rows, colnames):
    """Sort columns by name, then rows; normalize NaN for comparability."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def fix(v):
        if isinstance(v, float) and math.isnan(v):
            return "NaN"
        return v

    out = [tuple(fix(r[i]) for i in order) for r in rows]
    return sorted(colnames), sorted(out, key=repr)


def run_pair(spark, con, q, sf_dir: str):
    sdf = q.build(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    register_duck_views(con, sf_dir)
    res = con.execute(q.oracle)
    drows = [tuple(r) for r in res.fetchall()]
    dcols = [d[0] for d in res.description]
    return canon(srows, scols), canon(drows, dcols)


def diff_report(name, s, d, max_lines: int = 8) -> str:
    scols, srows = s
    dcols, drows = d
    lines = [f"query {name}: spark {len(srows)} rows, duck {len(drows)} rows"]
    if scols != dcols:
        lines.append(f"  COLUMNS spark={scols} duck={dcols}")
    sset, dset = set(map(repr, srows)), set(map(repr, drows))
    only_s = [r for r in srows if repr(r) not in dset][:max_lines]
    only_d = [r for r in drows if repr(r) not in sset][:max_lines]
    for r in only_s:
        lines.append(f"  spark-only: {r}")
    for r in only_d:
        lines.append(f"  duck-only : {r}")
    return "\n".join(lines)
