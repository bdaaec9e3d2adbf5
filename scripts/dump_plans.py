"""Dump .explain("formatted") for headline (or named) catalog queries.

Usage: python scripts/dump_plans.py <suffix> [query ...]

Writes plans/$SPARK_GRAFT_PLAN_DIR/<query>_<suffix>.txt (default
plans/r15) for each query. Plans only — nothing is executed
(iterative operators that materialize during build() still run their
eager prefix; that is the plan the bench times, so it is the honest
artifact).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from etsd_time_series_database_spark import get_spark  # noqa: E402
from etsd_time_series_database_spark.plans import catalog  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    c = catalog()
    if not names:
        names = sorted(n for n, q in c.items() if q.headline)
    spark = get_spark("etsd_plan_dump")
    out_dir = REPO / "plans" / os.environ.get("SPARK_GRAFT_PLAN_DIR", "r15")
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = c[name].build(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"{name}: {len(plan)} chars -> {name}_{suffix}.txt")


if __name__ == "__main__":
    main()
