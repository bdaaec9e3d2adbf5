"""Differential tests: every catalog query with an oracle must match
DuckDB exactly at sf0.001 (sf0.01 via SPARK_GRAFT_ORACLE_SF)."""

from __future__ import annotations

import pytest

from etsd_time_series_database_spark.plans import catalog
from tests.conftest import SLOW_CATALOG, SF_ORACLE
from tests.oracle import diff_report, run_pair

_WITH_ORACLE = sorted(n for n, q in catalog().items() if q.oracle is not None)


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.slow) if n in SLOW_CATALOG else n
        for n in _WITH_ORACLE
    ],
)
def test_query_matches_oracle(spark, duck, name):
    q = catalog()[name]
    s, d = run_pair(spark, duck, q, SF_ORACLE)
    assert s[0] == d[0], diff_report(name, s, d)
    assert len(s[1]) == len(d[1]), diff_report(name, s, d)
    assert s[1] == d[1], diff_report(name, s, d)


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns
