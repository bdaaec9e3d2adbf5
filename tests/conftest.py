from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running (true streaming) tests")



# Catalog entries whose single-case runtime is a full maintenance or
# replay simulation (tens of seconds each at sf0.001): deselected from
# the default run (pytest.ini: -m "not slow") so the driver's verify
# gate completes in-window (round-15 verdict #3); run with
# `pytest -m "slow or not slow"` for the full sweep. Each remains
# covered every round by scripts/selfcheck.py at sf0.01.
SLOW_CATALOG = {
    "x86_ivf_rebalance",
    "x87_ivf_rebalance_retire",
    "s14_watch_cli_replay",
    "s16_late_data_replay",
    "s17_late_drop_accounting",
}

SF_SMOKE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    from etsd_time_series_database_spark import get_spark

    s = get_spark("etsd_spark_tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()
