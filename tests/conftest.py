from __future__ import annotations

import duckdb
import pytest

from data_lake_project_spark.session import get_spark
from data_lake_project_spark.tables import TABLES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: whole-surface sweeps (plan audit) — skip with -m 'not slow'",
    )
