"""Shared fixtures: one SparkSession and one DuckDB connection per run.

SF_DIR defaults to sf0.001 for speed; override with
``SPARK_GRAFT_TEST_SF_DIR`` to run the same suite at sf0.01.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from labelmain_spark.session import build_session
from labelmain_spark.sources.readers import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="labelmain_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
