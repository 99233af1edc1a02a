"""The local mirror of the driver's correctness gate: every query key
with an oracle twin must match DuckDB on row count, columns, and values.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_utils import assert_parity

_QUERIES = entrymod.queries()
_ORACLE = entrymod.oracle_sql()


def test_registry_shape():
    assert _QUERIES, "no queries registered"
    missing = _ORACLE.keys() - _QUERIES.keys()
    assert not missing, f"oracle without query: {missing}"


@pytest.mark.parametrize("key", sorted(_ORACLE))
def test_parity(key, spark, duck, sf_dir):
    sdf = _QUERIES[key](spark, sf_dir).toPandas()
    ddf = duck.execute(_ORACLE[key]).fetchdf()
    assert_parity(sdf, ddf, key)


@pytest.mark.parametrize("key", sorted(_QUERIES.keys() - _ORACLE.keys()))
def test_rows_only(key, spark, sf_dir):
    df = _QUERIES[key](spark, sf_dir)
    assert df.count() >= 0
    assert df.schema.fieldNames()


def test_entry(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
