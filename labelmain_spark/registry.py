"""Central registry merging every operator module's queries + oracles.

``__spark_entry__.py`` (the driver contract) delegates here. Each
operator module exposes:

- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
- ``ORACLE:  dict[str, str]`` — DuckDB ANSI-SQL twins. Keys present in
  QUERIES but absent from ORACLE get the driver's weaker rows-only check
  (reserved for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable
from importlib import import_module

from pyspark.sql import DataFrame, SparkSession

_MODULES = [
    "labelmain_spark.operators.scans",
    "labelmain_spark.operators.filters",
    "labelmain_spark.operators.aggregates",
    "labelmain_spark.operators.projections",
    "labelmain_spark.operators.joins",
    "labelmain_spark.operators.windows",
    "labelmain_spark.operators.setops",
    "labelmain_spark.operators.merge",
    "labelmain_spark.operators.analytics",
    "labelmain_spark.operators.nested",
    "labelmain_spark.operators.advanced",
    "labelmain_spark.labelstore.store",
    "labelmain_spark.functions.text",
    "labelmain_spark.functions.simjoin",
    "labelmain_spark.functions.dedup",
    "labelmain_spark.functions.vectors",
    "labelmain_spark.functions.udfs",
    "labelmain_spark.multimodal.columns",
]


def _collect() -> tuple[dict[str, Callable[[SparkSession, str], DataFrame]], dict[str, str]]:
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracle: dict[str, str] = {}
    for modname in _MODULES:
        mod = import_module(modname)
        q = getattr(mod, "QUERIES", {})
        o = getattr(mod, "ORACLE", {})
        dup = queries.keys() & q.keys()
        if dup:
            raise ValueError(f"duplicate query keys {dup} in {modname}")
        unknown = o.keys() - q.keys()
        if unknown:
            raise ValueError(f"oracle keys {unknown} without queries in {modname}")
        queries.update(q)
        oracle.update(o)
    return queries, oracle


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _collect()[0]


def oracle_sql() -> dict[str, str]:
    return _collect()[1]
