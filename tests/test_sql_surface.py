"""SQL-surface parity: the engine is DataFrame-first, but every table
registers as a temp view and the same queries must be expressible via
``spark.sql`` — users of the reference's output collections get a full
SQL interface, not just the Python API."""

from __future__ import annotations

from pyspark.sql import functions as F

from labelmain_spark.operators.analytics import pricing_summary
from labelmain_spark.operators.joins import join_inner
from labelmain_spark.sources.readers import load_table

TABLES = ["lineitem", "orders", "customer"]


def _register(spark, sf_dir):
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def test_sql_matches_dataframe_pricing_summary(spark, sf_dir):
    _register(spark, sf_dir)
    got = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """
    )
    want = pricing_summary(spark, sf_dir).select(
        "l_returnflag", "l_linestatus", "sum_qty", "count_order"
    )
    assert sorted(map(str, got.collect())) == sorted(map(str, want.collect()))


def test_sql_matches_dataframe_join(spark, sf_dir):
    _register(spark, sf_dir)
    got = spark.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_spend
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        """
    )
    assert sorted(map(str, got.collect())) == sorted(
        map(str, join_inner(spark, sf_dir).collect())
    )


def test_coverage_doc_matches_registry():
    """COVERAGE.md's header is the ONE place the key count is stated;
    it must track the registry (r2 shipped three different numbers
    across docs)."""
    import re
    from pathlib import Path

    from labelmain_spark import registry

    text = (Path(__file__).resolve().parent.parent / "COVERAGE.md").read_text()
    m = re.search(
        r"(\d+) query keys registered.*?(\d+) with full DuckDB oracle.*?(\d+) rows-only",
        text,
        re.S,
    )
    assert m, "COVERAGE.md header sentence not found"
    total, with_oracle, rows_only = map(int, m.groups())
    q, o = registry.queries(), registry.oracle_sql()
    assert total == len(q), f"COVERAGE.md says {total} keys, registry has {len(q)}"
    assert with_oracle == len(o), f"COVERAGE.md says {with_oracle} oracles, registry has {len(o)}"
    assert rows_only == len(q) - len(o)
    assert set(o) <= set(q)


def test_agg_fast_mode(spark, sf_dir):
    """'fast' agg mode (IEEE double partials) must agree with the
    default exact mode to float tolerance, and the switch must be
    reversible — exact stays the default the oracle gate relies on."""
    from labelmain_spark.operators import aggregates, parity

    # count_sum still rides dsum/davg (rollup_agg moved to the
    # mode-independent micro-unit form late-r11, which would make this
    # test pass vacuously — the key must be one the switch reaches).
    def rowmap():
        return {
            (r.event_type, r.n): (r.total_value, r.avg_value)
            for r in aggregates.count_sum(spark, sf_dir).collect()
        }

    assert parity.agg_mode() == "exact"
    exact = rowmap()
    try:
        parity.set_agg_mode("fast")
        fast = rowmap()
    finally:
        parity.set_agg_mode("exact")
    assert fast.keys() == exact.keys()
    for k, vals in exact.items():
        for v, fv in zip(vals, fast[k]):
            assert abs(fv - v) <= 1e-6 * max(1.0, abs(v)), (k, fv, v)
    assert parity.agg_mode() == "exact"

    import pytest

    with pytest.raises(ValueError):
        parity.set_agg_mode("approximate")


def test_micro_units_raises_on_non_finite(spark):
    """r11 advice: micro_units must fail LOUDLY on NaN/Inf like the
    DuckDB twin's BIGINT cast does, instead of Spark's silent
    null-cast row skip — a NaN admitted past the validate_constraints
    ingest gate must not skew six hot keys' sums silently."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.sql import functions as F

    from labelmain_spark.operators.parity import micro_units

    ok = spark.createDataFrame([(1.5,), (2.25,)], "x double")
    assert ok.select(F.sum(micro_units(F.col("x"))).alias("m")).collect()[0].m == 3_750_000

    for bad_val in (float("nan"), float("inf"), float("-inf")):
        bad = spark.createDataFrame([(1.0,), (bad_val,)], "x double")
        with pytest.raises(Exception) as exc:
            bad.select(F.sum(micro_units(F.col("x"))).alias("m")).collect()
        assert "micro_units: non-finite input" in str(exc.value)
