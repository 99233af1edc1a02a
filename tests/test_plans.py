"""Physical-plan assertions: correctness tests prove the rows; these
prove the PLAN is the scalable one (pushdown, pruning, broadcast,
top-k heap, JVM-only hot paths)."""

from __future__ import annotations

import pytest

from labelmain_spark.operators import aggregates, joins, scans
from labelmain_spark.functions import text
from labelmain_spark.plans import checks


def test_scan_project_pushdown_and_pruning(spark, sf_dir):
    df = scans.scan_project(spark, sf_dir)
    checks.assert_pushed_filter(df, "l_shipdate")
    checks.assert_read_schema(
        df, {"l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate"}
    )


def test_point_lookup_pushdown(spark, sf_dir):
    df = scans.point_lookup(spark, sf_dir)
    checks.assert_pushed_filter(df, "l_orderkey")


def test_join_inner_is_broadcast(spark, sf_dir):
    checks.assert_broadcast_join(joins.join_inner(spark, sf_dir))


def test_topk_is_take_ordered(spark, sf_dir):
    checks.assert_take_ordered(scans.topk(spark, sf_dir))


def test_text_pipeline_has_no_python(spark, sf_dir):
    """Text analysis must stay JVM-side — no Python eval nodes."""
    checks.assert_no_python_eval(text.text_quality(spark, sf_dir))
    checks.assert_no_python_eval(text.lang_id(spark, sf_dir))


def test_aggregates_prune_columns(spark, sf_dir):
    df = aggregates.group_count(spark, sf_dir)
    checks.assert_read_schema(df, {"o_orderpriority"})
