"""Hypothesis property tests for the generic round-4 algorithms:
exclusive_cumsum (any ordered keyed values, any level width) and the
z-order bit interleave (exact round-trip vs a Python model). These are
the two operators whose correctness is an ALGORITHM property, not a
fixture behavior — randomized inputs catch the off-by-one classes
(empty parts, gap keys, width boundaries) a fixed fixture never hits.

Example counts stay small: every example runs Spark jobs.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from labelmain_spark.functions.packing import exclusive_cumsum
from labelmain_spark.labelstore.zorder import zorder_key

_ROWS = st.lists(
    st.tuples(st.integers(0, 1_000_000), st.integers(0, 500)),
    min_size=1,
    max_size=50,
    unique_by=lambda t: t[0],
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_ROWS, width=st.sampled_from([2, 7, 1024]))
def test_cumsum_matches_serial_model(spark, rows, width):
    """Exclusive prefix sums equal the serial model for arbitrary key
    gaps, values, and level widths (width=2 forces deep recursion)."""
    df = spark.createDataFrame(rows, "k long, v long")
    got = dict(
        exclusive_cumsum(df, "k", "v", "off", width=width)
        .select("k", "off")
        .collect()
    )
    spark.catalog.clearCache()
    acc = 0
    for k, v in sorted(rows):
        assert got[k] == acc, f"key {k} (width {width}): {got[k]} != {acc}"
        acc += v


def _interleave(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, (1 << 16) - 1), st.integers(0, (1 << 16) - 1)),
        min_size=1,
        max_size=100,
    )
)
def test_zorder_key_matches_model(spark, pairs):
    df = spark.createDataFrame(pairs, "a long, b long")
    got = [
        r.z
        for r in df.select(zorder_key(F.col("a"), F.col("b")).alias("z")).collect()
    ]
    want = [_interleave(a, b) for a, b in pairs]
    assert got == want
