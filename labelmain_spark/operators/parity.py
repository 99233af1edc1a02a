"""Cross-engine determinism helpers.

Every query in the driver contract is compared to a DuckDB oracle by an
order-insensitive VALUE hash, so results must be bit-identical across
engines. Floating-point aggregation is the hazard: Spark sums partitions
in nondeterministic order, so ``SUM(double)`` can differ in final ulps
both run-to-run and vs DuckDB. The fix used throughout: aggregate in
DECIMAL (exact, order-independent addition), then cast back to double.

This also matters at 100 TB: a 1000-executor sum is combined in whatever
order tasks finish, so exactness-by-decimal is the only way to get a
reproducible aggregate at scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Enough integer digits for ~1e12 row sums of price-scale values.
DEC = "decimal(28,6)"


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent exact sum of a double column, returned as double.

    SQL twin: ``CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DEC)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Exact-sum average: exact decimal sum cast to double, divided by
    count — a single deterministic IEEE division, identical in DuckDB.

    SQL twin: ``CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) / COUNT(x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DEC)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def stable_round(col: Column, n: int) -> Column:
    """Cross-engine-deterministic rounding of a double.

    ``ROUND(double, n)`` is NOT portable at half-way boundaries: Spark
    rounds the shortest decimal representation Java derives for the
    double (BigDecimal.valueOf), DuckDB rounds the full binary
    expansion — for a mean whose true value sits at x.xxxxx5 they emit
    different 6th digits (hit in practice by embedding_centroid at
    sf0.1: 0.003214 vs 0.003213). This variant uses only IEEE ops —
    scale, add 0.5, floor, unscale — which every engine evaluates
    bit-identically. (Half-negative values round toward +inf rather
    than away from zero; consistency across engines is what matters
    here, not the tie convention.)

    SQL twin: ``FLOOR(x * 1e{n} + 0.5) / 1e{n}``.
    """
    s = float(10**n)
    return F.floor(col * F.lit(s) + F.lit(0.5)) / F.lit(s)


def sql_stable_round(expr: str, n: int) -> str:
    """DuckDB twin of :func:`stable_round`."""
    s = float(10**n)
    return f"(FLOOR(({expr}) * {s} + 0.5) / {s})"


def sql_dsum(expr: str) -> str:
    """DuckDB twin of :func:`dsum` for an arbitrary SQL expression."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB twin of :func:`davg`."""
    return f"(CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE) / COUNT({expr}))"
