"""Set operations (SURVEY.md §2.7): union / except / intersect over
per-source key sets — the cross-source consolidation primitives (two
connectors writing one collection, bitcoinabuse/main.go:78 vs
walletexplorer/main.go:73).

All three compile to a single shuffle on the full row as key
(HashAggregate for distinct-union; left-anti/semi joins for
except/intersect under AQE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from labelmain_spark.sources.readers import load_table


def _sources(ev: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The two 'source' key sets. r10 (r9 verdict item 3): the old
    A=click / B=view split was DEGENERATE on the fixtures — every user
    has both event types, so except returned 0 rows and union hashed
    identically to intersect; the oracle could not catch an `except`
    that always returns empty or an `intersect` implemented as union.
    The modulus predicates force a PROPER partial overlap in both
    directions (sf0.01: |A|=75, |B|=50, A\\B=50, A∩B=25, A∪B=100 — all
    three results pairwise distinct and the union strictly larger than
    either input, so each operator's hash discriminates it from the
    other two and from an identity pass-through)."""
    a = ev.filter((F.col("event_type") == "click") & (F.col("user_id") % 2 == 0)).select("user_id")
    b = ev.filter((F.col("event_type") == "view") & (F.col("user_id") % 3 == 0)).select("user_id")
    return a, b


def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users seen by either of two 'sources' (A ∪ B)."""
    a, b = _sources(load_table(spark, sf_dir, "events"))
    return a.union(b).distinct()


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users in source A but not in source B (A \\ B)."""
    a, b = _sources(load_table(spark, sf_dir, "events"))
    return a.subtract(b)  # EXCEPT DISTINCT (exceptAll would keep bag counts)


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users present in both sources (A ∩ B)."""
    a, b = _sources(load_table(spark, sf_dir, "events"))
    return a.intersect(b)


def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three set semantics in one tagged result — one driver row
    covers the whole §2.7 family (union / except / intersect share the
    same two inputs, so Catalyst reuses the scans; each branch is still
    its own single shuffle)."""
    a, b = _sources(load_table(spark, sf_dir, "events"))
    return (
        a.union(b).distinct().withColumn("op", F.lit("union"))
        .unionByName(a.subtract(b).withColumn("op", F.lit("except")))
        .unionByName(a.intersect(b).withColumn("op", F.lit("intersect")))
    )


QUERIES = {
    "set_ops": set_ops,
    "set_union": set_union,
    "set_except": set_except,
    "set_intersect": set_intersect,
}

ORACLE = {
    "set_ops": """
        SELECT user_id, 'union' AS op FROM (
            SELECT user_id FROM events WHERE event_type = 'click' AND user_id % 2 = 0
            UNION
            SELECT user_id FROM events WHERE event_type = 'view' AND user_id % 3 = 0)
        UNION ALL
        SELECT user_id, 'except' AS op FROM (
            SELECT user_id FROM events WHERE event_type = 'click' AND user_id % 2 = 0
            EXCEPT
            SELECT user_id FROM events WHERE event_type = 'view' AND user_id % 3 = 0)
        UNION ALL
        SELECT user_id, 'intersect' AS op FROM (
            SELECT user_id FROM events WHERE event_type = 'click' AND user_id % 2 = 0
            INTERSECT
            SELECT user_id FROM events WHERE event_type = 'view' AND user_id % 3 = 0)
    """,
    "set_union": """
        SELECT user_id FROM events WHERE event_type = 'click' AND user_id % 2 = 0
        UNION
        SELECT user_id FROM events WHERE event_type = 'view' AND user_id % 3 = 0
    """,
    "set_except": """
        SELECT user_id FROM events WHERE event_type = 'click' AND user_id % 2 = 0
        EXCEPT
        SELECT user_id FROM events WHERE event_type = 'view' AND user_id % 3 = 0
    """,
    "set_intersect": """
        SELECT user_id FROM events WHERE event_type = 'click' AND user_id % 2 = 0
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'view' AND user_id % 3 = 0
    """,
}
