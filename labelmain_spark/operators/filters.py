"""Filter / predicate operators (SURVEY.md §2.2).

- P8 non-empty filter (walletexplorer/main.go:86-88,239-241 skips the
  empty wallet names its pre-sized slice introduces): `filter_nonempty`
  — token streams legitimately contain empties after splitting; count
  only the real tokens.
- P9 substring-containment predicate (walletexplorer/main.go:162-176
  retry-if-body-contains-"limit"): `filter_contains` as the quarantine
  predicate over documents.
- P10 null/missing-field guards (chainabuse/main.py:42-46,63-75):
  `filter_null` — NULLIF + IS NOT NULL over a JSON-extracted field.
- T3 high-watermark incremental read (chainabuse/main.py:107-109):
  `incremental_filter`. At 100 TB the watermark predicate lands on the
  ingest-date partition column, so Catalyst prunes whole partitions —
  only the new slice is ever read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from labelmain_spark.sources.readers import load_table


def filter_nonempty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split documents into tokens, drop empty/whitespace tokens, count
    real tokens per doc (walletexplorer empty-name skip analog)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .filter(F.length(F.trim(F.col("tok"))) > 0)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"))
    )


def filter_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarantine predicate: keep documents whose text does NOT contain
    the rate-limit marker token (body-contains-"limit" retry analog)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(~F.col("text").contains("limit")).select(
        "doc_id", "lang", "source", "n_chars"
    )


def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-field guard: extract props.k, NULL it out when 0 (the
    'data is None' guard shape), keep only present values."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.select("event_id", "user_id", F.nullif(k, F.lit(0)).alias("k_val"))
        .filter(F.col("k_val").isNotNull())
    )


def incremental_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-watermark read: only events after the stored cursor."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        F.col("ts") > F.lit("2024-01-20 00:00:00").cast("timestamp")
    ).select("event_id", "ts", "user_id", "event_type", "value")


QUERIES = {
    "filter_nonempty": filter_nonempty,
    "filter_contains": filter_contains,
    "filter_null": filter_null,
    "incremental_filter": incremental_filter,
}

ORACLE = {
    "filter_nonempty": """
        SELECT doc_id, COUNT(*) AS n_tokens
        FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        )
        WHERE length(trim(tok)) > 0
        GROUP BY doc_id
    """,
    "filter_contains": """
        SELECT doc_id, lang, source, n_chars
        FROM documents WHERE NOT contains(text, 'limit')
    """,
    "filter_null": """
        SELECT event_id, user_id, k_val FROM (
            SELECT event_id, user_id,
                   NULLIF(CAST(json_extract_string(props, '$.k') AS INTEGER), 0) AS k_val
            FROM events
        ) WHERE k_val IS NOT NULL
    """,
    "incremental_filter": """
        SELECT event_id, ts, user_id, event_type, value
        FROM events WHERE ts > TIMESTAMP '2024-01-20 00:00:00'
    """,
}
