"""Projection / extraction operators (SURVEY.md §2.2, §2.8).

The reference's extraction layer is regex + XPath over scraped pages:

- P1 regex extract-all of addresses, `href="/reports/(\\w{8,}?)">`
  (bitcoinabuse/main.go:100-109): `regex_extract` — extract-all +
  explode + frequency count, all JVM-side (`regexp_extract_all` is a
  codegen'd expression; no Python in the hot path).
- P2 regex extract of page numbers + int cast + max
  (bitcoinabuse/main.go:186-206): `regex_max_page`.
- P6 lower/trim/strip-trailing-colon normalization
  (walletexplorer/main.go:229-230,239): `string_norm`.
- URL building via fmt.Sprintf (bitcoinabuse/main.go:89,260):
  `string_concat`.
- GraphQL JSON traversal result["data"]["reports"]["edges"]
  (chainabuse/main.py:43-46,78-82): `json_extract` — ``get_json_object``
  path access; at scale prefer ``from_json`` with an explicit schema
  once, not repeated path probes.
- P7 positional 3-column re-rowing, report[i%3]
  (bitcoinabuse/main.go:281-289): `reshape_3col` — posexplode →
  group by pos div 3 → pivot pos % 3. This is the flat-cell-list →
  (date,type,desc) rows operator, fully shuffle-parallel by (doc, grp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from labelmain_spark.operators.parity import davg, sql_davg, stable_round
from labelmain_spark.sources.readers import load_table


def regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract all long tokens from every document and count global
    frequencies (address-extraction analog of bitcoinabuse P1)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.col("text"), F.lit(r"(\w{6,})"), 1)
            ).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def regex_max_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max numeric capture per group (getTodayMaxPage analog: extract
    page=N ints, cast, take max)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.explode(
                F.regexp_extract_all(F.col("props"), F.lit(r"([0-9]+)"), 1)
            ).alias("pg"),
        )
        .groupBy("event_type")
        .agg(F.max(F.col("pg").cast("int")).alias("max_page"))
    )


def string_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lower/trim/strip-trailing-colon/substring normalization chain."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.lower(F.trim(F.col("p_name"))).alias("name_norm"),
        F.regexp_replace(F.lower(F.col("p_type")), ":$", "").alias("type_norm"),
        F.substring(F.col("p_name"), 1, 5).alias("name_prefix"),
    )


def string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL building (fmt.Sprintf analog): concat + cast + format."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.concat(
            F.lit("https://example.com/reports/"),
            F.lower(F.col("c_mktsegment")),
            F.lit("?page="),
            (F.col("c_custkey") % 10).cast("string"),
        ).alias("url"),
    )


def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction + typed aggregation over the extracted field
    (GraphQL edges traversal analog)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            stable_round(davg(F.col("k").cast("double")), 4).alias("avg_k"),
        )
    )


def reshape_3col(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat token list → stride-3 rows (td-cell list → (date,type,desc)
    reshape, bitcoinabuse/main.go:281-289)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok")
    )
    grp = (F.col("pos") / 3).cast("long")
    m = F.col("pos") % 3
    return (
        toks.groupBy("doc_id", grp.alias("grp"))
        .agg(
            F.max(F.when(m == 0, F.col("tok"))).alias("c0"),
            F.max(F.when(m == 1, F.col("tok"))).alias("c1"),
            F.max(F.when(m == 2, F.col("tok"))).alias("c2"),
        )
    )


QUERIES = {
    "regex_extract": regex_extract,
    "regex_max_page": regex_max_page,
    "string_norm": string_norm,
    "string_concat": string_concat,
    "json_extract": json_extract,
    "reshape_3col": reshape_3col,
}

ORACLE = {
    "regex_extract": r"""
        SELECT token, COUNT(*) AS cnt FROM (
            SELECT unnest(regexp_extract_all(text, '(\w{6,})', 1)) AS token
            FROM documents
        ) GROUP BY token
    """,
    "regex_max_page": """
        SELECT event_type, MAX(CAST(pg AS INTEGER)) AS max_page FROM (
            SELECT event_type,
                   unnest(regexp_extract_all(props, '([0-9]+)', 1)) AS pg
            FROM events
        ) GROUP BY event_type
    """,
    "string_norm": """
        SELECT p_partkey,
               lower(trim(p_name)) AS name_norm,
               regexp_replace(lower(p_type), ':$', '') AS type_norm,
               substring(p_name, 1, 5) AS name_prefix
        FROM part
    """,
    "string_concat": """
        SELECT c_custkey,
               'https://example.com/reports/' || lower(c_mktsegment)
                   || '?page=' || CAST(c_custkey % 10 AS VARCHAR) AS url
        FROM customer
    """,
    "json_extract": f"""
        SELECT event_type, CAST(SUM(k) AS BIGINT) AS sum_k, MAX(k) AS max_k,
               (FLOOR({sql_davg('CAST(k AS DOUBLE)')} * 10000.0 + 0.5) / 10000.0) AS avg_k
        FROM (
            SELECT event_type,
                   CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
            FROM events
        ) GROUP BY event_type
    """,
    "reshape_3col": """
        SELECT doc_id, (idx - 1) // 3 AS grp,
               MAX(CASE WHEN (idx - 1) % 3 = 0 THEN tok END) AS c0,
               MAX(CASE WHEN (idx - 1) % 3 = 1 THEN tok END) AS c1,
               MAX(CASE WHEN (idx - 1) % 3 = 2 THEN tok END) AS c2
        FROM (
            SELECT doc_id,
                   unnest(string_split(text, ' ')) AS tok,
                   generate_subscripts(string_split(text, ' '), 1) AS idx
            FROM documents
        ) GROUP BY doc_id, (idx - 1) // 3
    """,
}
