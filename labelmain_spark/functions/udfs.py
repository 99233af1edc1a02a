"""Pandas-UDF surface (SURVEY.md §2.10).

The reference's procedural layer is its HTML/XPath parsing
(bitcoinabuse/main.go:272-289, walletexplorer/main.go:178-191) — code
that genuinely can't be a column expression. The Spark-side contract
for that class of logic:

- scalar `pandas_udf` — vectorized per-row transforms (Arrow batches,
  no per-row serde).
- `applyInPandas` — grouped-map: whole group in, whole frame out
  (custom UDAF surface).
- `mapInPandas` — partition-batch iterator: one input row → many output
  rows (the page → report-rows parser shape); see multimodal/ for the
  binary-decode variant.

The demonstration UDFs here compute deterministic arithmetic so DuckDB
can mirror them exactly — proving the plumbing without giving up the
oracle check. Anything expressible as built-ins should NOT be a UDF in
production code; these exist to pin the UDF execution path.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from labelmain_spark.sources.readers import load_table


def _est_tokens_fn(n_chars: pd.Series, doc_id: pd.Series) -> pd.Series:
    """ceil(chars/4) + small deterministic per-doc jitter — stands in
    for a real tokenizer-length estimator."""
    return (n_chars.add(3).floordiv(4)).add(doc_id.mod(7)).astype("int64")


def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Pandas-UDF path: vectorized token-count estimate.

    The udf is constructed lazily (pandas_udf parses its DDL return
    type against the active session, so module import must stay
    session-free).
    """
    est_tokens = F.pandas_udf(_est_tokens_fn, "bigint")
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", est_tokens(F.col("n_chars"), F.col("doc_id")).alias("est_tokens")
    )


def _sr4(x: float) -> float:
    """Python twin of parity.stable_round(x, 4): floor(x*1e4+0.5)/1e4 —
    Python's round() is half-to-even, DuckDB's ROUND half-away-from-zero;
    the floor form is the only variant all three agree on."""
    return math.floor(x * 1e4 + 0.5) / 1e4


def _group_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    vals = pdf["value"]
    return pd.DataFrame(
        {
            "event_type": [pdf["event_type"].iloc[0]],
            "n": [len(pdf)],
            "median_value": [_sr4(float(vals.median()))],
            "iqr": [_sr4(float(vals.quantile(0.75, interpolation="linear")
                               - vals.quantile(0.25, interpolation="linear")))],
        }
    )


def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDAF surface: per-type median + IQR via
    applyInPandas. Linear-interpolation quantiles match DuckDB's
    continuous `quantile_cont` exactly.

    Scale note: applyInPandas materializes each group in one Python
    worker — fine for bounded per-key groups (event types, addresses);
    for unbounded groups pre-aggregate or use approx quantiles
    (`percentile_approx`) instead.

    Column pruning does NOT reach through a grouped-map UDF (Catalyst
    can't see which pdf columns the Python function touches), so the
    projection to the two used columns is explicit — without it the
    whole events row (incl. the wide props JSON) crosses the Arrow
    boundary (measured 10.2 s vs 3.6 s at sf0.1).

    The repartition spreads the groupBy shuffle WRITE across all cores:
    the fixture is one parquet file → one scan task, which would
    otherwise hash-partition every row serially (2.1 s vs 0.8 s at
    sf0.1). On a cluster with many input splits it is a no-op cost.
    """
    n = spark.sparkContext.defaultParallelism
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    return ev.repartition(n).groupBy("event_type").applyInPandas(
        _group_stats,
        schema="event_type string, n bigint, median_value double, iqr double",
    )


def _wmean_fn(v: pd.Series, w: pd.Series) -> float:
    """Weighted mean computed in exact integer space so the result is
    order-independent (pandas float sums depend on shuffle arrival
    order): quantize values to micros with floor(x*1e6+0.5) — the same
    IEEE-only rounding as parity.stable_round — sum in int64 (exact),
    then do the identical two float divisions DuckDB does."""
    import numpy as np

    vi = np.floor(v.to_numpy(dtype="float64") * 1e6 + 0.5).astype("int64")
    wi = w.to_numpy(dtype="int64")
    return float(int((vi * wi).sum())) / float(int(wi.sum())) / 1e6


def udaf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas_udf (SURVEY §2.10): Series→scalar custom
    aggregate — the third UDF shape next to scalar (`udf_scalar`) and
    grouped-map (`udaf_grouped`). A grouped-agg udf gets the whole
    group's columns as Series and returns one value; unlike grouped-map
    it composes inside ``.agg()`` with other aggregates and supports
    partial pipelining of the surrounding plan.

    Same scale caveat as grouped-map: the group materializes in one
    Python worker, so it fits bounded-cardinality keys (5 event types);
    the unbounded-key twin stays `percentile_approx`-style JVM sketches.
    """
    wmean = F.pandas_udf(_wmean_fn, "double")
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            "value",
            (F.col("user_id") % 7 + 1).cast("bigint").alias("w"),
        )
    )
    # NB: Spark disallows mixing a group-agg pandas UDF with JVM
    # aggregates in one .agg() (INVALID_PANDAS_UDF_PLACEMENT), so the
    # result is the UDF column alone.
    return ev.groupBy("event_type").agg(
        wmean(F.col("value"), F.col("w")).alias("wmean_value")
    )


# Decomposed-unicode suffixes the fixture's ASCII corpus lacks, keyed
# by doc_id so NFC normalization has real work on a deterministic
# subset: each literal is the DECOMPOSED form (e+COMBINING ACUTE,
# A+COMBINING RING, o+COMBINING DIAERESIS), shared verbatim by the
# Spark expression and the DuckDB twin; NFC composes them.
_NFC_SUFFIX = (
    "CASE WHEN doc_id % 3 = 0 THEN ' cafe\u0301' "
    "WHEN doc_id % 4 = 0 THEN ' A\u030angstro\u0308m' ELSE '' END"
)


def _nfc_fn(s: pd.Series) -> pd.Series:
    import unicodedata

    return s.map(lambda x: None if x is None else unicodedata.normalize("NFC", x))


def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization — the corpus-cleaning pass every
    multilingual pipeline runs before tokenization (decomposed
    combining sequences and precomposed code points must hash and
    tokenize identically). Spark has no built-in normalizer, so this
    is the one genuinely-Python text stage: an Arrow-batched scalar
    pandas_udf over ``unicodedata.normalize`` — a narrow map, zero
    shuffles, no per-row serde — verified against DuckDB's native
    ``nfc_normalize`` as an independent NFC implementation (ICU vs
    Python's unicodedata). Output keeps lengths before/after, a
    changed flag, and the md5 of the normalized text (computed
    JVM-side on UTF-8 bytes in both engines)."""
    nfc = F.pandas_udf(_nfc_fn, "string")
    docs = load_table(spark, sf_dir, "documents")
    aug = docs.selectExpr("doc_id", f"text || {_NFC_SUFFIX} AS raw")
    out = aug.select("doc_id", "raw", nfc(F.col("raw")).alias("norm"))
    return out.select(
        "doc_id",
        F.length("raw").cast("int").alias("len_raw"),
        F.length("norm").cast("int").alias("len_norm"),
        (F.col("norm") != F.col("raw")).alias("changed"),
        F.md5("norm").alias("norm_md5"),
    )


QUERIES = {
    "udf_scalar": udf_scalar,
    "udaf_grouped": udaf_grouped,
    "udaf_grouped_agg": udaf_grouped_agg,
    "text_normalize": text_normalize,
}

ORACLE = {
    # DuckDB's native nfc_normalize (ICU) as the independent NFC
    # implementation vs the UDF's unicodedata; the decomposed-literal
    # injection is the same _NFC_SUFFIX text verbatim. length() counts
    # code points in both engines (verified on combining sequences).
    "text_normalize": f"""
        WITH aug AS (
            SELECT doc_id, text || {_NFC_SUFFIX} AS raw FROM documents
        )
        SELECT doc_id,
               CAST(length(raw) AS INTEGER) AS len_raw,
               CAST(length(nfc_normalize(raw)) AS INTEGER) AS len_norm,
               nfc_normalize(raw) <> raw AS changed,
               md5(nfc_normalize(raw)) AS norm_md5
        FROM aug
    """,
    "udf_scalar": """
        SELECT doc_id,
               CAST((n_chars + 3) // 4 + doc_id % 7 AS BIGINT) AS est_tokens
        FROM documents
    """,
    "udaf_grouped": """
        SELECT event_type, COUNT(*) AS n,
               (FLOOR(CAST(median(value) AS DOUBLE) * 10000.0 + 0.5) / 10000.0)
                   AS median_value,
               (FLOOR(CAST(quantile_cont(value, 0.75) - quantile_cont(value, 0.25)
                     AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS iqr
        FROM events GROUP BY event_type
    """,
    "udaf_grouped_agg": """
        SELECT event_type,
               (CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)
                         * (user_id % 7 + 1)) AS DOUBLE)
                / CAST(SUM(user_id % 7 + 1) AS DOUBLE)) / 1000000.0
                   AS wmean_value
        FROM events WHERE value IS NOT NULL
        GROUP BY event_type
    """,
}
