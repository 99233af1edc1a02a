"""Exact duplicate-substring detection (SURVEY §2.11 north-star
adjunct) — the Lee et al. 2022 "Deduplicating Training Data Makes
Language Models Better" surface: every position opening a
``DUP_SPAN_L``-token substring that occurs ≥ 2 times anywhere in the
corpus (across OR within documents). Downstream, those spans are cut
from all-but-one occurrence; here the operator emits the span map.

Algorithm (hash prefix-doubling — the suffix-automaton-free
distributed form):

    h_1(i)   = md5(token_i)
    h_2k(i)  = md5(h_k(i) || h_k(i+k))        # k = 1,2,4,8,16
    h_L(i) identifies position i's L-token prefix exactly (md5-chain
    collisions at 2^-128 are not a real failure mode).

Spans never cross documents, so h_k(i+k) is ``lead(h, k)`` over a
per-document window — the WHOLE log2(L)-round chain compiles to ONE
shuffle (partition by doc_id) followed by log2(L) window passes over
the same sort order (Catalyst stacks same-spec Window operators with
no re-exchange; a ``lead`` at the doc tail is null, concat propagates
it, and the null rows ARE the positions with no full L-token span).
Rows carry one 32-char digest — never text — vs the L× payload blowup
of materializing every L-token window string (the naive explode
carries ~L tokens per position: 32× the corpus through its shuffle).
No self-joins, no iteration state, no persists.

The DuckDB oracle computes the SAME output by the naive algorithm
(explode every window, md5 the joined string, group) — two independent
algorithms agreeing on the full value hash is the strongest oracle
form in this repo. To make outputs comparable, the Spark side
back-fills the plain-text gram md5 for each duplicated group from ONE
representative position (the group's min (doc_id, pos)) — a join
against the token arrays restricted to the (small) duplicated-group
set, then a broadcast-size map back onto members.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from labelmain_spark.sources.readers import load_table

DUP_SPAN_L = 32  # tokens per span; power of two → clean doubling


def _positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pos, tok) for every token; 0-based pos."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    )
    return docs.select(
        "doc_id", F.posexplode("toks").alias("pos", "tok")
    )


def duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pos, gram_md5, n_dups) for every position whose
    DUP_SPAN_L-token substring occurs ≥ 2 times in the corpus."""
    from pyspark.sql import Window as W

    L = DUP_SPAN_L
    w = W.partitionBy("doc_id").orderBy("pos")
    df = _positions(spark, sf_dir).select(
        "doc_id", "pos", F.md5("tok").alias("h")
    )
    k = 1
    while k < L:
        # null lead at the doc tail → null h: the position has no full
        # L-token span and drops at the filter below.
        df = df.withColumn("h", F.md5(F.concat(F.col("h"), F.lead("h", k).over(w))))
        k *= 2
    spans = df.filter(F.col("h").isNotNull()).persist(StorageLevel.MEMORY_AND_DISK)

    groups = (
        spans.groupBy("h")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dups"),
            F.min(F.struct("doc_id", "pos")).alias("rep"),
        )
        .filter(F.col("n_dups") >= 2)
    )
    # Back-fill the plain-gram md5 from one representative per group:
    # the rep set is small (distinct duplicated spans), so the join
    # against the token arrays touches few docs and AQE broadcasts the
    # rep side; members then take the digest via the group key.
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    )
    reps = (
        groups.select("h", "n_dups", F.col("rep.doc_id").alias("doc_id"), F.col("rep.pos").alias("pos"))
        .join(docs, "doc_id")
        .select(
            "h",
            "n_dups",
            F.md5(
                F.array_join(F.slice("toks", F.col("pos") + 1, L), " ")
            ).alias("gram_md5"),
        )
    )
    return (
        spans.join(reps, "h")
        .select("doc_id", "pos", "gram_md5", "n_dups")
    )


QUERIES = {"duplicate_spans": duplicate_spans}

ORACLE = {
    # The naive algorithm, deliberately: explode every L-token window,
    # hash the joined string, keep groups of ≥2 — an independent path
    # to the identical rows.
    "duplicate_spans": f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ), g AS (
            SELECT doc_id, u.pos AS pos, u.g AS gram_md5 FROM (
                SELECT doc_id,
                       unnest(list_transform(
                           range(greatest(len(toks) - {DUP_SPAN_L - 1}, 0)),
                           i -> {{'pos': i,
                                 'g': md5(array_to_string(list_slice(
                                     toks, i + 1, i + {DUP_SPAN_L}), ' '))}}
                       )) AS u
                FROM t
            )
        ), dup AS (
            SELECT gram_md5, CAST(COUNT(*) AS BIGINT) AS n_dups
            FROM g GROUP BY gram_md5 HAVING COUNT(*) >= 2
        )
        SELECT g.doc_id, g.pos, g.gram_md5, dup.n_dups
        FROM g JOIN dup USING (gram_md5)
    """,
}
