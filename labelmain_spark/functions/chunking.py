"""Overlapping token-window chunking — the RAG-indexing / pretraining
context-window step (SURVEY §2.11 north-star adjunct; the reference
repo has no analogue — this extends the LLM-pipeline family the brief
mandates).

Every document is cut into windows of ``CHUNK_W`` whitespace tokens
with stride ``CHUNK_S`` (overlap = W − S), the standard
fixed-size-with-overlap chunker (LangChain/LlamaIndex token splitters,
retrieval corpora, long-doc pretraining). A document shorter than one
window yields exactly one chunk; the final window may be short; the
chunk set always covers every token.

Output per chunk: (doc_id, chunk_id, n_tokens, fingerprint) where
fingerprint = md5 of the reassembled chunk text — the compact
value-checkable witness of the chunk CONTENT (the driver compare
hashes every cell, so emitting the md5 instead of the text keeps the
result small while still pinning byte-identical chunk boundaries and
token content across engines).

Scale shape (100 TB): split + slice + explode are narrow maps — no
shuffle anywhere, no state, no per-row Python; the operator streams
through the scan and composes with any downstream plan (dedup on
fingerprint, embedding UDF per chunk, shard export). Chunk counts are
``1 + ceil(max(n−W, 0)/S)`` per doc — pure integer arithmetic, no
window functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from labelmain_spark.sources.readers import load_table

CHUNK_W = 64  # window length in tokens
CHUNK_S = 48  # stride (overlap = 16)


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, chunk_id, n_tokens, fingerprint) for every overlapping
    token window of every document."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.coalesce(F.col("text"), F.lit("")), " ").alias("t")
    )
    n_chunks = F.expr(
        f"1 + CAST((greatest(size(t) - {CHUNK_W}, 0) + {CHUNK_S} - 1) "
        f"DIV {CHUNK_S} AS INT)"
    )
    c = docs.select(
        "doc_id",
        "t",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("i"),
    ).select(
        "doc_id",
        F.col("i").cast("int").alias("chunk_id"),
        F.expr(f"slice(t, i * {CHUNK_S} + 1, {CHUNK_W})").alias("c"),
    )
    return c.select(
        "doc_id",
        "chunk_id",
        F.size("c").cast("long").alias("n_tokens"),
        F.md5(F.array_join(F.col("c"), " ")).alias("fingerprint"),
    )


QUERIES = {"chunk_documents": chunk_documents}

ORACLE = {
    "chunk_documents": f"""
        WITH d AS (
            SELECT doc_id,
                   string_split(coalesce(text, ''), ' ') AS t
            FROM documents
        ),
        c AS (
            SELECT doc_id, t,
                   unnest(range(0,
                       1 + (greatest(len(t) - {CHUNK_W}, 0) + {CHUNK_S} - 1)
                           // {CHUNK_S})) AS i
            FROM d
        )
        SELECT doc_id,
               CAST(i AS INTEGER) AS chunk_id,
               CAST(len(list_slice(t, i * {CHUNK_S} + 1,
                                   i * {CHUNK_S} + {CHUNK_W})) AS BIGINT)
                   AS n_tokens,
               md5(array_to_string(
                   list_slice(t, i * {CHUNK_S} + 1, i * {CHUNK_S} + {CHUNK_W}),
                   ' ')) AS fingerprint
        FROM c
    """,
}
