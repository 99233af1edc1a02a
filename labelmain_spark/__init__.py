"""labelmain_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
label-database maintainer (c0mm4nd/labelmain: paginated source scan →
extract/transform → dedup → merge-upsert, plus the query surface of the
resulting address-label store) as idiomatic Spark DataFrame / SQL plans,
and extends it with the LLM-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis) required for 100 TB scale.

Layout
------
- ``session``     SparkSession builder with scale-aware defaults (AQE,
                  shuffle partitions, Arrow, UTC).
- ``sources``     table readers / landing-zone helpers.
- ``operators``   relational operators (scan/filter/project/join/agg/
                  window/setop/merge) — each with a DuckDB oracle twin.
- ``functions``   scalar/text/vector/dedup function families and the
                  Pandas-UDF surface.
- ``streaming``   Structured-Streaming forms of the incremental-ingest
                  semantics (TTL dedup, cursor/watermark, upsert sink).
- ``multimodal``  opaque binary columns + typed metadata plumbing.
- ``plans``       plan-inspection helpers (pushdown/broadcast asserts).
- ``registry``    merges every operator's ``queries()`` / ``oracle_sql()``
                  entry for the driver contract in ``__spark_entry__.py``.
"""

__version__ = "0.1.0"
