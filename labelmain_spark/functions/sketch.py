"""Count-Min sketch as a relational operator (SURVEY §2.11 north-star
"novel sketch" class, next to the built-in HLL/GK forms in
operators/advanced.py).

A CMS is d hash rows × w buckets of counters; point frequency estimate
= min over rows of the addressed counter — never under-estimates,
over-estimates by ≤ εN with ε = e/w at the usual depth. As a DataFrame
op the sketch IS a (seed, bucket, n) table: the groupBy is map-side
combinable, the shuffle carries ≤ d·w rows per partition, and two
sketches merge by adding cells — the mergeability that makes it work as
a distributed partial aggregate at any scale.

Engine-reproducible hashing: bucket = (first 4 hex digits of
md5(seed:key)) mod w, with hex digits valued via
``instr('0123456789abcdef', c) - 1`` — every piece exists identically
in Spark SQL and DuckDB, so the driver gets a full value-hash oracle
row for a sketch (numeric conv() of a digest has no DuckDB twin, which
is what forces dedup_simhash to rows-only; this construction avoids
conv entirely).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from labelmain_spark.sources.readers import load_table

CMS_D = 4   # hash rows (depth): P(overestimate > εN) ≤ 2^-d-ish
CMS_W = 64  # buckets per row (width): ε = e/w


def _bucket_expr(seed_col: str, key_col: str, engine: str) -> str:
    """The shared bucket function, emitted for either engine's SQL
    dialect (they differ only in the string-cast spelling)."""
    cast = "CAST({c} AS STRING)" if engine == "spark" else "CAST({c} AS VARCHAR)"
    m = f"md5(concat({cast.format(c=seed_col)}, ':', {cast.format(c=key_col)}))"
    digit = "(instr('0123456789abcdef', substr({m}, {i}, 1)) - 1)"
    val = " + ".join(
        f"{digit.format(m=m, i=i + 1)} * {16 ** (3 - i)}" for i in range(4)
    )
    return f"(({val}) % {CMS_W})"


def cms_build(df: DataFrame, key_col: str, d: int = CMS_D) -> DataFrame:
    """Build the (seed, bucket, n) sketch table over a key column."""
    seeds = df.select(
        F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("seed"),
        F.col(key_col).alias("k"),
    )
    bucket = F.expr(_bucket_expr("seed", "k", "spark"))
    return (
        seeds.select("seed", bucket.alias("bucket"))
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_point_estimate(sketch: DataFrame, key, d: int = CMS_D) -> int:
    """Frequency estimate for one key: min over rows of its cell."""
    spark = sketch.sparkSession
    probe = spark.createDataFrame([(i, str(key)) for i in range(d)], "seed int, k string")
    bucket = F.expr(_bucket_expr("seed", "k", "spark"))
    cells = probe.select("seed", bucket.alias("bucket")).join(
        sketch, ["seed", "bucket"], "left"
    )
    row = cells.agg(F.min(F.coalesce(F.col("n"), F.lit(0)))).first()
    return int(row[0])


def cms_user_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS over events.user_id — the heavy-hitter pre-filter a label
    pipeline runs before exact per-key work."""
    ev = load_table(spark, sf_dir, "events").select("user_id")
    return cms_build(ev, "user_id")


QUERIES = {"cms_user_sketch": cms_user_sketch}

ORACLE = {
    "cms_user_sketch": f"""
        SELECT seed, {_bucket_expr("seed", "user_id", "duck")} AS bucket,
               COUNT(*) AS n
        FROM events CROSS JOIN (SELECT unnest(range({CMS_D})) AS seed)
        GROUP BY seed, {_bucket_expr("seed", "user_id", "duck")}
    """,
}
