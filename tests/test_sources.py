"""Bronze format readers + quarantine + silver writer round-trips."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from labelmain_spark.sources import formats
from labelmain_spark.sources.readers import load_table

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("amount", T.DoubleType()),
    ]
)


def test_json_landing_quarantine(spark, tmp_path):
    p = tmp_path / "landing.json"
    lines = [
        json.dumps({"id": 1, "name": "a", "amount": 1.5}),
        json.dumps({"id": 2, "name": "b", "amount": 2.5}),
        '{"id": 3, "name": "broken',  # corrupt payload
        "not json at all",
    ]
    p.write_text("\n".join(lines))
    clean, quarantine = formats.read_json_landing(spark, str(p), SCHEMA)
    assert clean.count() == 2
    assert {r.id for r in clean.collect()} == {1, 2}
    q = [r[formats.CORRUPT_COL] for r in quarantine.collect()]
    assert len(q) == 2 and any("broken" in s for s in q)


def test_csv_landing_quarantine(spark, tmp_path):
    p = tmp_path / "landing.csv"
    p.write_text("id,name,amount\n1,a,1.5\n2,b,not_a_number\n3,c,3.5\n")
    clean, quarantine = formats.read_csv_landing(spark, str(p), SCHEMA)
    assert {r.id for r in clean.collect()} == {1, 3}
    assert quarantine.count() == 1


def test_silver_write_partition_pruning(spark, sf_dir, tmp_path):
    """Partitioned silver write → incremental read prunes partitions."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    out = str(tmp_path / "silver")
    formats.write_silver(ev, out, "day")
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    one_day = back.filter(F.col("day") == "2024-01-05")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    # partition filter must reach the scan (pruned read, not post-filter)
    assert one_day.count() > 0
    assert "PartitionFilters" in plan or "day#" not in plan.split("Scan")[0]


def test_paged_source_batch_roundtrip(spark, tmp_path):
    """Custom Python data source: rows written into the page chain come
    back exactly, one partition per page (parallel page fetch)."""
    from labelmain_spark.sources import paged

    rows = [(i, i % 7, "click" if i % 2 else "view", float(i) / 4) for i in range(1234)]
    n_pages = paged.write_page_fixture(str(tmp_path / "pages"), rows, page_size=100)
    assert n_pages == 13
    paged.register(spark)
    df = spark.read.format("paged_json").option("path", str(tmp_path / "pages")).load()
    assert df.rdd.getNumPartitions() == n_pages
    got = sorted(tuple(r) for r in df.collect())
    assert got == sorted(rows)


def test_paged_source_stream_resumes_from_checkpoint(spark, tmp_path):
    """Streaming form: offsets are page indices stored in the streaming
    checkpoint — new pages appearing after a restart are picked up
    WITHOUT re-reading committed ones (the durable-endCursor contract
    the reference lacks, chainabuse/main.py:107-109)."""
    from labelmain_spark.sources import paged

    pages_dir, cp = str(tmp_path / "pages"), str(tmp_path / "cp")
    out = str(tmp_path / "out")
    rows1 = [(i, i % 5, "click", float(i)) for i in range(300)]
    paged.write_page_fixture(pages_dir, rows1, page_size=100)
    paged.register(spark)

    def run_once():
        q = (
            spark.readStream.format("paged_json").option("path", pages_dir).load()
            .writeStream.format("parquet").option("path", out)
            .outputMode("append").option("checkpointLocation", cp)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    run_once()
    assert spark.read.parquet(out).count() == 300

    # "the remote API grew pages" — extend the chain, keep old pages
    rows2 = [(1000 + i, i % 5, "view", float(i)) for i in range(150)]
    all_rows = rows1 + rows2
    paged.write_page_fixture(pages_dir, all_rows, page_size=100)
    run_once()
    # the file sink appends only the NEW micro-batch: committed pages
    # were not re-read (no duplicates), the two new ones arrived
    got = spark.read.parquet(out)
    assert got.count() == 450, "restart re-read or skipped pages"
    assert got.select("event_id").distinct().count() == 450


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC silver layer: round-trip preserves rows and the scan pushes
    filters just like parquet."""
    from labelmain_spark.sources import formats
    from labelmain_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    formats.write_orc(orders, str(tmp_path / "orders_orc"))
    back = formats.read_orc(spark, str(tmp_path / "orders_orc"))
    assert back.count() == orders.count()
    filtered = back.filter(back.o_orderkey == 1)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_orderkey" in plan, plan
