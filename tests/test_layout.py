"""Layout tests: partition-pruned point lookups and the bucketed-store
shuffle elimination — the physical-design half of the label store."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

from labelmain_spark.labelstore import layout
from labelmain_spark.labelstore.store import abuse_labels, consolidate, wallet_labels
from labelmain_spark.plans import checks


@contextmanager
def _conf(spark, key: str, value: str):
    old = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_partitioned_lookup_prunes_and_matches(spark, sf_dir, tmp_path):
    store = abuse_labels(spark, sf_dir)
    path = str(tmp_path / "store_part")
    layout.write_partitioned(store, path, buckets=16)

    addr = store.select("addr").orderBy("addr").first()[0]
    got = layout.lookup_partitioned(spark, path, addr, buckets=16)
    checks.assert_partition_filter(got, layout.BUCKET_COL)
    checks.assert_pushed_filter(got, "addr")

    want = store.filter(F.col("addr") == addr).collect()
    assert [r.addr for r in got.collect()] == [r.addr for r in want]


def test_partitioned_write_one_file_per_bucket(spark, sf_dir, tmp_path):
    store = wallet_labels(spark, sf_dir)
    path = str(tmp_path / "store_files")
    layout.write_partitioned(store, path, buckets=8)
    import glob

    for d in glob.glob(path + "/bucket=*"):
        files = glob.glob(d + "/*.parquet")
        assert len(files) == 1, f"{d}: {len(files)} files (small-files trap)"


def test_bucketed_consolidate_eliminates_store_shuffle(spark, sf_dir, tmp_path):
    a = abuse_labels(spark, sf_dir)
    b = wallet_labels(spark, sf_dir)
    layout.write_bucketed(a, "test_store_bucketed")

    plain_path = str(tmp_path / "store_plain")
    a.write.mode("overwrite").parquet(plain_path)

    try:
        with _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
            bucketed = layout.consolidate_against_bucketed(
                spark, "test_store_bucketed", b
            )
            plain = consolidate(spark.read.parquet(plain_path), b)
            n_bucketed = checks.count_exchanges(bucketed)
            n_plain = checks.count_exchanges(plain)
            assert n_bucketed < n_plain, (
                f"bucketed store did not save a shuffle: "
                f"{n_bucketed} vs {n_plain} exchanges"
            )
            got = sorted(map(str, bucketed.collect()))
            want = sorted(map(str, plain.collect()))
            assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS test_store_bucketed")
