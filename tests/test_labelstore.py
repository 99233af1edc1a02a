"""Label-store domain semantics: the reference's end-product behaviors
that the hash gate can't express — per-source refresh isolation,
point lookup, and the $set-clobber bug the policy prevents."""

from __future__ import annotations

from pyspark.sql import functions as F

from labelmain_spark.labelstore import store


def _store(spark, sf_dir):
    return store.consolidate(
        store.abuse_labels(spark, sf_dir), store.wallet_labels(spark, sf_dir)
    )


def test_lookup_returns_one_doc(spark, sf_dir):
    s = _store(spark, sf_dir)
    some_addr = s.select("addr").orderBy("addr").first().addr
    doc = store.lookup(s, some_addr).collect()
    assert len(doc) == 1
    assert doc[0].addr == some_addr
    assert len(doc[0].labels) >= 1


def test_refresh_source_preserves_other_namespaces(spark, sf_dir):
    """Refreshing walletExplorer labels must not touch bitcoinAbuse
    labels — the failure mode of the reference's $set overwrite."""
    s = _store(spark, sf_dir)
    fresh = store.wallet_labels(spark, sf_dir)  # same data, fresh extract
    refreshed = store.refresh_source(s, "walletExplorer", fresh)

    def abuse_only(df):
        return (
            df.select("addr", F.explode("labels").alias("l"))
            .filter(F.col("l.src") == "bitcoinAbuse")
            .select("addr", "l")
        )

    before = abuse_only(s)
    after = abuse_only(refreshed)
    assert before.exceptAll(after).count() == 0
    assert after.exceptAll(before).count() == 0


def test_refresh_source_idempotent(spark, sf_dir):
    s = _store(spark, sf_dir)
    fresh = store.wallet_labels(spark, sf_dir)
    once = store.refresh_source(s, "walletExplorer", fresh)
    twice = store.refresh_source(once, "walletExplorer", fresh)
    assert once.exceptAll(twice).count() == 0
    assert twice.exceptAll(once).count() == 0


def test_consolidate_commutative(spark, sf_dir):
    a = store.abuse_labels(spark, sf_dir)
    b = store.wallet_labels(spark, sf_dir)
    ab = store.consolidate(a, b)
    ba = store.consolidate(b, a)
    assert ab.exceptAll(ba).count() == 0
    assert ba.exceptAll(ab).count() == 0
