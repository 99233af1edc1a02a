"""Session-scoped persist tracking: the WeakKeyDictionary must be able
to actually collect an abandoned session, which requires that tracked
handles never strongly reference the Python SparkSession (r10
self-review: DataFrame values hold ``_session`` → they pin the weak key
forever, degrading the dict to a strong one for exactly the sessions it
exists to clean up)."""

from __future__ import annotations

from labelmain_spark import session as sess


def test_tracked_handles_hold_no_session_backref(spark, sf_dir):
    from labelmain_spark.functions.text import bm25_topk

    sess.release_caches(spark)  # clean slate
    bm25_topk(spark, sf_dir)  # plan build registers the persisted base
    entry = sess._TRACKED_PERSISTS.get(spark)
    assert entry, "bm25_topk should have tracked its persisted projection"
    # classic path: every handle is the py4j JVM Dataset — a DataFrame
    # here would re-pin the session (the defect this test pins closed).
    # isinstance, not hasattr: py4j JavaObjects answer hasattr for any
    # name, including sparkSession.
    from pyspark.sql import DataFrame

    assert all(not isinstance(h, DataFrame) for h in entry), (
        "tracked handle is a Python DataFrame — it strongly references "
        "the SparkSession and defeats the WeakKeyDictionary"
    )
    sess.release_caches(spark)
    assert not sess._TRACKED_PERSISTS.get(spark), "release must drop the entry"


def test_release_caches_scoped_to_caller(spark, sf_dir):
    """The tracked-release step must only drop the caller's entry — a
    second session's tracked list survives. (Simulated with a distinct
    weak-key object: real concurrent sessions share the test JVM. The
    catalog.clearCache() backstop is application-wide by Spark's own
    design — release_caches documents that and takes
    clear_shared=False for multi-session processes.)"""

    class _FakeSession:
        pass

    other = _FakeSession()
    sess._TRACKED_PERSISTS[other] = ["sentinel"]
    from labelmain_spark.functions.text import bm25_topk

    bm25_topk(spark, sf_dir)
    sess.release_caches(spark, clear_shared=False)
    assert sess._TRACKED_PERSISTS.get(other) == ["sentinel"]
    del sess._TRACKED_PERSISTS[other]
    sess.release_caches(spark)


def test_heavy_key_iteration_storage_bounded(spark, sf_dir):
    """r14 cache-lifetime hygiene (VERDICT #6): a session iterating the
    HEAVY registry keys — the ones whose internals persist
    postings/signature/pair-scale intermediates (audit persists,
    `_exploded_shingles`, the KN pad table) — must return to ZERO
    cached storage after each `release_caches` call, so a long-lived
    driver sweeping the registry cannot accumulate postings-sized
    storage across keys. Ten keys, every one either persisting
    internally or composing operators that do."""
    from labelmain_spark import registry

    heavy = [
        "lsh_recall_audit",
        "containment_dedup",
        "dedup_minhash",
        "dedup_clusters",
        "dedup_incremental_near",
        "split_leakage_safe",
        "quality_kn5_nll",
        "dsir_weights",
        "corpus_incremental",
        "ngram_jaccard",
    ]
    qs = registry.queries()
    jsc = spark.sparkContext._jsc.sc()
    for key in heavy:
        qs[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
        sess.release_caches(spark)
        leftover = [
            str(i.name())
            for i in jsc.getRDDStorageInfo()
            if i.memSize() > 0 or i.diskSize() > 0
        ]
        assert not leftover, f"{key} left cached storage: {leftover}"
