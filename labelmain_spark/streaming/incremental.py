"""Structured-Streaming forms of the reference's incremental-ingest
semantics (SURVEY.md §2.9).

The reference is a forever-loop ingester; each of its control-flow
tricks maps onto a first-class streaming concept:

- T1 micro-batch trigger with interval (5 s/10 s page sleeps,
  bitcoinabuse/main.go:40-41,112-113; 8 h ticker walletexplorer
  main.go:78; 1 h tail-poll chainabuse/main.py:110-115)
  → ``trigger(processingTime=...)`` / ``availableNow`` here.
- T2 stateful dedup with TTL (12 h ttlcache keyed by addr,
  bitcoinabuse/main.go:43-45,218-221,248)
  → ``withWatermark + dropDuplicatesWithinWatermark``.
- T3 offset/cursor checkpointing (GraphQL endCursor carried in memory —
  and LOST on restart — chainabuse/main.py:107-109)
  → ``checkpointLocation`` (durable, exactly-once restart).
- T4 at-least-once + idempotent upsert sink (S6-S8)
  → ``foreachBatch`` + the merge operators → exactly-once effect.
- T6/T7 event-time windows + late data → watermarked window aggs.

At scale the streaming state store is RocksDB-backed
(``spark.sql.streaming.stateStore.providerClass``), watermarks bound
state size, and ``maxFilesPerTrigger``/``maxOffsetsPerTrigger`` provide
backpressure — config, not code.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from labelmain_spark.operators.merge import upsert
from labelmain_spark.operators.parity import DEC
from labelmain_spark.sources.readers import _enable_nanos_as_long

def _events_ts_is_long_nanos(sf_dir: str) -> bool:
    """Inspect the parquet footer: TIMESTAMP(NANOS) fixtures (which
    Spark only reads via legacy nanosAsLong=long) vs native µs/ms
    timestamps. Streaming requires an explicit schema, so the choice
    must be made up front — hardcoding one layout silently emits zero
    rows when the fixtures change (round-3 postmortem)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_schema(os.path.join(sf_dir, "events.parquet")).field("ts").type
    return pa.types.is_int64(t) or (pa.types.is_timestamp(t) and t.unit == "ns")


def events_schema(sf_dir: str) -> T.StructType:
    """Stream-source schema for the events table, matching what the
    batch reader (readers.load_table) would infer for the same files."""
    nanos = _events_ts_is_long_nanos(sf_dir)
    ts_type: T.DataType = T.LongType() if nanos else T.TimestampNTZType()
    # NTZ here matches the file bytes; stream_events casts to TIMESTAMP
    # right after read so consumers (watermarks reject NTZ) see the
    # same TimestampType the batch reader normalizes to.
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events landing zone — the streaming
    twin of readers.load_table(events): schema branched on the parquet
    footer exactly like the batch path, ns→µs conversion only when the
    files really are long-nanos."""
    _enable_nanos_as_long(spark)
    raw = (
        spark.readStream.schema(events_schema(sf_dir))
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")  # file source needs a dir
        .parquet(sf_dir)
    )
    if _events_ts_is_long_nanos(sf_dir):
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        # NTZ → TIMESTAMP under the UTC-pinned session: identity on the
        # values, required by withWatermark (rejects TIMESTAMP_NTZ) and
        # matches the batch reader's normalized type.
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def tumbling_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """T6: watermarked tumbling event-time aggregation (streaming twin
    of operators.windows.window_tumbling)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .select(F.col("win.start").alias("win_start"), "event_type", "n", "sum_value")
    )


def ttl_dedup(events: DataFrame, ttl: str = "12 hours") -> DataFrame:
    """T2: the 12 h ttlcache as streaming state — drop repeat
    (user_id, event_type) keys within the watermark window. State is
    evicted by the watermark exactly like the reference's TTL expiry."""
    return events.withWatermark("ts", ttl).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


def enriched_counts(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join + windowed aggregation: each
    micro-batch joins against the (batch) dimension — the streaming
    form of the label-enrichment query surface (events enriched with
    the label store by key, then aggregated per window).

    At scale the static side is either broadcast (small dim) or a
    bucketed table co-located with the stream's partitioning; the join
    re-plans per micro-batch, so a refreshed dim is picked up on the
    next trigger — the same freshness contract the reference gets from
    re-reading Mongo every cycle. The broadcast hint is SIZE-GATED
    (r9): a caller-supplied user dimension is corpus-scale at 100 TB,
    and the gate's shuffle fallback co-partitions on user_id."""
    from labelmain_spark.sources.readers import broadcast_if_bounded

    joined = events.join(broadcast_if_bounded(dim), "user_id", "left")
    return (
        joined.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("segment"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("win_start"), "segment", "n")
    )


def read_state(spark: SparkSession, state_path: str) -> DataFrame:
    """Read the committed state version (the one the CURRENT pointer
    names). Versions other than CURRENT are either already-pruned
    history or an in-flight write — never visible to readers."""
    with open(os.path.join(state_path, "CURRENT")) as f:
        version = f.read().strip()
    return spark.read.parquet(os.path.join(state_path, version))


def run_upsert_sink(
    events: DataFrame,
    state_path: str,
    checkpoint_path: str,
) -> None:
    """T4: foreachBatch + last-write-wins merge into a parquet state
    table — the UpdateOne(upsert:true) sink. Re-running a batch is
    idempotent because the merge is keyed (exactly-once effect from
    at-least-once delivery, the same property the reference leans on).

    The commit is crash-atomic: each batch writes a NEW versioned dir
    (``v<n+1>``) and then atomically swaps the ``CURRENT`` pointer file
    (``os.replace``). A crash before the swap leaves CURRENT on the old
    version and the streaming checkpoint un-committed, so restart
    replays the batch; a crash after the swap replays the batch against
    already-merged state, which the keyed last-write-wins merge makes a
    no-op. At object-store scale the pointer file becomes a manifest
    commit (Delta/Iceberg-style); the layout here is the same contract
    on a filesystem.
    """

    def merge_batch(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        doc = batch.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("ts").alias("last_ts"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        cur_file = os.path.join(state_path, "CURRENT")
        if os.path.isfile(cur_file):
            with open(cur_file) as f:
                prev = f.read().strip()
            merged = upsert(read_state(spark, state_path), doc, "user_id")
            nxt = f"v{int(prev[1:]) + 1}"
        else:  # first batch: no state yet
            os.makedirs(state_path, exist_ok=True)
            prev, merged, nxt = None, doc, "v0"
        merged.write.mode("overwrite").parquet(os.path.join(state_path, nxt))
        fd, tmp = tempfile.mkstemp(dir=state_path, prefix="_current_")
        with os.fdopen(fd, "w") as f:
            f.write(nxt)
        os.replace(tmp, cur_file)  # atomic pointer swap = the commit
        # prune history: keep nxt (live) and prev (crash-replay window)
        for d in os.listdir(state_path):
            if d.startswith("v") and d not in (nxt, prev):
                shutil.rmtree(os.path.join(state_path, d), ignore_errors=True)

    q = (
        events.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents landing zone — the
    arrival stream of a crawl. Schema is derived from the actual
    parquet footer via the batch reader (the r4 rule: a hardcoded
    stream schema silently emits zero rows when fixtures drift), which
    the fixture tripwire also pins."""
    schema = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def incremental_dedup_stream(docs: DataFrame, history_digests: DataFrame) -> DataFrame:
    """Streaming twin of dedup_incremental's history probe: each
    micro-batch digests its documents and LEFT ANTI joins the static
    history digest table — survivors are the docs history has never
    seen. Stream-static anti joins are stateless (no watermark
    needed); the static side re-plans per micro-batch, so a history
    refreshed between triggers is visible on the next one — and in
    production the static side is the bucketed label-store digest
    table, making the probe co-located (labelstore/layout.py).

    Within-batch duplicates are NOT collapsed here (that is the batch
    twin's 'dup_in_batch' class, a stateful within-stream question
    answered by ttl_dedup/dropDuplicatesWithinWatermark); this
    operator answers exactly the history-membership half, and the
    parity test pins that split."""
    d = docs.select(
        "doc_id", F.sha2(F.lower(F.trim(F.col("text"))), 256).alias("h")
    )
    return d.join(history_digests, "h", "left_anti")


def incremental_prefix_stream(docs: DataFrame, history: DataFrame) -> DataFrame:
    """Streaming twin of ``dedup_prefix``'s truncation probe — the
    third member of the incremental-dedup family (exact digests, near
    band-index, now PREFIX): each arriving capture is checked BOTH
    ways against the static history corpus via the shared
    first-PREFIX_W-token block index:

    - ``is_prefix_dup`` = 1 when history holds a strictly longer doc
      starting with the arrival at a token boundary (the arrival is a
      truncated re-fetch of a page already stored → drop it);
    - ``supersedes``/``n_superseded`` name the history docs that are
      strict prefixes OF the arrival (the arrival is the fuller
      capture of pages stored truncated → replace them). min-doc_id
      witness, count for the audit.

    Together the two directions reconstruct the batch key exactly: a
    doc is batch-flagged iff its superstring arrived no later than it
    (arrival-time flag — pass ``history`` INCLUDING the current batch
    to make the probe self-inclusive, catching intra-batch pairs;
    strictness prevents self-matches) or arrived after it (caught by
    running the SAME function with roles swapped — history as the
    probe side, arrivals as the reference — whose is_prefix_dup is
    then the retro/superseded flag). The parity test pins
    arrival ∪ retro == batch ``prefix_dups`` across three real
    epochs.

    Scale shape: two stream-static equi-joins keyed on the 16-byte
    block digest (stateless — no watermark, no stream state); the
    static side is the history's block index, bucketed in production
    so the probe is co-located. Same quadratic-per-block exposure and
    same W lever as the batch key."""
    from labelmain_spark.functions.dedup import _prefix_keyed

    kb = _prefix_keyed(docs)
    kh = _prefix_keyed(history)
    dup = (
        kb.alias("a")
        .join(
            kh.alias("b"),
            (F.col("a.block") == F.col("b.block"))
            & (F.col("b.n_tokens") > F.col("a.n_tokens"))
            & (F.expr("substr(b.text, 1, length(a.text) + 1) = concat(a.text, ' ')")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_id"))
        .agg(F.min(F.col("b.doc_id")).cast("long").alias("dup_of"))
    )
    sup = (
        kb.alias("a")
        .join(
            kh.alias("b"),
            (F.col("a.block") == F.col("b.block"))
            & (F.col("b.n_tokens") < F.col("a.n_tokens"))
            & (F.expr("substr(a.text, 1, length(b.text) + 1) = concat(b.text, ' ')")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_id"))
        .agg(
            F.min(F.col("b.doc_id")).cast("long").alias("supersedes"),
            F.count(F.lit(1)).cast("long").alias("n_superseded"),
        )
    )
    base = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    return (
        base.join(dup, "doc_id", "left")
        .join(sup, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.when(F.col("dup_of").isNotNull(), F.lit(1)).otherwise(F.lit(0)).alias(
                "is_prefix_dup"
            ),
            F.coalesce("dup_of", F.lit(-1)).cast("long").alias("dup_of"),
            F.coalesce("supersedes", F.lit(-1)).cast("long").alias("supersedes"),
            F.coalesce("n_superseded", F.lit(0)).cast("long").alias("n_superseded"),
        )
    )


def run_corpus_increment_sink(
    docs: DataFrame,
    hist_digests: DataFrame,
    bench: DataFrame,
    freq: DataFrame,
    tot: DataFrame,
    th: DataFrame,
    out_path: str,
    checkpoint_path: str,
) -> None:
    """Streaming twin of the per-batch half of ``corpus_incremental``
    (pipeline.py): every micro-batch of the crawl stream is digest-
    deduped against the STATIC history digest table, span-
    decontaminated against the STATIC benchmark n-gram set, and
    scored/bucketed against the STATIC pre-fitted unigram model +
    tercile thresholds — exactly the production daily-crawl loop where
    history digests, benchmark set, frequency table and thresholds are
    yesterday's persisted artifacts. The whole body is
    ``pipeline.dedup_clean_batch`` + ``pipeline.score_against_model``,
    shared verbatim with the batch key, so stream-accumulated output
    is batch-exact by construction (pinned by
    test_stream_corpus_increment_matches_batch). The curriculum
    POSITION stage is deliberately absent: a global prefix-count over
    the full increment is a finalization step (write_ordered_corpus),
    not a per-micro-batch one. Idempotency: each epoch overwrites its
    own ``epoch=<id>`` directory (the run_upsert_sink discipline —
    foreachBatch is at-least-once, a plain append would double docs on
    task retry)."""
    from labelmain_spark.pipeline import dedup_clean_batch, score_against_model

    def clean_batch(batch: DataFrame, epoch_id: int) -> None:
        kept = dedup_clean_batch(
            batch.select("doc_id", "text"), hist_digests, bench
        )
        score_against_model(kept, freq, tot, th).write.mode("overwrite").parquet(
            os.path.join(out_path, f"epoch={epoch_id}")
        )

    q = (
        docs.writeStream.foreachBatch(clean_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_tag_filter_sink(
    docs: DataFrame,
    out_path: str,
    checkpoint_path: str,
) -> None:
    """Streaming twin of tag_and_filter: each crawl micro-batch runs
    the tagger+mixer expressions (functions/text.py::tag_docs — shared
    VERBATIM with the batch key, so parity holds by construction; the
    taggers are row-local, no cross-batch state) and lands as parquet
    with the keep verdict and reason codes attached. Same idempotent
    epoch-overwrite discipline as the other sinks: foreachBatch is
    at-least-once, so each epoch rewrites its OWN epoch=<id> directory
    instead of appending duplicates on task retry."""
    from labelmain_spark.functions.text import tag_docs

    def tag_batch(batch: DataFrame, epoch_id: int) -> None:
        tag_docs(batch.select("doc_id", "text")).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_path, f"epoch={epoch_id}"))

    q = (
        docs.writeStream.foreachBatch(tag_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_blocklist_sink(
    docs: DataFrame,
    out_path: str,
    checkpoint_path: str,
) -> None:
    """Streaming twin of blocklist_filter (r7 verdict item 6): the
    domain-blocklist gate is the FIRST filter a daily-crawl pipeline
    runs at ingest, so each crawl micro-batch classifies through
    functions/web.py::blocklist_docs — shared VERBATIM with the batch
    key; the suffix-rule map is row-local, no cross-batch state, so
    parity holds by construction — and lands as parquet with the
    verdict and matched entry attached. Same idempotent
    epoch-overwrite discipline as the other sinks (foreachBatch is
    at-least-once; each epoch rewrites its OWN directory)."""
    from labelmain_spark.functions.web import blocklist_docs

    def block_batch(batch: DataFrame, epoch_id: int) -> None:
        blocklist_docs(batch.select("doc_id", "text")).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_path, f"epoch={epoch_id}"))

    q = (
        docs.writeStream.foreachBatch(block_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_pii_luhn_sink(
    docs: DataFrame,
    out_path: str,
    checkpoint_path: str,
) -> None:
    """Streaming twin of pii_luhn (r7 verdict item 6): the
    Luhn-validated card scrub is the other ingest-time gate a crawl
    pipeline runs daily; each micro-batch runs
    functions/pii.py::luhn_docs — shared VERBATIM with the batch key,
    row-local array expressions, no cross-batch state — and lands the
    redacted text + counts as parquet under the idempotent
    epoch-overwrite discipline."""
    from labelmain_spark.functions.pii import luhn_docs

    def luhn_batch(batch: DataFrame, epoch_id: int) -> None:
        luhn_docs(batch.select("doc_id", "text")).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_path, f"epoch={epoch_id}"))

    q = (
        docs.writeStream.foreachBatch(luhn_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_decontaminate_sink(
    docs: DataFrame,
    bench: DataFrame,
    out_path: str,
    checkpoint_path: str,
) -> None:
    """Streaming twin of decontaminate_spans: each micro-batch of the
    crawl stream is span-decontaminated against the STATIC benchmark
    n-gram hash table (functions/contamination.py::decontaminate_docs)
    and appended as parquet shards. The cleaner is per-document given
    the benchmark — no cross-batch state — so stream-accumulated
    output is batch-exact (pinned by
    test_stream_decontaminate_matches_batch). Window functions are
    unsupported on streaming DataFrames, so the n-gram chain runs
    under ``foreachBatch``, the standard shape for per-batch
    relational logic with no cross-batch state; the static bench side
    re-plans per micro-batch, so a refreshed eval suite is visible on
    the next trigger. foreachBatch delivery is AT-LEAST-ONCE, so each
    epoch overwrites its OWN ``epoch=<id>`` partition directory — a
    replayed batch rewrites the same directory instead of appending
    duplicates (idempotent, the run_upsert_sink discipline; a plain
    append would silently double documents on task retry). Production
    routes the final publish through the versioned atomic pointer in
    sources/writers."""
    from labelmain_spark.functions.contamination import decontaminate_docs

    def clean_batch(batch: DataFrame, epoch_id: int) -> None:
        decontaminate_docs(batch.select("doc_id", "text"), bench).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_path, f"epoch={epoch_id}"))

    q = (
        docs.writeStream.foreachBatch(clean_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_cms_sink(
    events: DataFrame,
    out_path: str,
    checkpoint_path: str,
    key_col: str = "user_id",
) -> None:
    """Streaming Count-Min sketch (r11): each micro-batch builds its
    PARTIAL sketch through functions/sketch.py::cms_build — shared
    VERBATIM with the batch key, so parity holds by construction —
    and lands it under its own ``epoch=<id>`` directory (the
    idempotent epoch-overwrite discipline every sink here uses:
    foreachBatch is at-least-once, a replayed epoch rewrites its OWN
    partial, never double-counts). The full-corpus sketch is the
    cell-wise SUM of the epoch partials (:func:`finalize_cms`):
    sketch(A ∪ B) = sketch(A) + sketch(B) cell-for-cell is the CMS
    mergeability property, and exercising it across micro-batches is
    the streaming form of the same map-side partial / reduce-side
    merge the batch groupBy does across partitions. The same
    checkpoint-vs-stale-epochs distinction as run_release_sink
    applies: a fresh checkpoint clears leftover epochs."""
    from labelmain_spark.functions.sketch import cms_build

    if not os.path.exists(os.path.join(checkpoint_path, "offsets")):
        shutil.rmtree(out_path, ignore_errors=True)

    def sketch_batch(batch: DataFrame, epoch_id: int) -> None:
        cms_build(batch.select(key_col), key_col).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_path, f"epoch={epoch_id}"))

    q = (
        events.writeStream.foreachBatch(sketch_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _epoch_partials(spark: SparkSession, out_path: str, schema: str) -> DataFrame:
    """Read the per-epoch partial directory, surviving the ZERO-epoch
    case: an availableNow stream over an empty landing dir triggers no
    batches, so ``out_path`` may not exist — schema inference over
    nothing throws, and a monitor asking "what has the stream seen so
    far" deserves an empty typed frame, not an AnalysisException. The
    explicit schema also pins the partial layout the finalizers
    assume."""
    if not os.path.isdir(out_path):
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(out_path)


def finalize_cms(spark: SparkSession, out_path: str) -> DataFrame:
    """Merge the per-epoch partial sketches into the corpus sketch:
    cell-wise sum over (seed, bucket) — the CMS merge operation. The
    result is bit-equal to cms_build over all rows at once (pinned by
    the streaming parity test)."""
    return (
        _epoch_partials(spark, out_path, "seed int, bucket int, n long")
        .groupBy("seed", "bucket")
        .agg(F.sum("n").alias("n"))
    )


def run_hll_sink(
    events: DataFrame,
    out_path: str,
    checkpoint_path: str,
    key_col: str = "user_id",
) -> None:
    """Streaming HyperLogLog (r11) — the cardinality member of the
    per-micro-batch partial-sketch family (run_cms_sink is the
    frequency member; same idempotent epoch-overwrite discipline, same
    checkpoint-vs-stale-epochs handling). Each micro-batch builds its
    PARTIAL register table through functions/sketch.py::hll_build —
    shared VERBATIM with the batch key — and the corpus sketch is the
    cell-wise MAX of the epoch partials (:func:`finalize_hll`):
    hll(A ∪ B) = max(hll(A), hll(B)) register-for-register, which is
    what lets a pipeline keep one 256-row table per shard/day and
    answer COUNT(DISTINCT) over any union of them without ever
    re-shuffling raw keys."""
    from labelmain_spark.functions.sketch import hll_build

    if not os.path.exists(os.path.join(checkpoint_path, "offsets")):
        shutil.rmtree(out_path, ignore_errors=True)

    def sketch_batch(batch: DataFrame, epoch_id: int) -> None:
        hll_build(batch.select(key_col), key_col).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_path, f"epoch={epoch_id}"))

    q = (
        events.writeStream.foreachBatch(sketch_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def finalize_hll(spark: SparkSession, out_path: str) -> DataFrame:
    """Merge the per-epoch partial register tables: cell-wise MAX over
    bucket — the HLL merge operation. Bit-equal to hll_build over all
    rows at once (pinned by the streaming parity test)."""
    return (
        _epoch_partials(spark, out_path, "bucket int, max_rho int")
        .groupBy("bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )


def run_drift_sink(
    vectors: DataFrame,
    out_path: str,
    checkpoint_path: str,
) -> None:
    """Streaming embedding-drift partials (late r11) — the third
    member of the per-micro-batch partial family (CMS = frequency,
    HLL = cardinality, this = per-dimension MOMENTS): each
    micro-batch of landing vectors writes its (dim, _n, mx) partial —
    the exact count and micro-unit fixed-point sum from
    functions/vectors.py::_micro_mean_partials, shared VERBATIM with
    the batch key so parity holds by construction — under the
    idempotent ``epoch=<id>`` overwrite discipline. Count/sum are
    mergeable, so the stream's running per-dim means are exact at
    any epoch cut, and :func:`finalize_drift` compares them against
    a FROZEN baseline register (the index's published per-dim means)
    — the monitor a pipeline runs on a landing embedding stream to
    catch a model-version or ingest shift BEFORE the batch mixes
    into the index (the batch key's docstring has the QA story)."""
    from labelmain_spark.functions.vectors import _micro_mean_partials

    if not os.path.exists(os.path.join(checkpoint_path, "offsets")):
        shutil.rmtree(out_path, ignore_errors=True)

    def drift_batch(batch: DataFrame, epoch_id: int) -> None:
        e = batch.select(
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "dim", "x"
            )
        )
        # one partial row per dim per epoch: collapse the per-partition
        # split (the batch is one epoch's bounded slice)
        _micro_mean_partials(e, ["dim"]).groupBy("dim").agg(
            F.sum("_n").alias("_n"), F.sum("mx").alias("mx")
        ).write.mode("overwrite").parquet(
            os.path.join(out_path, f"epoch={epoch_id}")
        )

    q = (
        vectors.writeStream.foreachBatch(drift_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def finalize_drift(
    spark: SparkSession, out_path: str, baseline: DataFrame, eps: float
) -> DataFrame:
    """Merge the per-epoch moment partials (sum-of-counts,
    sum-of-sums — exact) into per-dim stream means and flag each
    dimension against the frozen ``baseline`` (dim, base_mean):
    (dim, n, mean, delta, drift_flag). The mean math is the batch
    key's spelling (total/1e6 then /n, stable-rounded) so a stream
    cut equals the batch computation over the same rows
    bit-for-bit."""
    from labelmain_spark.operators.parity import DEC, stable_round

    total = F.sum(F.col("mx").cast(DEC)).cast("double") / F.lit(1e6)
    m = (
        _epoch_partials(spark, out_path, "dim int, _n long, mx long")
        .groupBy("dim")
        .agg(F.sum("_n").alias("n"), total.alias("_total"))
        .select(
            "dim", "n", stable_round(F.col("_total") / F.col("n"), 6).alias("mean")
        )
    )
    # FULL OUTER join (r11 advice + r12 self-review): a dimension
    # present on only ONE side is exactly the shift this monitor
    # exists to catch — stream-only dims (a model version widening the
    # embedding) AND baseline-only dims (a narrowed embedding, or an
    # ingest bug zeroing a dim's partials) both surface with NULL on
    # the missing side and a FORCED drift_flag=1, instead of being
    # silently dropped by an inner (or one-sided left) join. The one
    # legitimate empty case stays empty: a monitor that has seen ZERO
    # epochs has nothing to compare — "nothing seen yet" is an empty
    # typed frame (the zero-epoch finalizer contract), not an alarm on
    # every baseline dim. The guard is one count over the ≤ n_dims
    # merged-moment rows, not a corpus pass.
    delta = stable_round(F.col("mean") - F.col("base_mean"), 6)
    one_sided = F.col("base_mean").isNull() | F.col("mean").isNull()
    out = m.join(baseline, "dim", "full_outer").select(
        "dim",
        "n",
        "mean",
        delta.alias("delta"),
        F.when(one_sided, F.lit(1))
        .otherwise((F.abs(delta) >= F.lit(eps)).cast("int"))
        .alias("drift_flag"),
    )
    if m.count() == 0:
        return out.where(F.col("mean").isNotNull())  # empty, same schema
    return out


def run_release_sink(
    docs: DataFrame,
    prev_digests: DataFrame,
    out_path: str,
    checkpoint_path: str,
) -> None:
    """Streaming twin of the snapshot-delta family (r8 verdict item
    8 — the release-engineering loop on a stream): each micro-batch
    of the landing crawl (1) classifies against the PREVIOUS
    snapshot's digest table through
    functions/dedup.py::delta_classify — shared VERBATIM with
    corpus_delta; per-batch the join is stream-static LEFT, so only
    the cur-side statuses (added/changed/unchanged) can fire — and
    (2) lands a per-(lang, source) doc/token PARTIAL aggregate
    through functions/profile.py::slice_agg. ``removed`` rows and
    the card-drift table are STREAM-CLOSE reconciles
    (:func:`finalize_release`): a doc that never arrives cannot be
    classified until the release window closes, and drift is an
    aggregate over the whole snapshot. Same idempotent
    epoch-overwrite discipline as every sink here (foreachBatch is
    at-least-once; each epoch rewrites its OWN directory — partials
    from a replayed epoch overwrite, never double-count)."""
    from labelmain_spark.functions.dedup import delta_classify, doc_digest
    from labelmain_spark.functions.profile import slice_agg

    # r10 (advisor): the epoch-overwrite discipline is idempotent only
    # WITHIN one run — epoch= directories left by a PREVIOUS release at
    # the same out_path would be silently summed into delta/drift. A
    # fresh checkpoint means a fresh release run (stale epochs must
    # go); an existing checkpoint means a crash-resume of THIS run
    # (landed epochs are committed work availableNow will not replay —
    # keep them). Checkpoint existence is exactly that distinction.
    if not os.path.exists(os.path.join(checkpoint_path, "offsets")):
        for sub in ("delta", "parts"):
            shutil.rmtree(os.path.join(out_path, sub), ignore_errors=True)

    def release_batch(batch: DataFrame, epoch_id: int) -> None:
        cur = batch.select(
            "doc_id", "lang", "source", "text",
            doc_digest("text").alias("new_digest"),
        )
        delta_classify(
            cur.select("doc_id", "new_digest").join(prev_digests, "doc_id", "left")
        ).write.mode("overwrite").parquet(
            os.path.join(out_path, "delta", f"epoch={epoch_id}")
        )
        slice_agg(cur, "n_docs_cur", "tok_cur").write.mode("overwrite").parquet(
            os.path.join(out_path, "parts", f"epoch={epoch_id}")
        )

    q = (
        docs.writeStream.foreachBatch(release_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def finalize_release(
    spark: SparkSession,
    prev_digests: DataFrame,
    prev_agg: DataFrame,
    out_path: str,
) -> tuple[DataFrame, DataFrame]:
    """Stream-close reconcile for :func:`run_release_sink`: returns
    (delta, drift). ``removed`` = the previous snapshot's ids the
    stream never delivered, classified through the SAME
    delta_classify expression (new_digest null by construction);
    drift = functions/profile.py::drift_report over the previous
    aggregate and the order-free SUM of the landed partials —
    exactly the batch keys' values, because long sums are
    associative and the classify expression is row-local."""
    from labelmain_spark.functions.dedup import delta_classify
    from labelmain_spark.functions.profile import drift_report

    # r10 (advisor): a release window with ZERO landed batches (the
    # stream source was empty) leaves no delta/parts directories —
    # reading them unconditionally raised. Semantically an empty
    # stream is a valid release: every previous doc is `removed` and
    # the current aggregate is empty, so substitute typed empty frames.
    delta_dir = os.path.join(out_path, "delta")
    if os.path.exists(delta_dir):
        landed = spark.read.parquet(delta_dir).select(
            "doc_id", "status", "old_digest", "new_digest"
        )  # drop the epoch partition column the per-epoch layout adds
    else:
        landed = spark.createDataFrame(
            [],
            "doc_id long, status string, old_digest string, new_digest string",
        )
    removed = delta_classify(
        prev_digests.join(landed.select("doc_id"), "doc_id", "left_anti").withColumn(
            "new_digest", F.lit(None).cast("string")
        )
    )
    delta = landed.unionByName(removed)
    parts_dir = os.path.join(out_path, "parts")
    if os.path.exists(parts_dir):
        parts = spark.read.parquet(parts_dir)
    else:
        parts = spark.createDataFrame(
            [], "lang string, source string, n_docs_cur long, tok_cur long"
        )
    cur_agg = parts.groupBy("lang", "source").agg(
        F.sum("n_docs_cur").alias("n_docs_cur"),
        F.sum("tok_cur").alias("tok_cur"),
    )
    return delta, drift_report(prev_agg, cur_agg)


def run_shard_sink(
    docs: DataFrame,
    out_path: str,
    checkpoint_path: str,
) -> None:
    """Streaming shard-frontier assignment — ``shard_pack`` for an
    APPEND-ONLY corpus: a crawl lands documents continuously, and the
    export layer wants each doc's global shard assignment without
    ever re-scanning the corpus. The stream's only state is the token
    FRONTIER (one number): each micro-batch computes its in-batch
    exclusive prefix sums (the same two-level
    ``packing.exclusive_cumsum``, doc_id order within the batch),
    offsets them by the frontier, assigns
    shard = offset div SHARD_TOKENS, and advances the frontier by its
    own token total. Corpus order is (arrival epoch, doc_id) — for an
    append-only landing zone arrival order IS corpus order, and when
    files land in doc_id order the stream reproduces the batch
    ``shard_pack`` row-for-row (the parity pin).

    Idempotency: foreachBatch is at-least-once, so the frontier must
    be REPLAY-STABLE — each epoch writes its own token total under
    ``frontier/epoch=<id>`` and reads only epochs STRICTLY BELOW
    itself when rebasing (its own stale directory from a crashed
    attempt is thereby excluded), making a replayed epoch recompute
    the byte-identical assignment. The frontier read is one tiny
    summary row per prior epoch — O(epochs), never O(corpus) — which
    is what keeps the rebase constant-cost at 100 TB where re-summing
    landed docs would be a full manifest scan per batch. Same
    fresh-checkpoint-clears-stale-epochs rule as run_release_sink."""
    if not os.path.exists(os.path.join(checkpoint_path, "offsets")):
        for sub in ("assign", "frontier"):
            shutil.rmtree(os.path.join(out_path, sub), ignore_errors=True)

    def assign_batch(batch: DataFrame, epoch_id: int) -> None:
        _shard_assign_epoch(batch, out_path, epoch_id)

    q = (
        docs.writeStream.foreachBatch(assign_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _shard_assign_epoch(batch: DataFrame, out_path: str, epoch_id: int) -> None:
    """One epoch of the shard sink — module-level so the replay
    contract is directly testable: invoking the SAME epoch twice (the
    at-least-once failure mode: a crash after the writes but before
    the checkpoint commit) must rewrite byte-identical output, because
    the frontier rebase reads only epochs STRICTLY below epoch_id and
    both writes overwrite the epoch's own directories."""
    from labelmain_spark.functions.packing import SHARD_TOKENS, exclusive_cumsum

    spark_l = batch.sparkSession
    prior = _epoch_partials(
        spark_l,
        os.path.join(out_path, "frontier"),
        "batch_tokens long, epoch int",
    ).filter(F.col("epoch") < epoch_id)
    frontier = prior.agg(F.coalesce(F.sum("batch_tokens"), F.lit(0))).first()[0]
    # Persist the narrow projection OURSELVES (same plan object
    # exclusive_cumsum re-persists — a no-op) so the batch's cache
    # entry can be released after the writes; a long-running
    # stream must not accumulate one pinned frame per epoch.
    counts = batch.select(
        "doc_id",
        F.size(F.split(F.coalesce(F.col("text"), F.lit("")), " "))
        .cast("long")
        .alias("n_tokens"),
        # the doc fingerprint rides the narrow projection (the
        # shard_manifest one-pass pattern) so the INCREMENTAL manifest
        # needs no second pass over document text
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("fp"),
    ).persist()
    assigned = (
        exclusive_cumsum(counts, "doc_id", "n_tokens", "_rel")
        .select(
            "doc_id",
            "n_tokens",
            "fp",
            (F.col("_rel") + F.lit(frontier)).cast("long").alias("start_offset"),
        )
        .withColumn(
            "shard_id",
            F.expr(f"start_offset div {SHARD_TOKENS}").cast("long"),
        )
    )
    assigned.write.mode("overwrite").parquet(
        os.path.join(out_path, "assign", f"epoch={epoch_id}")
    )
    # frontier advance from the cached NARROW counts, not from
    # `assigned` — summing the assignment frame would re-run the
    # whole cumsum/offsets plan a second time per epoch
    counts.agg(
        F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("long").alias("batch_tokens")
    ).write.mode("overwrite").parquet(
        os.path.join(out_path, "frontier", f"epoch={epoch_id}")
    )
    counts.unpersist()


def finalize_shards(spark: SparkSession, out_path: str) -> DataFrame:
    """The stream's accumulated shard assignment — the batch
    ``shard_pack`` contract plus the per-doc fingerprint (bit-equal to
    the batch key when arrival order matches doc_id order; pinned by
    the streaming parity test)."""
    return _epoch_partials(
        spark,
        os.path.join(out_path, "assign"),
        "doc_id long, n_tokens long, fp string, start_offset long, shard_id long",
    )


def finalize_shard_manifest(spark: SparkSession, out_path: str) -> DataFrame:
    """The INCREMENTAL export manifest: the batch ``shard_manifest``
    aggregation (``packing.manifest_agg``, shared verbatim) over the
    stream's accumulated assignment — per-shard totals, id spans and
    content checksums WITHOUT re-scanning any document text (the
    fingerprints landed with the assignment). Only shards whose
    offsets are already covered are final; the LAST shard of the
    frontier keeps extending until the token total crosses its
    boundary — the parity test closes the stream first, which is when
    every shard is final."""
    from labelmain_spark.functions.packing import manifest_agg

    return manifest_agg(finalize_shards(spark, out_path))
