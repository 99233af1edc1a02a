"""Exact duplicate-substring detection (SURVEY §2.11 north-star
adjunct) — the Lee et al. 2022 "Deduplicating Training Data Makes
Language Models Better" surface: every position opening a
``DUP_SPAN_L``-token substring that occurs ≥ 2 times anywhere in the
corpus (across OR within documents). Downstream, those spans are cut
from all-but-one occurrence; here the operator emits the span map.

Algorithm (hash prefix-doubling — the suffix-automaton-free
distributed form), on two independent 64-bit lanes:

    h_1(i)   = xxhash64(token_i)              # lane 2 mixes a literal
    h_2k(i)  = xxhash64(h_k(i), h_k(i+k))     # k = 1,2,4,8,16
    (h1_L(i), h2_L(i)) identifies position i's L-token prefix: a
    collision must hit BOTH lanes at once (~2^-128 per pair — not a
    real failure mode; r1-r4 used an md5-hex chain, replaced r5
    because 5 rounds of md5-on-64-char-concat per position were pure
    CPU churn: 5.77 s → 2.60 s on the 5× corpus from the swap alone).

Spans never cross documents, so h_k(i+k) is ``lead(h, k)`` over a
per-document window — the WHOLE log2(L)-round chain compiles to ONE
shuffle (partition by doc_id) followed by log2(L) window passes over
the same sort order (Catalyst stacks same-spec Window operators with
no re-exchange; a ``lead`` at the doc tail is null and the explicit
null guard drops those positions — they have no full L-token span).
Rows carry 16 bytes of digest — never text — vs the L× payload blowup
of materializing every L-token window string (the naive explode
carries ~L tokens per position: 32× the corpus through its shuffle).
No self-joins, no iteration state.

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


def _position_hashes(positions: DataFrame, L: int) -> DataFrame:
    """(doc_id, pos, h1, h2) where (h1, h2) identifies the L-token
    substring opening at pos — the dual-lane xxhash64 prefix-doubling
    chain: log2(L) stacked ``lead`` windows over ONE per-doc sort
    (Catalyst stacks same-spec Window operators with no re-exchange).
    Positions without a full L-token span (doc tail) are dropped.
    L must be a power of two. Shared by the corpus-wide duplicate-span
    family (L=32) and span decontamination (contamination.py, L=8)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy("pos")
    df = positions.select(
        "doc_id",
        "pos",
        F.xxhash64("tok").alias("h1"),
        F.xxhash64(F.lit(1), "tok").alias("h2"),
    )
    k = 1
    while k < L:
        # null lead at the doc tail → null h: the position has no full
        # L-token span and drops at the filter below. (xxhash64 SKIPS
        # null inputs rather than propagating them, so the guard must
        # be explicit.)
        n1, n2 = F.lead("h1", k).over(w), F.lead("h2", k).over(w)
        df = df.select(
            "doc_id",
            "pos",
            F.when(n1.isNull(), F.lit(None).cast("long"))
            .otherwise(F.xxhash64("h1", n1))
            .alias("h1"),
            F.when(n2.isNull(), F.lit(None).cast("long"))
            .otherwise(F.xxhash64(F.lit(1), "h2", n2))
            .alias("h2"),
        )
        k *= 2
    return df.filter(F.col("h1").isNotNull())


def _position_hashes_arr(spark: SparkSession, sf_dir: str, L: int) -> DataFrame:
    """(doc_id, pos, h1, h2) — the SAME dual-lane prefix-doubling
    chain as :func:`_position_hashes`, computed entirely in the
    token-ARRAY domain as a NARROW map: per-doc ``lead(h, k)`` is just
    ``slice(h, k+1, …)`` zipped against ``h``, so the whole log2(L)
    round chain compiles into one projection over the documents scan —
    ZERO shuffle before the digest group-by.

    Why this replaces the window form for the corpus-wide span family
    (r9, closing the r8 verdict's stale-×100 item): the window variant
    pays a full-corpus exchange+sort of every TOKEN row (27.5M rows at
    ×100) before its five window passes — measured 25.3 s at ×100
    while DuckDB's naive md5-per-window oracle, which shuffles only
    16-byte digests, ran 4.6 s: the span map's only REQUIRED shuffle
    is the digest group-by, and this form gets us to the same
    zero-shuffle-before-digest shape with the doubling chain's O(n
    log L) hashing (vs the naive's O(n·L) string churn). At 100 TB the
    removed exchange is the difference between shuffling the corpus
    once more and not. HOF lambdas evaluate interpreted per element
    (the bm25 note), but 2·log2(L) xxhash64 calls per token is
    hashing-bound, not lambda-bound — A/B-measured 25.3 → 7.9 s at
    ×100 (3.2×; ratio 5.51× → 1.71×/1.03× single-pass DuckDB).
    The window form remains for PRE-EXPLODED inputs (contamination's
    benchmark side)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    )
    null_l = F.lit(None).cast("long")

    def _round(h, lane2: bool, k: int):
        # h_2k(i) = xxhash64(h_k(i), h_k(i+k)); entries whose i+k runs
        # off the doc tail go null (zip_with pads the shorter side),
        # and nulls cascade — xxhash64 SKIPS null inputs rather than
        # propagating, so the guard must be explicit (the window
        # form's comment, verbatim semantics).
        shifted = F.slice(h, k + 1, F.greatest(F.size(h) - k, F.lit(0)))
        mix = (
            (lambda a, b: F.xxhash64(F.lit(1), a, b))
            if lane2
            else (lambda a, b: F.xxhash64(a, b))
        )
        return F.zip_with(
            h,
            shifted,
            lambda a, b: F.when(a.isNull() | b.isNull(), null_l).otherwise(
                mix(a, b)
            ),
        )

    h1 = F.transform("toks", lambda t: F.xxhash64(t))
    h2 = F.transform("toks", lambda t: F.xxhash64(F.lit(1), t))
    k = 1
    while k < L:
        h1, h2 = _round(h1, False, k), _round(h2, True, k)
        k *= 2
    pairs = F.zip_with(
        h1, h2, lambda a, b: F.struct(a.alias("h1"), b.alias("h2"))
    )
    return (
        docs.select("doc_id", F.posexplode(pairs).alias("pos", "h"))
        .filter(F.col("h.h1").isNotNull() & F.col("h.h2").isNotNull())
        .select("doc_id", "pos", F.col("h.h1").alias("h1"), F.col("h.h2").alias("h2"))
    )


def _covered_positions(cuts: DataFrame) -> DataFrame:
    """Merge per-doc cut intervals (doc_id, s, e) with the classic
    gaps-and-islands pattern (running max of ends over a per-doc
    ordered window; a span starting past that max opens a new island)
    and explode to (doc_id, pos) — each covered position generated
    exactly ONCE, where the raw interval explode would emit a run of
    overlapping spans up to span-length times. Shared by
    remove_duplicate_spans and decontaminate_spans."""
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy("s")
    prev_max = F.max("e").over(w.rowsBetween(W.unboundedPreceding, -1))
    islands = (
        cuts.withColumn(
            "new_island",
            F.when(prev_max.isNull() | (F.col("s") > prev_max), 1).otherwise(0),
        )
        .withColumn(
            "island",
            F.sum("new_island").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
        )
        .groupBy("doc_id", "island")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
    )
    return islands.select(
        "doc_id", F.explode(F.sequence(F.col("s"), F.col("e") - 1)).alias("pos")
    )


def _spans_and_groups(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """``spans`` = (doc_id, pos, h1, h2) for every full-span position
    (persisted — every consumer is a diamond over it); ``groups`` =
    (h1, h2, n_dups, rep_doc_id, rep_pos) for the ≥2-occurrence
    hashes, rep = globally-first occurrence. Callers must reference
    ``groups`` ONCE per output plan — it aggregates the cached spans,
    and a second reference re-runs that shuffle.

    The doubling rounds run on TWO independent xxhash64 lanes over
    LONGS (128 combined bits; group identity is the (h1, h2) pair),
    not md5 over hex strings: md5-on-64-char-concat per round cost
    ~5× DuckDB's single md5-per-window at toy scale (measured r5 —
    the Spark-vs-oracle gap on this key was mostly the chain's string
    churn: 5.77 s → 2.60 s on the 5× corpus from this change alone,
    and the Spark/DuckDB ratio crossed below 1.0 there). Lane 2
    mixes a literal into every round so the lanes never collide in
    lockstep; a birthday collision needs ~2^64 positions per lane
    pair — 16 bytes/position also halves the persisted/shuffled
    payload vs one 32-char digest."""
    spans = _position_hashes_arr(spark, sf_dir, DUP_SPAN_L).persist(
        StorageLevel.MEMORY_AND_DISK
    )

    groups = (
        spans.groupBy("h1", "h2")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dups"),
            F.min(F.struct("doc_id", "pos")).alias("rep"),
        )
        .filter(F.col("n_dups") >= 2)
        .select(
            "h1",
            "h2",
            "n_dups",
            F.col("rep.doc_id").alias("rep_doc_id"),
            F.col("rep.pos").alias("rep_pos"),
        )
    )
    return spans, groups


def duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pos, gram_md5, n_dups) for every position whose
    DUP_SPAN_L-token substring occurs ≥ 2 times in the corpus."""
    spans, groups = _spans_and_groups(spark, sf_dir)
    # Back-fill the plain-gram md5 from one representative per group:
    # the rep set is small (distinct duplicated spans), so the join
    # against the token arrays touches few docs and AQE broadcasts the
    # rep side; members then take the digest via the group key.
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    )
    reps = (
        groups.select("h1", "h2", "n_dups", F.col("rep_doc_id").alias("doc_id"), F.col("rep_pos").alias("pos"))
        .join(docs, "doc_id")
        .select(
            "h1",
            "h2",
            "n_dups",
            F.md5(
                F.array_join(F.slice("toks", F.col("pos") + 1, DUP_SPAN_L), " ")
            ).alias("gram_md5"),
        )
    )
    return spans.join(reps, ["h1", "h2"]).select("doc_id", "pos", "gram_md5", "n_dups")


def remove_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Lee-et-al step: CUT every duplicated span occurrence
    except its group's globally-first one, and reassemble each doc.

    Overlapping cut spans are merged per document with the classic
    gaps-and-islands pattern (running max of span ends over a per-doc
    ordered window; a span starting past that max opens a new island),
    so each covered token position is generated exactly ONCE by the
    interval explode — without the merge, a run of duplicated text
    emits every position up to L times. Reassembly is the paragraph-
    dedup shape: LEFT ANTI join of token positions against the covered
    set, regroup per doc in position order.

    Output: (doc_id, n_tokens, n_removed, clean_text) for every doc."""
    L = DUP_SPAN_L
    spans, groups = _spans_and_groups(spark, sf_dir)
    cuts = (
        spans.join(groups, ["h1", "h2"])
        .filter(
            ~((F.col("doc_id") == F.col("rep_doc_id")) & (F.col("pos") == F.col("rep_pos")))
        )
        .select("doc_id", F.col("pos").alias("s"), (F.col("pos") + L).alias("e"))
    )
    covered = _covered_positions(cuts)
    toks = _positions(spark, sf_dir)
    kept = toks.join(covered, ["doc_id", "pos"], "left_anti")
    out = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(pos, tok))), x -> x.tok), ' ')"
        ).alias("clean_text"),
    )
    # n_tokens = kept + covered (islands never extend past the last
    # full span start + L ≤ doc length) — no third corpus scan for a
    # per-doc total.
    cov = covered.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n_removed"))
    return (
        out.join(cov, "doc_id", "full_outer")
        .select(
            "doc_id",
            (
                F.coalesce("n_kept", F.lit(0)) + F.coalesce("n_removed", F.lit(0))
            ).cast("long").alias("n_tokens"),
            F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_removed"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


QUERIES = {
    "duplicate_spans": duplicate_spans,
    "remove_duplicate_spans": remove_duplicate_spans,
}

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
    "remove_duplicate_spans": f"""
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
        ), ranked AS (
            SELECT doc_id, pos, gram_md5,
                   COUNT(*) OVER (PARTITION BY gram_md5) AS n_occ,
                   ROW_NUMBER() OVER (
                       PARTITION BY gram_md5 ORDER BY doc_id, pos
                   ) AS rn
            FROM g
        ), cuts AS (
            SELECT doc_id, pos AS s, pos + {DUP_SPAN_L} AS e
            FROM ranked WHERE n_occ >= 2 AND rn > 1
        ), islands AS (
            SELECT doc_id, island, MIN(s) AS s, MAX(e) AS e FROM (
                SELECT doc_id, s, e,
                       SUM(CASE WHEN prev_max IS NULL OR s > prev_max
                                THEN 1 ELSE 0 END)
                           OVER (PARTITION BY doc_id ORDER BY s
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS island
                FROM (
                    SELECT doc_id, s, e,
                           MAX(e) OVER (PARTITION BY doc_id ORDER BY s
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                               AS prev_max
                    FROM cuts
                )
            ) GROUP BY doc_id, island
        ), covered AS (
            SELECT doc_id, unnest(range(s, e)) AS pos FROM islands
        ), toks AS (
            SELECT doc_id, u.pos AS pos, u.tok AS tok FROM (
                SELECT doc_id,
                       unnest(list_transform(range(len(toks)),
                           i -> {{'pos': i, 'tok': toks[i + 1]}})) AS u
                FROM t
            )
        ), kept AS (
            SELECT k.doc_id, k.pos, k.tok
            FROM toks k LEFT JOIN covered c
              ON c.doc_id = k.doc_id AND c.pos = k.pos
            WHERE c.doc_id IS NULL
        ), outp AS (
            SELECT doc_id, COUNT(*) AS n_kept,
                   string_agg(tok, ' ' ORDER BY pos) AS clean_text
            FROM kept GROUP BY doc_id
        ), cov AS (
            SELECT doc_id, COUNT(*) AS n_removed FROM covered GROUP BY doc_id
        )
        SELECT COALESCE(outp.doc_id, cov.doc_id) AS doc_id,
               CAST(COALESCE(n_kept, 0) + COALESCE(n_removed, 0) AS BIGINT) AS n_tokens,
               CAST(COALESCE(n_removed, 0) AS BIGINT) AS n_removed,
               COALESCE(clean_text, '') AS clean_text
        FROM outp FULL OUTER JOIN cov ON outp.doc_id = cov.doc_id
    """,
}
