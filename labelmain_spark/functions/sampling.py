"""Deterministic sampling & splits for training-data pipelines
(SURVEY §2.11 north-star adjunct).

``df.sample()`` draws from a per-partition RNG — resample on retry,
different rows after a repartition, and no SQL twin. Production
pipelines instead sample by KEY HASH: a row is in the sample iff
``hash(key) mod M < threshold`` — stable under retries, partitioning,
and engine (the md5-hex-digit hash from functions/sketch.py is
reproducible in DuckDB, so both sampling and splitting carry full
value-hash oracle rows). The same predicate IS the train/validation
split: disjoint threshold ranges partition the keyspace.

Scale: a narrow filter on a hash expression — no shuffle, no state,
pushes through any downstream plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from labelmain_spark.operators.parity import DEC, sql_stable_round, stable_round
from labelmain_spark.sources.readers import load_table

HASH_MOD = 10_000  # basis points of the keyspace


def _hash_bp_expr(key_col: str, engine: str, salt: str = "smp:") -> str:
    """Key → [0, HASH_MOD) via the first 4 hex digits of md5 — the same
    engine-portable instr-fold construction as the CMS bucket function
    (sketch._duck_bucket_expr / _spark_bucket_list). Distinct
    ``salt``s give independent hash draws (sampling vs mixing must not
    correlate: a doc dropped by the sampler must not be systematically
    dropped by the mixer too)."""
    cast = "CAST({c} AS STRING)" if engine == "spark" else "CAST({c} AS VARCHAR)"
    m = f"md5(concat('{salt}', {cast.format(c=key_col)}))"
    digit = "(instr('0123456789abcdef', substr({m}, {i}, 1)) - 1)"
    val = " + ".join(
        f"{digit.format(m=m, i=i + 1)} * {16 ** (3 - i)}" for i in range(4)
    )
    return f"(({val}) % {HASH_MOD})"


def _hash_hex_expr(key_col: str, engine: str, salt: str, ndigits: int) -> str:
    """First ``ndigits`` hex digits of md5(salt || key) as a BIGINT —
    the general form of ``_hash_bp_expr``'s construction (kept
    separate so the existing oracles stay byte-identical). All digit
    arithmetic is BIGINT: 8 digits reach 16⁸ ≈ 4.3e9, past INT32."""
    cast = "CAST({c} AS STRING)" if engine == "spark" else "CAST({c} AS VARCHAR)"
    m = f"md5(concat('{salt}', {cast.format(c=key_col)}))"
    digit = "CAST(instr('0123456789abcdef', substr({m}, {i}, 1)) - 1 AS BIGINT)"
    val = " + ".join(
        f"{digit.format(m=m, i=i + 1)} * {16 ** (ndigits - 1 - i)}"
        for i in range(ndigits)
    )
    return f"({val})"


def hash_sample(df: DataFrame, key_col: str, rate_bp: int) -> DataFrame:
    """Keep rows whose key hashes below rate_bp basis points."""
    return df.filter(F.expr(_hash_bp_expr(key_col, "spark")) < F.lit(rate_bp))


def train_val_split(df: DataFrame, key_col: str, val_bp: int = 1000) -> DataFrame:
    """Tag each row train/val by disjoint hash ranges (val = lowest
    val_bp basis points). Split is a COLUMN, not two DataFrames, so one
    scan serves both sides and the assignment is auditable."""
    h = F.expr(_hash_bp_expr(key_col, "spark"))
    return df.withColumn("split", F.when(h < val_bp, "val").otherwise("train"))


def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% deterministic document sample by doc_id hash."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return hash_sample(docs, "doc_id", 1000)


def split_train_val(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val assignment summary: per (split, lang) counts prove the
    split is deterministic, disjoint and complete."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        train_val_split(docs, "doc_id")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


STRATUM_N = 20


def stratified_sample(
    df: DataFrame, strata_col: str, key_col: str, n_per_stratum: int
) -> DataFrame:
    """Exactly n rows per stratum, chosen deterministically: rank by
    key hash within each stratum (key as tie-break — the 4-hex-digit
    hash has only 10k values) and keep the first n. Retry- and
    partition-stable like hash_sample, but with a HARD per-group count
    — the shape for balanced eval sets and per-language quota sampling.

    Scale: one shuffle on the stratum key + a per-stratum sort. Strata
    are bounded (languages, sources); a pathologically fat stratum
    sorts in parallel within its partitions first (window row_number
    is the standard exact-quota plan; the approximate no-sort
    alternative is hash_sample with rate = n/|stratum|)."""
    from pyspark.sql import Window as W

    h = F.expr(_hash_bp_expr(key_col, "spark"))
    w = W.partitionBy(strata_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic quota sample: STRATUM_N docs per language."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return stratified_sample(docs, "lang", "doc_id", STRATUM_N)


MIX_STEPS = 4  # per-source rates in quarter steps: 25/50/75/100%


def _mix_rate_bp(engine: str) -> str:
    """Per-source target rate in basis points, derived deterministically
    from the source id's numeric suffix (srcN → ((N mod 4)+1)·2500).
    A real pipeline joins a curated weights table instead; the derived
    rate keeps the oracle self-contained.

    Engine parity (r4 advice): both sides take the UNBOUNDED suffix and
    TRY_CAST it, so a source id outside the ``srcN`` shape yields a NULL
    rate in BOTH engines — it surfaces as a NULL-rate audit row (kept=0)
    instead of silently dropping on Spark while hard-erroring in DuckDB.
    """
    ty = "INT" if engine == "spark" else "INTEGER"
    num = f"TRY_CAST(substr(source, 4) AS {ty})"
    return f"((({num}) % {MIX_STEPS}) + 1) * {HASH_MOD // MIX_STEPS}"


def mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted source mixing — the Pile/RedPajama step that up/down-
    weights each source to its target share via deterministic hash
    sampling at a per-source rate. Output is the per-source audit
    (target rate, total, kept) proving each source lands within its
    quota; the kept rows themselves are the same filter un-aggregated.

    Scale: a narrow map-side predicate (hash + rate expression) and one
    algebraic rollup keyed by source — no shuffle before the filter, so
    at 100 TB the drop happens at scan time, upstream of everything."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    rate = F.expr(_mix_rate_bp("spark"))
    h = F.expr(_hash_bp_expr("doc_id", "spark", salt="mix:"))
    return (
        docs.select(
            "source",
            rate.cast("int").alias("rate_bp"),
            F.when(h < rate, 1).otherwise(0).alias("k"),
        )
        .groupBy("source", "rate_bp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_total"),
            F.sum("k").cast("long").alias("n_kept"),
        )
    )


def mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source RESAMPLING with replacement — the
    mT5/XLM-R mixing rule (q_s ∝ p_s^(1/T), T = 2) that UP-samples
    rare sources and down-samples dominant ones, emitting each doc
    ``floor(c_s)`` times plus one more iff its hash falls under the
    fractional remainder. ``mix_sources`` can only DROP rows
    (rate ≤ 100%); this is the with-replacement half of the mixing
    surface — the Pile/mT5 epoch-multiplier step.

    Output: per-source audit (source, n_docs, copies_bp, n_emitted)
    where copies_bp is the exact per-doc replication factor in basis
    points and n_emitted the total rows the resampled corpus carries.
    Σ n_emitted ≈ N (same-size output, redistributed).

    Determinism: sqrt totals are summed in DECIMAL (order-free across
    engines and partitionings — the parity.dsum rationale), the float
    normalization is stable_round-ed to 4 dp and converted to EXACT
    basis points via a DECIMAL(18,4)·10⁴ multiply (never float·10⁴,
    whose ulp error would flip a floor), and the extra-copy draw
    reuses the portable md5 basis-point hash with its own salt.

    Scale: two tiny aggs (per-source counts → share table, |sources|
    rows, broadcast back), then a narrow map: every doc computes its
    copy count from the broadcast row — no shuffle on the doc axis at
    all; the audit rollup is one algebraic agg keyed by source. The
    row-level resample is the same ``n_copies`` expression fed to
    ``explode(sequence(1, n_copies))`` in place of the rollup; the
    explode multiplies data volume by design (that is what
    resampling means) but adds no state and no skew beyond the
    target shares themselves."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    src = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    tot = src.agg(
        F.sum("n_s").alias("n_tot"),
        F.sum(F.sqrt(F.col("n_s")).cast(DEC)).cast("double").alias("sq_tot"),
    )
    # c_s = q_s/p_s with q_s = sqrt(n_s)/Σsqrt(n_s), p_s = n_s/N
    #     = N·sqrt(n_s) / (Σsqrt(n_s) · n_s) = N / (sq_tot · sqrt(n_s))
    c_real = F.col("n_tot") / (F.col("sq_tot") * F.sqrt(F.col("n_s")))
    shares = src.crossJoin(F.broadcast(tot)).select(
        "source",
        (
            stable_round(c_real, 4).cast("decimal(18,4)") * HASH_MOD
        ).cast("long").alias("copies_bp"),
    )
    h = F.expr(_hash_bp_expr("doc_id", "spark", salt="tmp:"))
    return (
        docs.join(F.broadcast(shares), "source")
        .select(
            "source",
            "copies_bp",
            (
                F.expr(f"copies_bp DIV {HASH_MOD}")
                + F.when(h < F.col("copies_bp") % HASH_MOD, 1).otherwise(0)
            ).alias("n_copies"),
        )
        .groupBy("source", "copies_bp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_copies").cast("long").alias("n_emitted"),
        )
        .select("source", "n_docs", "copies_bp", "n_emitted")
    )


SHUF_SALT = "shuf:"
SHUF_DIGITS = 8


def corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle — training-order randomization, the
    last pipeline stage before shard export: every document gets a
    global position in the order (portable md5 hash, doc_id), so the
    training order is reproducible from the salt alone, any position
    subrange can be re-materialized independently (training
    resume-from-step), and both engines agree on the exact
    permutation.

    Scale shape: the order key h·2³¹ + doc_id (h = first SHUF_DIGITS
    md5 hex digits ≈ 32 bits; doc_id ∈ [0, 2³¹) by the corpus id
    contract, ENFORCED in-plan — an out-of-range id raises instead of
    silently corrupting the permutation) is UNIQUE, so the global
    position is an exclusive prefix-COUNT — computed with
    packing.exclusive_cumsum's two-level machinery: per-range-bucket
    counts, a tiny recursive offset cumsum, a broadcast-back join. NO
    global sort, NO un-partitioned window; the only rows that ever
    shuffle are (okey, doc_id) pairs and per-bucket counts — payload
    text never moves. At export time the writer pays one
    ``repartitionByRange(okey)`` + ``sortWithinPartitions`` over the
    payload joined to this audit table — the position ASSIGNMENT
    never needs it.

    Oracle: DuckDB ``row_number() OVER (ORDER BY hash, doc_id)`` —
    the naive global sort this plan decomposes."""
    from labelmain_spark.functions.packing import exclusive_cumsum

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    h = F.expr(_hash_hex_expr("doc_id", "spark", SHUF_SALT, SHUF_DIGITS))
    keyed = docs.select(
        "doc_id",
        _checked_id_pack(h * F.lit(1 << 31) + F.col("doc_id")).alias("okey"),
        F.lit(1).cast("long").alias("one"),
    )
    return exclusive_cumsum(keyed, "okey", "one", "pos").select(
        F.col("pos").cast("long").alias("pos"), "doc_id"
    )


TB_SALT = "tb:"  # independent draw from shuf:/smp: (same independence rule)
TOKEN_BUDGET = 10_000


def sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sampling — mixture recipes specify TOKENS, not doc
    counts ("300B tokens of web, 50B of code"), so the sampler must
    take documents in a deterministic order until the cumulative token
    count reaches the budget: every doc whose tokens START inside the
    budget is kept (the shard_pack boundary rule), the order is the
    corpus_shuffle construction under its own salt (reproducible from
    the salt alone, retry/partition-stable, independent of the
    sampling/mixing draws), and the output carries each kept doc's
    exclusive prefix position so downstream exporters can cut exact
    token spans.

    Scale shape: the global prefix sum is packing.exclusive_cumsum's
    two-level decomposition (NO un-partitioned window), and the budget
    adds the r12 PRUNING lever: parts whose OFFSET already exceeds the
    budget are dropped at the tiny offsets table — propagated down the
    recursion — so the within-part sort/window runs only over the
    ~budget-covering prefix of parts, not the corpus. Sampling 10k
    tokens from 100 TB costs the token-count scan + per-part totals
    (one partial agg) + a window over a handful of parts; only (okey,
    n_tokens) pairs ever shuffle, payload text never moves.

    Oracle: the naive global ``SUM() OVER (ORDER BY okey)`` window +
    the same budget predicate — proving the pruned decomposition
    exact."""
    from labelmain_spark.functions.packing import exclusive_cumsum

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens")
    )
    h = F.expr(_hash_hex_expr("doc_id", "spark", TB_SALT, SHUF_DIGITS))
    keyed = docs.select(
        "doc_id",
        "n_tokens",
        _checked_id_pack(h * F.lit(1 << 31) + F.col("doc_id")).alias("okey"),
    )
    c = exclusive_cumsum(
        keyed, "okey", "n_tokens", "cum_before", prune_above=TOKEN_BUDGET
    )
    return c.filter(F.col("cum_before") < TOKEN_BUDGET).select(
        "doc_id",
        "n_tokens",
        F.col("cum_before").cast("long").alias("cum_before"),
    )


def _checked_id_pack(packed) -> "F.Column":
    """Evaluate a bit-packed order key, RAISING if doc_id breaks the
    [0, 2³¹) corpus-id contract the packing assumes — an out-of-range
    id (e.g. snapshot-prefixed 64-bit ids) would otherwise bleed into
    the hash's bit range or overflow negative and silently corrupt
    the permutation (and violate exclusive_cumsum's non-negative-key
    requirement). The guard lives INSIDE the okey expression so
    column pruning can never drop it."""
    in_range = (F.col("doc_id") >= 0) & (F.col("doc_id") < F.lit(1 << 31))
    return (
        F.when(in_range, packed)
        .otherwise(F.raise_error(F.lit("doc_id outside [0, 2^31): order-key packing would corrupt the permutation")))
        .cast("long")
    )


CURR_SALT = "curr:"
CURR_DIGITS = 7  # 28 bits — leaves room for 2 bucket bits + 31 id bits


def curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum training order — the easy→hard schedule (curriculum
    learning / quality-ordered epochs): all `head` (most fluent by
    perplexity tercile) documents first, then `middle`, then `tail`,
    SHUFFLED deterministically within each tercile so the model sees
    a random order inside a difficulty band. Output
    (pos, doc_id, bucket) — the audit table the shard exporter orders
    by, exactly like corpus_shuffle.

    Scale shape: the bucket label comes from perplexity_buckets (no
    global rank — the discretized-histogram thresholds) and the
    position from the SAME exclusive prefix-count machinery as
    corpus_shuffle, over the compound key
    (bucket_rank·2²⁸ + hash₂₈)·2³¹ + doc_id — unique, 61 bits, one
    long. NO global sort anywhere; only (okey, doc_id) pairs and
    per-bucket counts shuffle. The oracle is the naive
    row_number() OVER (ORDER BY bucket, hash, doc_id) global sort
    this plan decomposes."""
    from labelmain_spark.functions.packing import exclusive_cumsum
    from labelmain_spark.functions.text import perplexity_buckets

    b = perplexity_buckets(spark, sf_dir).select(
        "doc_id",
        "bucket",
        F.when(F.col("bucket") == "head", 0)
        .when(F.col("bucket") == "middle", 1)
        .otherwise(2)
        .alias("brank"),
    )
    h = F.expr(_hash_hex_expr("doc_id", "spark", CURR_SALT, CURR_DIGITS))
    keyed = b.select(
        "doc_id",
        "bucket",
        _checked_id_pack(
            (F.col("brank") * F.lit(1 << 28) + h) * F.lit(1 << 31) + F.col("doc_id")
        ).alias("okey"),
        F.lit(1).cast("long").alias("one"),
    )
    return exclusive_cumsum(keyed, "okey", "one", "pos").select(
        F.col("pos").cast("long").alias("pos"), "doc_id", "bucket"
    )


WSAMPLE_N = 200
WSAMPLE_SALT = "wsmp:"
_WSAMPLE_DENOM = float(16**8)


def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, deterministic: the
    Efraimidis–Spirakis (2006) A-ES scheme — each row draws a uniform
    u and ranks by u^(1/w); the top-N by that key are a weighted
    sample without replacement. Ranking by ln(u)/w is the same order
    (ln is monotone, both forms negative), numerically safer, and
    what every distributed implementation ships. Here u is NOT random
    but the portable md5 hash of the key under a dedicated salt
    (u = (h8 + 0.5) / 16^8 — the hash_sample determinism contract:
    retry-, partition- and engine-stable, independent of the sampler/
    mixer/shuffle salts), and the weight is the document length — the
    corpus-resampling shape (length-proportional token budgeting,
    DSIR-weighted selection uses the same operator with model weights).

    Scale: a narrow map computes the key; the global top-N is
    TakeOrdered (per-partition heads → single merge — no global sort,
    no range exchange). Determinism: rank on the ROUNDED key (6 dp)
    with doc_id tiebreak — a total order, so the selected SET is
    engine-exact; u's power-of-two denominator keeps (h + 0.5)/2^32
    exact in doubles."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    h = F.expr(_hash_hex_expr("doc_id", "spark", WSAMPLE_SALT, 8))
    u = (h.cast("double") + F.lit(0.5)) / F.lit(_WSAMPLE_DENOM)
    w = F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
    return (
        docs.withColumn("wkey", stable_round(F.log(u) / w, 6))
        .orderBy(F.col("wkey").desc(), F.col("doc_id").asc())
        .limit(WSAMPLE_N)
    )


GSAMPLE_K = 25
GSAMPLE_SALT = "gsmp:"


def sample_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group weighted sampling without replacement — the
    per-language quota shape (take the K best-weighted docs of EVERY
    language, not K global): Efraimidis–Spirakis keys exactly as
    :func:`sample_weighted` (deterministic u from a dedicated salt,
    length weights, rounded-key total order), ranked within each
    group.

    Scale shape — a per-lang window LOOKS like the canonical skew
    trap (a 100 TB crawl is ~half one language, and a naive group
    sort would land half the corpus on one reducer), but Catalyst's
    rank-limit pushdown makes the single-window form the optimal
    plan: the ``rk <= K`` filter compiles to ``WindowGroupLimit
    Partial`` BEFORE the exchange — every map partition forwards only
    its local top-K per lang, so the hot language's reducer receives
    ≤ K rows per upstream partition, exactly the salted two-phase
    top-K but with one shuffle instead of two (the test pins the
    Partial node so a regression to a full group sort fails loudly).
    The (wkey desc, doc_id) rank order is total, so the selected rows
    AND ranks are engine-exact."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    h = F.expr(_hash_hex_expr("doc_id", "spark", GSAMPLE_SALT, 8))
    u = (h.cast("double") + F.lit(0.5)) / F.lit(_WSAMPLE_DENOM)
    w = F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
    keyed = docs.withColumn("wkey", stable_round(F.log(u) / w, 6))
    w2 = W.partitionBy("lang").orderBy(F.col("wkey").desc(), F.col("doc_id").asc())
    return (
        keyed.withColumn("rk", F.row_number().over(w2).cast("int"))
        .filter(F.col("rk") <= GSAMPLE_K)
        .select("lang", "rk", "doc_id", "n_chars", "wkey")
    )


QUERIES = {
    "sample_hash": sample_hash,
    "sample_weighted": sample_weighted,
    "sample_group": sample_group,
    "corpus_shuffle": corpus_shuffle,
    "curriculum_order": curriculum_order,
    "split_train_val": split_train_val,
    "sample_token_budget": sample_token_budget,
    "sample_stratified": sample_stratified,
    "mix_sources": mix_sources,
    "mix_temperature": mix_temperature,
}

def _curriculum_oracle() -> str:
    # The ORACLE dict literal calls this at sampling-import time, so
    # this IS an import-time dependency on text.py — safe only while
    # text.py never imports sampling at module level (it doesn't; the
    # import lives here, not at top-of-file, to keep that constraint
    # one-directional and obvious).
    from labelmain_spark.functions import text

    return f"""
        WITH pb AS ({text.ORACLE["perplexity_buckets"]})
        SELECT CAST(ROW_NUMBER() OVER (
                   ORDER BY CASE bucket WHEN 'head' THEN 0
                                        WHEN 'middle' THEN 1
                                        ELSE 2 END ASC,
                            {_hash_hex_expr("doc_id", "duck", CURR_SALT, CURR_DIGITS)} ASC,
                            doc_id ASC
               ) - 1 AS BIGINT) AS pos,
               doc_id, bucket
        FROM pb
    """


_WSAMPLE_KEY_SQL = sql_stable_round(
    f"LN((CAST({_hash_hex_expr('doc_id', 'duck', WSAMPLE_SALT, 8)} AS DOUBLE)"
    f" + 0.5) / {_WSAMPLE_DENOM!r})"
    " / CAST(GREATEST(n_chars, 1) AS DOUBLE)",
    6,
)

_GSAMPLE_KEY_SQL = sql_stable_round(
    f"LN((CAST({_hash_hex_expr('doc_id', 'duck', GSAMPLE_SALT, 8)} AS DOUBLE)"
    f" + 0.5) / {_WSAMPLE_DENOM!r})"
    " / CAST(GREATEST(n_chars, 1) AS DOUBLE)",
    6,
)

ORACLE = {
    # single plain per-group window — an independent path to the same
    # rows the salted two-phase plan selects
    "sample_group": f"""
        SELECT lang, CAST(rk AS INTEGER) AS rk, doc_id, n_chars, wkey
        FROM (
            SELECT lang, doc_id, n_chars, wkey,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang ORDER BY wkey DESC, doc_id ASC
                   ) AS rk
            FROM (
                SELECT doc_id, lang, n_chars, {_GSAMPLE_KEY_SQL} AS wkey
                FROM documents
            )
        ) WHERE rk <= {GSAMPLE_K}
    """,
    "sample_weighted": f"""
        SELECT doc_id, lang, n_chars, {_WSAMPLE_KEY_SQL} AS wkey
        FROM documents
        ORDER BY wkey DESC, doc_id ASC
        LIMIT {WSAMPLE_N}
    """,
    "corpus_shuffle": f"""
        SELECT CAST(ROW_NUMBER() OVER (
                   ORDER BY {_hash_hex_expr("doc_id", "duck", "shuf:", 8)} ASC,
                            doc_id ASC
               ) - 1 AS BIGINT) AS pos,
               doc_id
        FROM documents
    """,
    "curriculum_order": _curriculum_oracle(),
    "sample_hash": f"""
        SELECT doc_id, lang, n_chars FROM documents
        WHERE {_hash_bp_expr("doc_id", "duck")} < 1000
    """,
    "split_train_val": f"""
        SELECT CASE WHEN {_hash_bp_expr("doc_id", "duck")} < 1000
                    THEN 'val' ELSE 'train' END AS split,
               lang, COUNT(*) AS n_docs
        FROM documents GROUP BY 1, 2
    """,
    # the naive global window the pruned two-level decomposition
    # replaces — same okey construction, same budget predicate
    "sample_token_budget": f"""
        WITH t AS (
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_tokens,
                   ({_hash_hex_expr("doc_id", "duck", TB_SALT, SHUF_DIGITS)})
                       * 2147483648 + doc_id AS okey
            FROM documents
        ), c AS (
            SELECT doc_id, n_tokens,
                   COALESCE(SUM(n_tokens) OVER (
                       ORDER BY okey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS cum_before
            FROM t
        )
        SELECT doc_id,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(cum_before AS BIGINT) AS cum_before
        FROM c WHERE cum_before < {TOKEN_BUDGET}
    """,
    "sample_stratified": f"""
        SELECT doc_id, lang, n_chars FROM (
            SELECT doc_id, lang, n_chars,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang
                       ORDER BY {_hash_bp_expr("doc_id", "duck")} ASC, doc_id ASC
                   ) AS rn
            FROM documents
        ) WHERE rn <= {STRATUM_N}
    """,
    "mix_sources": f"""
        SELECT source,
               CAST({_mix_rate_bp("duck")} AS INTEGER) AS rate_bp,
               CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(SUM(CASE WHEN {_hash_bp_expr("doc_id", "duck", salt="mix:")}
                             < {_mix_rate_bp("duck")} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        FROM documents
        GROUP BY source, {_mix_rate_bp("duck")}
    """,
    "mix_temperature": f"""
        WITH src AS (
            SELECT source, COUNT(*) AS n_s FROM documents GROUP BY source
        ),
        tot AS (
            SELECT SUM(n_s) AS n_tot,
                   CAST(SUM(CAST(sqrt(n_s) AS DECIMAL(28,6))) AS DOUBLE) AS sq_tot
            FROM src
        ),
        shares AS (
            SELECT source,
                   CAST(CAST({sql_stable_round(
                       "n_tot / (sq_tot * sqrt(n_s))", 4
                   )} AS DECIMAL(18,4)) * {HASH_MOD} AS BIGINT) AS copies_bp
            FROM src, tot
        )
        SELECT d.source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               copies_bp,
               CAST(SUM(copies_bp // {HASH_MOD}
                        + CASE WHEN {_hash_bp_expr("d.doc_id", "duck", salt="tmp:")}
                               < copies_bp % {HASH_MOD} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_emitted
        FROM documents d JOIN shares ON d.source = shares.source
        GROUP BY d.source, copies_bp
    """,
}
