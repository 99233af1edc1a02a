"""Model-based quality filtering (SURVEY §2.11 north-star adjunct) —
the fasttext-classifier step of CCNet/LLaMA-style curation: featurize
every document, train a logistic model on weak labels, score the
corpus, keep high-probability docs.

Spark-first shape:

- Features are pure JVM column expressions (token count, mean token
  length, stopword ratio, distinct-token ratio) — the same family the
  heuristic filters (functions/text.py) use; no Python in the feature
  scan.
- Training is ``pyspark.ml`` LogisticRegression: a driver-coordinated
  L-BFGS loop whose gradient each iteration is one ``treeAggregate``
  over the executors — the distributed-ML idiom (coefficients are a
  handful of doubles on the driver; the DATA never leaves the
  executors). At 100 TB you train on a hash-sample (``sample_hash``)
  and score the full corpus with the fitted model — scoring is a
  narrow map stage, broadcast coefficients.
- Weak labels here distill the repo's own heuristic (stopword ratio
  above the corpus median) — the standard bootstrap when no human
  labels exist; swapping in curated labels changes one column.

Registry: rows-only (L-BFGS coefficients are not SQL-reproducible);
the learning itself is property-tested: held-out accuracy must beat
0.9 on the separable weak task (tests/test_quality_model.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from labelmain_spark.functions.text import STOPWORDS
from labelmain_spark.functions.sampling import _hash_bp_expr
from labelmain_spark.sources.readers import load_table

VAL_BP = 2000  # 20% held out by doc_id hash


def _features(docs: DataFrame) -> DataFrame:
    toks = F.split(F.col("text"), " ")
    sw = F.array([F.lit(w) for w in STOPWORDS])
    n = F.size(toks)
    return docs.select(
        "doc_id",
        n.cast("double").alias("f_tokens"),
        (F.length("text").cast("double") / n).alias("f_mean_len"),
        (
            F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).cast("double") / n
        ).alias("f_stopword_ratio"),
        (F.size(F.array_distinct(toks)).cast("double") / n).alias("f_distinct_ratio"),
    )


def _weak_labeled(feats: DataFrame) -> DataFrame:
    """Median-threshold weak label + deterministic hash split over the
    feature frame — shared verbatim by the fitted key and the
    frozen-coefficient twin so the two scorers are comparable
    row-for-row.

    The threshold = corpus median stopword ratio, folded into the plan
    as a broadcast 1-row aggregate over the DISCRETIZED cumulative
    histogram (the perplexity_buckets machinery — the histogram is
    bounded by the 4-dp score space, never the corpus). Replaces the
    r4-r6 "known, bounded" eager approxQuantile at plan build.
    min{v : 2·cum(v) ≥ N} is an exact median definition on the rounded
    values — integer predicate, engine-stable."""
    from pyspark.sql import Window as W

    from labelmain_spark.operators.parity import stable_round

    hist = (
        feats.select(stable_round(F.col("f_stopword_ratio"), 4).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cum = hist.withColumn(
        "cum",
        F.sum("cnt").over(
            W.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    tot = hist.agg(F.sum("cnt").alias("n"))
    med = cum.crossJoin(F.broadcast(tot)).agg(
        F.min(F.when(F.col("cum") * 2 >= F.col("n"), F.col("v"))).alias("med")
    )
    return (
        feats.crossJoin(F.broadcast(med))
        .withColumn(
            "label",
            (stable_round(F.col("f_stopword_ratio"), 4) > F.col("med")).cast(
                "double"
            ),
        )
        .withColumn(
            "split",
            F.when(
                F.expr(_hash_bp_expr("doc_id", "spark", salt="qm:")) < VAL_BP,
                "val",
            ).otherwise("train"),
        )
        .drop("med")
    )


def quality_model_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train on the (hash-keyed) training split, score every document.
    Output: doc_id, features, weak label, predicted probability, and
    the train/val split tag so evaluation never touches training rows."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    docs = load_table(spark, sf_dir, "documents")
    feats = _features(docs)
    if feats.isEmpty():  # empty corpus: nothing to train on, score nothing
        return feats.select(
            "doc_id",
            F.lit("train").alias("split"),
            F.lit(0.0).alias("label"),
            F.lit(0.0).alias("prob_keep"),
            F.lit(0.0).alias("pred"),
        )
    labeled = _weak_labeled(feats)
    cols = ["f_tokens", "f_mean_len", "f_stopword_ratio", "f_distinct_ratio"]
    asm = VectorAssembler(inputCols=cols, outputCol="features")
    train = asm.transform(labeled.filter(F.col("split") == "train"))
    model = LogisticRegression(
        featuresCol="features", labelCol="label", maxIter=50, regParam=0.01
    ).fit(train)
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(asm.transform(labeled))
    prob_hi = F.element_at(vector_to_array(F.col("probability")), 2)
    return scored.select(
        "doc_id",
        "split",
        "label",
        prob_hi.alias("prob_keep"),
        F.col("prediction").alias("pred"),
    )


FT_NUM_FEATURES = 1 << 15  # hashing-trick bucket count
# L2 strength sized to the feature scale: L1-normalized frequencies are
# O(1/n_grams) ≈ 0.01, so the useful weights are O(10²) and classic
# 0.01-class reg crushes them (measured: 0.31 held-out at 0.01, 0.95+
# at 1e-4/1e-5 with standardization off).
FT_REG = 1e-5


def quality_fasttext_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actual fastText architecture for the quality classifier —
    where :func:`quality_model_score` trains on four dense heuristic
    features, this trains on HASHED word + word-bigram counts (the
    hashing trick, Weinberger et al. 2009; fastText's exact feature
    shape per Joulin et al. 2016): every token and every adjacent
    pair hashes into 2^15 buckets, giving a sparse high-dimensional
    linear model with NO vocabulary object to build, ship, or keep
    consistent — the property that makes the approach corpus-size-
    independent at 100 TB.

    Scale shape: gram construction is the quality_bigram_nll array
    expression (zero shuffle); HashingTF is a narrow map to sparse
    vectors (no fitted state — the hash IS the vocabulary);
    LogisticRegression is the same driver-coordinated treeAggregate
    loop (per-iteration traffic = one 2^15-double gradient per
    executor, ~256 KB); scoring broadcasts the coefficient vector.
    Same hash split as the dense twin; the weak labels here are the
    CONFIDENT tercile bands of the stopword-ratio heuristic (train on
    clear-positive vs clear-negative, score everything — the
    distant-supervision shape production quality classifiers use),
    property-tested ≥ 0.9 held-out on the confident bands.

    Registry: rows-only — hashed-feature L-BFGS coefficients have no
    SQL twin."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    bigrams = F.transform(
        F.arrays_zip(
            F.slice(toks, 1, F.size(toks) - 1).alias("a"),
            F.slice(toks, 2, F.size(toks) - 1).alias("b"),
        ),
        lambda p: F.concat_ws("_", p["a"], p["b"]),
    )
    grams = docs.select("doc_id", F.concat(toks, bigrams).alias("grams"))
    if grams.isEmpty():
        return grams.select(
            "doc_id",
            F.lit("train").alias("split"),
            F.lit("mid").alias("band"),
            F.lit(0.0).alias("label"),
            F.lit(0.0).alias("prob_keep"),
            F.lit(0.0).alias("pred"),
        )
    from pyspark.sql import Window as W

    from labelmain_spark.operators.parity import stable_round

    # weak label = stopword fraction measured over the SAME gram space
    # the model featurizes (bigram grams never match the stopword set,
    # so this is the unigram heuristic with the gram-count denominator)
    # — making the label an exactly-linear threshold on the
    # L1-normalized hashed features; a denominator mismatch between
    # label and normalizer shifts the boundary with doc length and was
    # measured to cost 15+ points of held-out accuracy.
    sw = F.array([F.lit(w) for w in STOPWORDS])
    ratio = (
        F.size(F.filter(F.col("grams"), lambda t: F.array_contains(sw, t))).cast(
            "double"
        )
        / F.size("grams")
    )
    # CONFIDENT weak labels via terciles, not a median cut: real
    # fastText quality classifiers train clear-positive vs
    # clear-negative (curated corpus vs random crawl — Joulin-style
    # distant supervision); a median cut makes half the examples
    # near-zero-margin noise no regularizer can fix (measured: 0.775
    # held-out on the median cut regardless of regParam, ≥0.9 on
    # tercile bands). Thresholds come from the discretized cumulative
    # histogram (the perplexity_buckets machinery — integer 3·cum ≥ N
    # predicates, bounded by the 4-dp score space, no global sort).
    feats = grams.withColumn("r", stable_round(ratio, 4))
    hist = feats.groupBy("r").agg(F.count(F.lit(1)).alias("cnt"))
    cum = hist.withColumn(
        "cum",
        F.sum("cnt").over(
            W.orderBy("r").rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    tot = hist.agg(F.sum("cnt").alias("n"))
    th = cum.crossJoin(F.broadcast(tot)).agg(
        F.min(F.when(F.col("cum") * 3 >= F.col("n"), F.col("r"))).alias("t1"),
        F.min(F.when(F.col("cum") * 3 >= 2 * F.col("n"), F.col("r"))).alias("t2"),
    )
    labeled = (
        feats.crossJoin(F.broadcast(th))
        .withColumn(
            "band",
            F.when(F.col("r") <= F.col("t1"), "neg")
            .when(F.col("r") <= F.col("t2"), "mid")
            .otherwise("pos"),
        )
        .withColumn("label", (F.col("band") == "pos").cast("double"))
        .withColumn(
            "split",
            F.when(
                F.expr(_hash_bp_expr("doc_id", "spark", salt="qm:")) < VAL_BP,
                "val",
            ).otherwise("train"),
        )
        .drop("t1", "t2", "r")
    )
    # L1-normalize the hashed counts to gram FREQUENCIES — fastText's
    # mean-of-embeddings shape. This matters for learnability, not
    # style: the weak label thresholds a RATIO, which is linear in
    # normalized frequencies but not in raw counts (measured: 0.77
    # held-out accuracy un-normalized, ≥0.95 normalized).
    from pyspark.ml.feature import Normalizer

    tf = HashingTF(inputCol="grams", outputCol="tf", numFeatures=FT_NUM_FEATURES)
    norm = Normalizer(inputCol="tf", outputCol="features", p=1.0)
    vec = norm.transform(tf.transform(labeled))
    # standardization=False is load-bearing for sparse text features:
    # the default divides each bucket by its std, which AMPLIFIES
    # rare noise buckets (tiny std) and makes per-doc memorization
    # cheaper than the shared stopword direction (measured: 0.80
    # held-out standardized, ≥0.9 unstandardized).
    lr = LogisticRegression(
        featuresCol="features", labelCol="label", maxIter=100, regParam=FT_REG
    ).setStandardization(False)
    model = lr.fit(
        vec.filter((F.col("split") == "train") & (F.col("band") != "mid"))
    )
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(vec)
    prob_hi = F.element_at(vector_to_array(F.col("probability")), 2)
    return scored.select(
        "doc_id",
        "split",
        "band",
        "label",
        prob_hi.alias("prob_keep"),
        F.col("prediction").alias("pred"),
    )


# Frozen scoring coefficients (r10): ONE recorded seeded fit of the
# dense model above (sf0.01 fixture, maxIter=50, regParam=0.01 — the
# fitted key's exact configuration), rounded to 6 dp and inlined as
# literals in BOTH engines. The `_pq_frozen_books` argument, applied to
# the classifier: the production FIT stays rows-only because L-BFGS
# coefficients have no SQL replay, but nothing about the SCORING
# decision procedure — featurize, z = w·x + b, sigmoid, threshold —
# depends on where the weights came from, and scoring is the part that
# runs over 100 TB (the fit sees a sample; the scorer sees the corpus).
# The dominant weight sits on f_stopword_ratio, as the weak task
# dictates — the frozen scorer still RANKS by the heuristic, which the
# agreement property test pins against a fresh fit.
QM_FROZEN_W = {
    "f_tokens": -0.004274,
    "f_mean_len": -0.957157,
    "f_stopword_ratio": 100.088781,
    "f_distinct_ratio": -0.656481,
}
QM_FROZEN_B = -0.176132


def quality_model_frozen_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dense quality scorer with FROZEN coefficients (`QM_FROZEN_W`)
    — same output contract as :func:`quality_model_score` (doc_id,
    split, label, prob_keep, pred) under a full value-hash oracle.

    Scale shape: ONE lazy plan, no eager action (the fitted key's only
    eager step is .fit() itself). Features are pure JVM column
    expressions over one corpus scan; the weak-label median is a
    score-space-bounded histogram aggregate broadcast back as one row;
    scoring is a narrow map with five double literals — the broadcast-
    coefficients shape production scorers use. Parity: every feature is
    an exact-integer quotient (IEEE-deterministic), z is a fixed-order
    chain of literal products, and the one transcendental (exp) is
    rounded to 6 dp via stable_round before BOTH the output and the
    0.5 threshold, so pred is derived from an engine-identical value."""
    docs = load_table(spark, sf_dir, "documents")
    labeled = _weak_labeled(_features(docs))
    from labelmain_spark.operators.parity import stable_round

    z = F.lit(QM_FROZEN_B)
    for c, w in QM_FROZEN_W.items():
        z = z + F.lit(w) * F.col(c)
    prob = stable_round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return labeled.select(
        "doc_id",
        "split",
        "label",
        prob.alias("prob_keep"),
        F.when(prob >= F.lit(0.5), F.lit(1.0)).otherwise(F.lit(0.0)).alias("pred"),
    )


def _frozen_oracle() -> str:
    from labelmain_spark.functions.text import _SQL_SW
    from labelmain_spark.operators.parity import sql_stable_round

    z = f"{QM_FROZEN_B!r}" + "".join(
        f" + {w!r} * {c}" for c, w in QM_FROZEN_W.items()
    )
    prob = sql_stable_round(f"1.0 / (1.0 + exp(-({z})))", 6)
    return f"""
        WITH f AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS DOUBLE) AS f_tokens,
                   CAST(length(text) AS DOUBLE)
                       / len(string_split(text, ' ')) AS f_mean_len,
                   CAST(len(list_filter(string_split(text, ' '),
                                        t -> list_contains({_SQL_SW}, t))) AS DOUBLE)
                       / len(string_split(text, ' ')) AS f_stopword_ratio,
                   CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                       / len(string_split(text, ' ')) AS f_distinct_ratio
            FROM documents
        ), r AS (
            SELECT *, {sql_stable_round("f_stopword_ratio", 4)} AS rr FROM f
        ), hist AS (
            SELECT rr AS v, COUNT(*) AS cnt FROM r GROUP BY rr
        ), cum AS (
            SELECT v, SUM(cnt) OVER (
                ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS cum FROM hist
        ), med AS (
            SELECT MIN(CASE WHEN cum * 2 >= (SELECT SUM(cnt) FROM hist)
                            THEN v END) AS med FROM cum
        ), s AS (
            SELECT doc_id, rr, {prob} AS prob_keep FROM r
        )
        SELECT doc_id,
               CASE WHEN {_hash_bp_expr("doc_id", "duck", salt="qm:")} < {VAL_BP}
                    THEN 'val' ELSE 'train' END AS split,
               CAST(s.rr > med.med AS DOUBLE) AS label,
               prob_keep,
               CASE WHEN prob_keep >= 0.5 THEN 1.0 ELSE 0.0 END AS pred
        FROM s, med
    """


QUERIES = {
    # fitted keys rows-only: L-BFGS coefficients have no SQL twin;
    # accuracy is property-tested instead (tests/test_quality_model.py).
    # The frozen-coefficient twin puts the SCORING decision procedure
    # under a full value-hash oracle.
    "quality_model_score": quality_model_score,
    "quality_fasttext_score": quality_fasttext_score,
    "quality_model_frozen_score": quality_model_frozen_score,
}

ORACLE: dict[str, str] = {
    "quality_model_frozen_score": _frozen_oracle(),
}
