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
    # weak-label threshold = corpus median stopword ratio, folded into
    # the plan as a broadcast 1-row aggregate over the DISCRETIZED
    # cumulative histogram (the perplexity_buckets machinery — the
    # histogram is bounded by the 4-dp score space, never the corpus).
    # Replaces the r4-r6 "known, bounded" eager approxQuantile at plan
    # build: the only eager work left is .fit() itself, which IS the
    # operator. min{v : 2·cum(v) ≥ N} is an exact median definition on
    # the rounded values — integer predicate, engine-stable.
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
    labeled = (
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


QUERIES = {
    # rows-only: L-BFGS coefficients have no SQL twin; accuracy is
    # property-tested instead (tests/test_quality_model.py).
    "quality_model_score": quality_model_score,
    "quality_fasttext_score": quality_fasttext_score,
}

ORACLE: dict[str, str] = {}
