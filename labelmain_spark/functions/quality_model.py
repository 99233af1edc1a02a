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


QUERIES = {
    # rows-only: L-BFGS coefficients have no SQL twin; accuracy is
    # property-tested instead (tests/test_quality_model.py).
    "quality_model_score": quality_model_score,
}

ORACLE: dict[str, str] = {}
