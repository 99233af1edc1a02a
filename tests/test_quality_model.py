"""Model-based quality filter: the model must actually LEARN (held-out
accuracy), not just run; splits must be disjoint and deterministic."""

from __future__ import annotations

from pyspark.sql import functions as F

from labelmain_spark.functions.quality_model import quality_model_score


def test_quality_model_learns_heldout(spark, sf_dir):
    scored = quality_model_score(spark, sf_dir).cache()
    val = scored.filter(F.col("split") == "val")
    n_val = val.count()
    assert n_val > 0
    acc = val.filter(F.col("pred") == F.col("label")).count() / n_val
    # weak task is separable (label is a threshold on one feature);
    # anything below 0.9 means the pipeline broke, not the data
    assert acc > 0.9, f"held-out accuracy {acc:.3f}"
    # probabilities are calibrated enough to rank: mean prob of kept
    # class must exceed dropped class
    m = scored.groupBy("label").agg(F.avg("prob_keep").alias("p")).collect()
    probs = {r.label: r.p for r in m}
    assert probs[1.0] > probs[0.0]
    scored.unpersist()


def test_frozen_score_agrees_with_fitted(spark, sf_dir):
    """The frozen-coefficient twin must make the same keep/drop calls
    as a fresh fit on nearly every document: both models separate on
    the dominant stopword-ratio direction, so disagreement is confined
    to the near-boundary band. Large disagreement means the frozen
    literals no longer describe the decision procedure they were
    recorded from."""
    from labelmain_spark.functions.quality_model import (
        quality_model_frozen_score,
    )

    frozen = quality_model_frozen_score(spark, sf_dir).select(
        "doc_id", F.col("pred").alias("p_frozen"), "label", "split"
    )
    fitted = quality_model_score(spark, sf_dir).select(
        "doc_id", F.col("pred").alias("p_fit")
    )
    both = frozen.join(fitted, "doc_id").cache()
    n = both.count()
    assert n > 0
    agree = both.filter(F.col("p_frozen") == F.col("p_fit")).count() / n
    assert agree > 0.9, f"frozen/fitted pred agreement {agree:.3f}"
    # the frozen scorer must itself solve the weak task (it carries the
    # same accuracy property as the fitted key, without the fit)
    val = both.filter(F.col("split") == "val")
    n_val = val.count()
    assert n_val > 0
    acc = val.filter(F.col("p_frozen") == F.col("label")).count() / n_val
    assert acc > 0.9, f"frozen held-out accuracy {acc:.3f}"
    both.unpersist()


def test_quality_model_split_deterministic(spark, sf_dir):
    a = quality_model_score(spark, sf_dir).select("doc_id", "split")
    b = quality_model_score(spark, sf_dir).select("doc_id", "split")
    assert a.exceptAll(b).count() == 0


def test_quality_fasttext_learns_heldout(spark, sf_dir):
    """The hashed-feature model must learn the weak task through 2^15
    sparse buckets: stopword identity IS representable in hashed
    unigram frequencies, so held-out accuracy below 0.9 on the
    CONFIDENT bands (outer terciles — the examples the classifier is
    trained to separate, matching how production quality classifiers
    train clear-positive vs clear-negative) means the hashing/LR
    pipeline broke. Split must agree with the dense twin (same salt)
    so the two models are comparable row-for-row."""
    from labelmain_spark.functions.quality_model import quality_fasttext_score

    scored = quality_fasttext_score(spark, sf_dir).cache()
    val = scored.filter((F.col("split") == "val") & (F.col("band") != "mid"))
    n_val = val.count()
    assert n_val > 0
    acc = val.filter(F.col("pred") == F.col("label")).count() / n_val
    assert acc > 0.9, f"held-out confident-band accuracy {acc:.3f}"
    # the scored middle band must still be covered (everyone scored)
    assert scored.filter(F.col("band") == "mid").count() > 0
    dense_split = quality_model_score(spark, sf_dir).select("doc_id", "split")
    ft_split = scored.select("doc_id", "split")
    assert ft_split.exceptAll(dense_split).count() == 0
    scored.unpersist()
