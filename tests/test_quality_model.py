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


def test_quality_model_split_deterministic(spark, sf_dir):
    a = quality_model_score(spark, sf_dir).select("doc_id", "split")
    b = quality_model_score(spark, sf_dir).select("doc_id", "split")
    assert a.exceptAll(b).count() == 0
