"""Regression floor for the X5-X7 classifier surface on the synthetic
reference-style line-item task (x17a5_spark/ml/benchmark.py)."""

from __future__ import annotations

from x17a5_spark.ml.benchmark import (
    evaluate,
    make_labeled_corpus,
    split_corpus,
)


def test_classifier_learns_the_taxonomy(spark):
    from x17a5_spark.ml.classifier import (
        predict_labels,
        self_training_update,
        train_lineitem_classifier,
    )

    corpus = make_labeled_corpus(spark, per_class=60)
    train, test = split_corpus(corpus)
    model = train_lineitem_classifier(train)
    acc = evaluate(model, test)
    assert acc >= 0.95, f"base accuracy regressed: {acc:.4f}"

    # X7: folding confident predictions must not degrade accuracy
    from pyspark.sql import functions as F

    bucket = (
        F.conv(F.substring(F.md5("lineitem"), 5, 4), 16, 10).cast("int") % 2
    )
    labeled = train.filter(bucket == 0)
    unlabeled = train.filter(bucket == 1).select("lineitem")
    half_model = train_lineitem_classifier(labeled)
    folded = self_training_update(
        labeled, predict_labels(half_model, unlabeled)
    )
    self_model = train_lineitem_classifier(folded)
    self_acc = evaluate(self_model, test)
    half_acc = evaluate(half_model, test)
    assert self_acc >= half_acc - 0.02, (self_acc, half_acc)
