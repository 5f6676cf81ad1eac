"""ML operator surface (SURVEY.md §2.10 X5-X8)."""

from x17a5_spark.ml.classifier import (
    predict_labels,
    self_training_update,
    train_lineitem_classifier,
)

__all__ = ["predict_labels", "self_training_update", "train_lineitem_classifier"]
