"""ML-quality benchmark for the X5-X7 classifier surface.

The reference publishes classifier quality on its real labeled corpus
(BASELINE.md: asset CV best 94.07% / test micro-precision 96.73%;
liability CV 93.01% / 94.42%; ~25 classes, HashingVectorizer(1000) +
LogisticRegression — run_build_database.py:331-332). The engine's
pipeline (ml/classifier.py) mirrors that family; this module gives it a
measurable task: a synthetic labeled line-item corpus over a
reference-style 24-class asset taxonomy, with the surface-form noise
real OCR'd balance sheets carry (suffixes, notes, glyph swaps, case),
split train/test, run through the REAL training/CV/self-training code.

Synthetic-task accuracy is not comparable to the reference's numbers on
real EDGAR text (different difficulty); the benchmark's value is (a) a
hard regression floor on the pipeline's learning capacity and (b)
end-to-end evidence that CV tuning and the self-training loop improve,
not degrade, the model. Deterministic: fixed-seed RNG, driver-side
generation (the reference's training corpus is the same scale —
tens of thousands of strings; inference, not training, is the
distributed path)."""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Reference-style asset taxonomy (24 classes, cf. BASELINE.md "24 / 25
# classes"): each class = base phrase + interchangeable head variants.
TAXONOMY: dict[str, list[str]] = {
    "Cash": ["Cash", "Cash and cash equivalents", "Cash on hand"],
    "Cash segregated": [
        "Cash segregated under federal regulations",
        "Cash segregated pursuant to federal regulations",
        "Segregated cash",
    ],
    "Receivables from customers": [
        "Receivables from customers",
        "Due from customers",
        "Customer receivables",
    ],
    "Receivables from broker-dealers": [
        "Receivables from broker-dealers",
        "Receivable from brokers and dealers",
        "Due from broker dealers and clearing organizations",
    ],
    "Securities owned": [
        "Securities owned",
        "Financial instruments owned",
        "Trading securities owned",
    ],
    "Securities borrowed": ["Securities borrowed", "Deposits for securities borrowed"],
    "Reverse repurchase agreements": [
        "Securities purchased under agreements to resell",
        "Reverse repurchase agreements",
        "Resale agreements",
    ],
    "Memberships in exchanges": [
        "Memberships in exchanges",
        "Exchange memberships",
        "Stock exchange seats owned",
    ],
    "Furniture and equipment": [
        "Furniture and equipment",
        "Furniture equipment and leasehold improvements",
        "Office furniture and fixtures",
    ],
    "Goodwill": ["Goodwill"],
    "Intangible assets": ["Intangible assets", "Other intangible assets"],
    "Other assets": ["Other assets", "Miscellaneous other assets"],
    "Loans receivable": ["Loans receivable", "Loans to officers and employees"],
    "Clearing deposits": [
        "Deposits with clearing organizations",
        "Clearing fund deposits",
        "Deposits with clearing brokers",
    ],
    "Investments in affiliates": [
        "Investments in affiliates",
        "Investment in subsidiary",
        "Investments in related parties",
    ],
    "Deferred tax assets": ["Deferred tax assets", "Deferred income taxes"],
    "Prepaid expenses": ["Prepaid expenses", "Prepaid expenses and other"],
    "Accrued interest receivable": [
        "Accrued interest receivable",
        "Interest receivable accrued",
    ],
    "Property": [
        "Property and leasehold improvements",
        "Property plant and equipment",
    ],
    "Due from affiliates": [
        "Due from affiliates",
        "Receivables from affiliated companies",
        "Due from parent and affiliates",
    ],
    "Short-term investments": [
        "Short-term investments",
        "Short term money market investments",
    ],
    "Commodity inventory": ["Commodity inventory", "Commodities owned"],
    "Notes receivable": ["Notes receivable", "Notes receivable from affiliates"],
    "Secured demand notes": [
        "Secured demand note collateral",
        "Secured demand notes receivable",
    ],
}

SUFFIXES = [
    "",
    ", net",
    ", at fair value",
    ", at market value",
    " (note 3)",
    " (see note 5)",
    " - net",
    ", net of allowance",
    ", at cost",
    " held at clearing brokers",
]

_GLYPHS = [("l", "1"), ("O", "0"), ("e", "c")]


def make_labeled_corpus(
    spark: SparkSession, per_class: int = 120, seed: int = 7
) -> DataFrame:
    """(lineitem, label) rows: per_class noisy surface forms per class.

    Noise model: head variant + optional suffix + case jitter + one
    optional OCR glyph swap — the deformations real Textract output
    shows for the same logical line item across filings."""
    rng = random.Random(seed)
    rows: list[tuple[str, str]] = []
    for label, heads in TAXONOMY.items():
        seen = set()
        while len(seen) < per_class:
            head = rng.choice(heads)
            s = head + rng.choice(SUFFIXES)
            style = rng.random()
            if style < 0.2:
                s = s.upper()
            elif style < 0.3:
                s = s.lower()
            if rng.random() < 0.25:
                a, b = rng.choice(_GLYPHS)
                if a in s:
                    i = rng.randrange(s.count(a)) + 1
                    # replace the i-th occurrence only
                    parts = s.split(a)
                    s = a.join(parts[:i]) + b + a.join(parts[i:])
            if rng.random() < 0.15:
                s = s + " " + str(rng.randrange(1990, 2022))
            if s not in seen:
                seen.add(s)
                rows.append((s, label))
    return spark.createDataFrame(rows, ["lineitem", "label"])


def split_corpus(df: DataFrame, test_frac: float = 0.2) -> tuple[DataFrame, DataFrame]:
    """Deterministic md5 split (engine/partitioning independent)."""
    bucket = F.conv(F.substring(F.md5("lineitem"), 1, 4), 16, 10).cast("int") % 100
    train = df.filter(bucket >= int(test_frac * 100))
    test = df.filter(bucket < int(test_frac * 100))
    return train, test


def evaluate(model, test: DataFrame) -> float:
    """Micro-precision (= accuracy for single-label multiclass) of the
    distributed transform on held-out surface forms."""
    from x17a5_spark.ml.classifier import predict_labels

    pred = predict_labels(model, test.select("lineitem"))
    joined = test.join(pred.withColumnRenamed("label", "pred"), "lineitem")
    agg = joined.agg(
        F.count("*").alias("n"),
        F.sum((F.col("label") == F.col("pred")).cast("int")).alias("ok"),
    ).first()
    return agg["ok"] / agg["n"]


def run_ml_benchmark(spark: SparkSession, per_class: int = 120) -> dict:
    """Train/CV/self-train on the synthetic corpus; returns metrics."""
    from x17a5_spark.ml.classifier import (
        predict_labels,
        self_training_update,
        train_lineitem_classifier,
        tune_lineitem_classifier,
    )

    corpus = make_labeled_corpus(spark, per_class=per_class)
    train, test = split_corpus(corpus)

    base_model = train_lineitem_classifier(train)
    base_acc = evaluate(base_model, test)

    cv_model, cv_metrics = tune_lineitem_classifier(train)
    cv_acc = evaluate(cv_model, test)

    # X7: hold back half the training labels, self-train on the rest
    bucket = F.conv(F.substring(F.md5("lineitem"), 5, 4), 16, 10).cast("int") % 2
    labeled = train.filter(bucket == 0)
    unlabeled = train.filter(bucket == 1).select("lineitem")
    half_model = train_lineitem_classifier(labeled)
    half_acc = evaluate(half_model, test)
    folded = self_training_update(labeled, predict_labels(half_model, unlabeled))
    self_model = train_lineitem_classifier(folded)
    self_acc = evaluate(self_model, test)

    return {
        "n_classes": len(TAXONOMY),
        "n_train": train.count(),
        "n_test": test.count(),
        "base_test_acc": round(base_acc, 4),
        "cv_best_f1": round(max(cv_metrics), 4),
        "cv_test_acc": round(cv_acc, 4),
        "half_labels_test_acc": round(half_acc, 4),
        "self_trained_test_acc": round(self_acc, 4),
    }
