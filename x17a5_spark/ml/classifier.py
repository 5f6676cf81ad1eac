"""X5-X7 — line-item text classification as a pyspark.ml pipeline.

Reference (run_build_database.py:298-336; DatabaseStructured.py:194-202;
mlClassification.ipynb cell 5): HashingVectorizer(n_features=1000,
lowercase, word analyzer, l2 norm) feeding
LogisticRegression(C=10, class_weight='balanced', multinomial).

Spark-native equivalent: RegexTokenizer(word) -> HashingTF(1000) ->
Normalizer(L2) -> LogisticRegression(multinomial softmax). Training
data volume is tiny (tens of thousands of labelled strings), but
*inference* runs over every distinct line item in the corpus — as a
distributed PipelineModel.transform, no driver round-trip.

The self-training loop (X7, run_build_database.py:344-361: predictions
with score >= 0.85 appended to the training set) is isolated behind an
explicit function because it makes reruns non-idempotent
(SURVEY §7 hard part 8).
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import (
    HashingTF,
    IndexToString,
    Normalizer,
    RegexTokenizer,
    StringIndexer,
)
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_FEATURES = 1000
SCORE_THRESHOLD = 0.85


def build_pipeline() -> Pipeline:
    tokenizer = RegexTokenizer(
        inputCol="lineitem", outputCol="_tokens", pattern=r"\W+", toLowercase=True
    )
    tf = HashingTF(inputCol="_tokens", outputCol="_tf", numFeatures=N_FEATURES)
    norm = Normalizer(inputCol="_tf", outputCol="features", p=2.0)
    indexer = StringIndexer(inputCol="label", outputCol="_label_idx", handleInvalid="keep")
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="_label_idx",
        regParam=0.1,  # ~ C=10 in sklearn's parameterization
        family="multinomial",
        maxIter=100,
    )
    decoder = IndexToString(
        inputCol="prediction", outputCol="predicted_label", labels=[]
    )
    # decoder labels wired at fit time via the fitted StringIndexer
    return Pipeline(stages=[tokenizer, tf, norm, indexer, lr, decoder])


def train_lineitem_classifier(training: DataFrame) -> PipelineModel:
    """Fit on (lineitem string, label string)."""
    pipe = build_pipeline()
    tokenizer, tf, norm, indexer, lr, _ = pipe.getStages()
    idx_model = indexer.fit(training)
    decoder = IndexToString(
        inputCol="prediction", outputCol="predicted_label", labels=idx_model.labels
    )
    return Pipeline(stages=[tokenizer, tf, norm, idx_model, lr, decoder]).fit(training)


def predict_labels(model: PipelineModel, lineitems: DataFrame) -> DataFrame:
    """Distinct line items in, (lineitem, label, max_score) out — the
    label map consumed by operators/structured.py. A9's row-max becomes
    array_max over the probability vector."""
    need_label = "label" not in lineitems.columns
    inp = lineitems.withColumn("label", F.lit("?")) if need_label else lineitems
    scored = model.transform(inp.select("lineitem", "label").dropDuplicates(["lineitem"]))
    return scored.select(
        "lineitem",
        F.col("predicted_label").alias("label"),
        F.array_max(vector_to_array("probability")).alias("max_score"),
    )


def tune_lineitem_classifier(training: DataFrame, num_folds: int = 3):
    """X6 — CrossValidator + ParamGridBuilder, the Spark-native
    equivalent of the reference's GridSearchCV/KFold sweep
    (mlClassification.ipynb cell 5: C grid over LogisticRegression,
    f1_macro scoring). Returns (best PipelineModel, avg metrics)."""
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    tokenizer = RegexTokenizer(
        inputCol="lineitem", outputCol="_tokens", pattern=r"\W+", toLowercase=True
    )
    tf = HashingTF(inputCol="_tokens", outputCol="_tf", numFeatures=N_FEATURES)
    norm = Normalizer(inputCol="_tf", outputCol="features", p=2.0)
    indexer = StringIndexer(
        inputCol="label", outputCol="_label_idx", handleInvalid="keep"
    ).fit(training)
    lr = LogisticRegression(
        featuresCol="features", labelCol="_label_idx", family="multinomial", maxIter=50
    )
    decoder = IndexToString(
        inputCol="prediction", outputCol="predicted_label", labels=indexer.labels
    )
    pipe = Pipeline(stages=[tokenizer, tf, norm, indexer, lr, decoder])
    grid = (
        ParamGridBuilder().addGrid(lr.regParam, [0.01, 0.1, 1.0]).build()
    )
    evaluator = MulticlassClassificationEvaluator(
        labelCol="_label_idx", predictionCol="prediction", metricName="f1"
    )
    cv = CrossValidator(
        estimator=pipe,
        estimatorParamMaps=grid,
        evaluator=evaluator,
        numFolds=num_folds,
        parallelism=2,
        seed=42,
    )
    model = cv.fit(training)
    return model.bestModel, list(model.avgMetrics)


def self_training_update(
    training: DataFrame, predictions: DataFrame, threshold: float = SCORE_THRESHOLD
) -> DataFrame:
    """X7 — fold confident predictions into the training set (P7 filter
    + U1 union + U4 dedup keeping the original manual rows first)."""
    confident = predictions.filter(F.col("max_score") >= threshold).select(
        "lineitem", "label"
    )
    return (
        training.select("lineitem", "label")
        .unionByName(confident)
        .dropDuplicates(["lineitem"])
    )
