"""X8 — TF-IDF + KMeans / LDA clustering (reference
notebook/ml-model/mlClustering.ipynb cells 8-25: exploratory lineitem
clustering and topic labeling), as pyspark.ml pipelines.

Also serves the embeddings table directly: KMeans over the vector
column is the IVF coarse quantizer for the similarity-search scale
path (cluster centroids = inverted-list keys).
"""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.ml.clustering import KMeans, LDA
from pyspark.ml.feature import IDF, HashingTF, RegexTokenizer
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cluster_lineitems(texts: DataFrame, k: int = 8, seed: int = 42) -> DataFrame:
    """TF-IDF + KMeans over (lineitem string) -> (lineitem, cluster)."""
    pipe = Pipeline(
        stages=[
            RegexTokenizer(
                inputCol="lineitem", outputCol="_tok", pattern=r"\W+", toLowercase=True
            ),
            HashingTF(inputCol="_tok", outputCol="_tf", numFeatures=256),
            IDF(inputCol="_tf", outputCol="features"),
            KMeans(k=k, seed=seed, featuresCol="features", predictionCol="cluster"),
        ]
    )
    model = pipe.fit(texts)
    return model.transform(texts).select("lineitem", "cluster")


def topic_model_lineitems(texts: DataFrame, k: int = 5, seed: int = 42):
    """LDA topics over lineitem text; returns (model, transformed)."""
    prep = Pipeline(
        stages=[
            RegexTokenizer(
                inputCol="lineitem", outputCol="_tok", pattern=r"\W+", toLowercase=True
            ),
            HashingTF(inputCol="_tok", outputCol="features", numFeatures=256),
        ]
    ).fit(texts)
    feats = prep.transform(texts)
    lda = LDA(k=k, seed=seed, maxIter=10, featuresCol="features").fit(feats)
    return lda, lda.transform(feats)


def ivf_assign(embeddings: DataFrame, k: int = 16, seed: int = 42) -> DataFrame:
    """IVF coarse quantization of the embeddings table: KMeans over the
    vector column; output (vec_id, ivf_cell). At query time an ANN probe
    searches only the nearest cells — the centroid table is tiny and
    broadcast."""
    vecs = embeddings.select(
        "vec_id",
        array_to_vector(
            F.transform(F.col("embedding"), lambda x: x.cast("double"))
        ).alias("features"),
    )
    model = KMeans(
        k=k, seed=seed, featuresCol="features", predictionCol="ivf_cell"
    ).fit(vecs)
    return model.transform(vecs).select("vec_id", "ivf_cell")
