"""Train the t34 model-based document quality filter and emit its
frozen integer weights (VERDICT r12 #5 — the FineWeb/DCLM-style gap:
a TRAINED classifier over corpus documents, not a hand-crafted
heuristic like t2/t23).

Reference analogy: the reference trains a HashingVectorizer ->
LogisticRegression pipeline over labelled line items
(run_build_database.py:298-336); this is the same X5 family applied
at document grain, with one twist that makes the score
ORACLE-EXPRESSIBLE: the featurizer is md5-bucket hashing (the d3/d14
md5-constant discipline — murmur3 HashingTF has no DuckDB twin) and
the trained float model is quantized to integer micro-weights whose
decision rule is exact cross-engine integer arithmetic:

    z_scaled = C0*n + sum_t W[bucket(t)] + CD*d + CL*chars

with n = token count, d = distinct tokens, chars = total token chars,
bucket(t) = (56-bit md5 prefix of t) % 64. z_scaled = 1e6 * n * z_float
up to quantization, so sign(z_scaled) == the classifier's keep/drop
decision; both engines evaluate the IDENTICAL integers.

Labelled set (deterministic, from the sf0.01 corpus):
  label 1 — the corpus documents themselves (generator English-ish);
  label 0 — two junk classes web-scale quality filters exist to kill:
    token spam   (first token repeated 60x: degenerate distinct ratio)
    hex gibberish (8 md5 words: no vocabulary overlap, 32-char tokens)

Training is pyspark.ml LogisticRegression (binomial) over the same
features the integer rule evaluates, scaled 1/n. The printed literal
block is pasted into x17a5_spark/functions/quality_model.py; in-sample
accuracy of the QUANTIZED rule is printed and pinned by
tests/test_textops_quality.py.

Usage: python tools/train_t34.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.ml.classification import LogisticRegression  # noqa: E402
from pyspark.ml.functions import array_to_vector  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from x17a5_spark.functions.text import tokens  # noqa: E402
from x17a5_spark.session import get_spark  # noqa: E402
from x17a5_spark.tables import load_table  # noqa: E402

N_BUCKETS = 64
SCALE = 1_000_000


def bucket(t):
    """56-bit md5 prefix % 64 — the oracle-expressible hash bucket."""
    return F.pmod(
        F.conv(F.substring(F.md5(t), 2, 14), 16, 10).cast("long"),
        F.lit(N_BUCKETS),
    ).cast("int")


def labelled_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokens(F.col("text"))
    spam = docs.filter(F.size(toks) >= 1).select(
        "doc_id",
        F.trim(
            F.repeat(F.concat(F.element_at(toks, 1), F.lit(" ")), 60)
        ).alias("text"),
    )
    gib = docs.select(
        "doc_id",
        F.concat_ws(
            " ",
            *[F.md5(F.concat(F.col("text"), F.lit(s))) for s in "abcdefgh"],
        ).alias("text"),
    )
    return (
        docs.withColumn("label", F.lit(1.0))
        .unionByName(spam.withColumn("label", F.lit(0.0)))
        .unionByName(gib.withColumn("label", F.lit(0.0)))
    )


def featurize(df):
    toks = tokens(F.col("text"))
    n = F.size(toks).cast("long")
    counts = F.aggregate(
        toks,
        F.array(*[F.lit(0).cast("long")] * N_BUCKETS),
        lambda acc, t: F.transform(
            acc,
            lambda v, i: F.when(i == bucket(t), v + 1).otherwise(v),
        ),
    )
    feats = F.concat(
        F.transform(counts, lambda c: c.cast("double") / n),
        F.array(
            (F.size(F.array_distinct(toks)).cast("double") / n),
            (
                F.aggregate(
                    F.transform(toks, lambda t: F.length(t).cast("long")),
                    F.lit(0).cast("long"),
                    lambda a, x: a + x,
                ).cast("double")
                / n
            ),
        ),
    )
    return df.filter(n >= 1).withColumn(
        "features", array_to_vector(feats)
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("train_t34")
    train = featurize(labelled_corpus(spark, sf_dir)).cache()
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        regParam=0.01,
        maxIter=200,
        family="binomial",
    )
    model = lr.fit(train)
    w = list(model.coefficients.toArray())
    b = float(model.intercept)
    W = [round(x * SCALE) for x in w[:N_BUCKETS]]
    CD = round(w[N_BUCKETS] * SCALE)
    CL = round(w[N_BUCKETS + 1] * SCALE)
    C0 = round(b * SCALE)

    # in-sample accuracy of the QUANTIZED integer rule (the shipped
    # decision), not the float model
    toks = tokens(F.col("text"))
    n = F.size(toks).cast("long")
    warr = F.array(*[F.lit(x).cast("long") for x in W])
    wsum = F.aggregate(
        F.transform(toks, lambda t: F.element_at(warr, bucket(t) + 1)),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    d = F.size(F.array_distinct(toks)).cast("long")
    chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    z = F.lit(C0).cast("long") * n + wsum + F.lit(CD) * d + F.lit(CL) * chars
    scored = train.withColumn("keep", (z >= 0).cast("int"))
    acc = scored.select(
        F.avg((F.col("keep") == F.col("label").cast("int")).cast("double"))
    ).first()[0]

    print(f"# trained by tools/train_t34.py on {sf_dir}")
    print(f"# quantized-rule in-sample accuracy: {acc:.4f}")
    print(f"N_BUCKETS = {N_BUCKETS}")
    print(f"C0 = {C0}")
    print(f"CD = {CD}")
    print(f"CL = {CL}")
    print(f"W = {W}")


if __name__ == "__main__":
    main()
