"""Multimodal-column queries: binary media + typed metadata through the
``mapInPandas`` decode plumbing (sources/multimodal.py), oracle-checked.

The container has no codec libraries, so media blobs are synthesized in
the engine's own fake ``IMG|w|h|payload`` format deterministically from
``documents`` — in BOTH engines — and the decode stage's outputs
(dimensions, byte size, error routing) are therefore closed-form for
the oracle. What the hash match proves: binary columns survive the
Arrow round-trip intact, the mapInPandas schema contract holds, and
bad blobs land in the error channel instead of failing the stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from x17a5_spark.sources.multimodal import decode_metadata, extract_features
from x17a5_spark.tables import load_table


def _fake_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = ((F.col("doc_id") % 16) + 1) * 64
    h = ((F.col("doc_id") % 9) + 1) * 64
    good = F.concat_ws(
        "|", F.lit("IMG"), w.cast("string"), h.cast("string"), F.substring("text", 1, 64)
    )
    # every 13th blob lacks the IMG| header -> must route to error, not fail
    blob = F.when(F.col("doc_id") % 13 == 0, F.substring("text", 1, 32)).otherwise(good)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(blob, "UTF-8").alias("media"),
    )


# M1 — decode/metadata extraction over binary media columns.
def m1_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = decode_metadata(_fake_media(spark, sf_dir))
    return out.select(
        "media_id",
        "width",
        "height",
        "n_bytes",
        F.col("error").isNotNull().alias("failed"),
    )


M1_SQL = """
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 13 = 0 THEN NULL
            ELSE CAST(((doc_id % 16) + 1) * 64 AS INT) END AS width,
       CASE WHEN doc_id % 13 = 0 THEN NULL
            ELSE CAST(((doc_id % 9) + 1) * 64 AS INT) END AS height,
       CASE WHEN doc_id % 13 = 0 THEN strlen(substr(text, 1, 32))
            ELSE strlen('IMG|' || CAST(((doc_id % 16) + 1) * 64 AS VARCHAR)
                        || '|' || CAST(((doc_id % 9) + 1) * 64 AS VARCHAR)
                        || '|' || substr(text, 1, 64)) END AS n_bytes,
       doc_id % 13 = 0 AS failed
FROM documents
"""


# M2 — deterministic feature extraction (byte-histogram embedding): the
# mapInPandas batch contract a real vision/audio model would use, with
# the fold-to-dim histogram recomputed closed-form by the oracle over
# the same UTF-8 bytes. unnest+ord in DuckDB == Python byte iteration.
def m2_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = extract_features(_fake_media(spark, sf_dir), dim=4)
    return feats.select(
        "media_id",
        F.round(F.element_at("feature", 1), 6).alias("f1"),
        F.round(F.element_at("feature", 2), 6).alias("f2"),
        F.round(F.element_at("feature", 3), 6).alias("f3"),
        F.round(F.element_at("feature", 4), 6).alias("f4"),
    )


# The corpus text is ASCII (asserted by the oracle matching at all:
# ord(char) == byte value only then), so DuckDB can re-derive the byte
# histogram with per-character ord() over the same constructed blob.
M2_SQL = """
WITH blobs AS (
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 13 = 0 THEN substr(text, 1, 32)
              ELSE 'IMG|' || CAST(((doc_id % 16) + 1) * 64 AS VARCHAR)
                   || '|' || CAST(((doc_id % 9) + 1) * 64 AS VARCHAR)
                   || '|' || substr(text, 1, 64) END AS s
  FROM documents
),
codes AS (
  SELECT media_id,
         list_transform(range(1, strlen(s) + 1), i -> ord(substr(s, i, 1))) AS cs
  FROM blobs
)
SELECT media_id,
       round(len(list_filter(cs, c -> c % 4 = 0)) / greatest(len(cs), 1), 6) AS f1,
       round(len(list_filter(cs, c -> c % 4 = 1)) / greatest(len(cs), 1), 6) AS f2,
       round(len(list_filter(cs, c -> c % 4 = 2)) / greatest(len(cs), 1), 6) AS f3,
       round(len(list_filter(cs, c -> c % 4 = 3)) / greatest(len(cs), 1), 6) AS f4
FROM codes
"""


# M3 — REAL codec round trip, hash-checked: the kernel zlib-ENCODES a
# constant-color Up-filtered PNG per document (sources/multimodal.py::
# encode_png_constant), the pixel-stats stage zlib-DECODES it through
# the full scanline unfilter, and the oracle derives the expected
# dimensions and per-channel means closed-form from the plant
# parameters — so a hash match proves the entire binary codec path
# (encode -> Arrow round-trip -> inflate -> unfilter -> stats), not a
# stub. Every 13th blob is junk and must route to the error channel.
def m3_png_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from x17a5_spark.sources.multimodal import (
        encode_png_constant,
        extract_pixel_stats,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        F.col("doc_id").alias("media_id"),
        (2 + F.col("doc_id") % 7).cast("int").alias("w"),
        (2 + F.col("doc_id") % 5).cast("int").alias("h"),
        (F.col("doc_id") % 256).cast("int").alias("r"),
        ((F.col("doc_id") * 7) % 256).cast("int").alias("g"),
        ((F.col("doc_id") * 13) % 256).cast("int").alias("b"),
    )

    def enc(batches):
        for pdf in batches:
            medias = [
                b"junk"
                if mid % 13 == 0
                else encode_png_constant(int(w), int(h), (int(r), int(g), int(b)))
                for mid, w, h, r, g, b in zip(
                    pdf["media_id"], pdf["w"], pdf["h"], pdf["r"], pdf["g"], pdf["b"]
                )
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": "image", "media": medias}
            )

    media = base.mapInPandas(enc, "media_id bigint, kind string, media binary")
    stats = extract_pixel_stats(media)
    return stats.select(
        "media_id",
        "width",
        "height",
        "channels",
        F.round(F.element_at("mean", 1), 6).alias("mean_r"),
        F.round(F.element_at("mean", 2), 6).alias("mean_g"),
        F.round(F.element_at("mean", 3), 6).alias("mean_b"),
        F.col("error").isNotNull().alias("failed"),
    )


M3_SQL = """
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 13 = 0 THEN NULL
            ELSE CAST(2 + doc_id % 7 AS INT) END AS width,
       CASE WHEN doc_id % 13 = 0 THEN NULL
            ELSE CAST(2 + doc_id % 5 AS INT) END AS height,
       CASE WHEN doc_id % 13 = 0 THEN NULL ELSE CAST(3 AS INT) END AS channels,
       CASE WHEN doc_id % 13 = 0 THEN NULL
            ELSE round((doc_id % 256) / 255.0, 6) END AS mean_r,
       CASE WHEN doc_id % 13 = 0 THEN NULL
            ELSE round(((doc_id * 7) % 256) / 255.0, 6) END AS mean_g,
       CASE WHEN doc_id % 13 = 0 THEN NULL
            ELSE round(((doc_id * 13) % 256) / 255.0, 6) END AS mean_b,
       doc_id % 13 = 0 AS failed
FROM documents
"""


QUERIES = {
    "m1_multimodal_decode": m1_multimodal_decode,
    "m2_multimodal_features": m2_multimodal_features,
    "m3_png_pixel_stats": m3_png_pixel_stats,
}

ORACLES = {
    "m1_multimodal_decode": M1_SQL,
    "m2_multimodal_features": M2_SQL,
    "m3_png_pixel_stats": M3_SQL,
}
