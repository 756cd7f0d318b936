"""Multimodal query battery: binary media columns decoded, resized,
frame-sampled, featurized (beyond-reference; the training-data pipeline
component of BASELINE.json's north star).

The synthetic codec's header fields and constant-fill payloads are pure
functions of media_id, so metadata decode, resize pooling, and frame
sampling are DuckDB-oracle-checked end to end — the binary path itself is
value-verified, not just row-counted. Feature extraction (the NN-embedding
stub) registers rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nzgmdb_spark.operators.multimodal import (
    decode_media_metadata,
    image_resize_pool,
    media_features,
    media_table,
    video_sample_frames,
)
from nzgmdb_spark.queries.registry import register
from nzgmdb_spark.tables import tbl


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_table(tbl(spark, sf_dir, "documents"))


# Header fields are pure doc_id arithmetic (see encode_fake_* in
# operators/multimodal.py): the oracle recomputes them without touching
# bytes. n_bytes checks the full container length.

M1_SQL = """
WITH ids AS (SELECT doc_id AS media_id FROM documents WHERE doc_id < 60)
SELECT media_id, 'image' AS kind,
       CAST(16 + media_id % 48 AS INT) AS width,
       CAST(16 + (media_id * 7) % 48 AS INT) AS height,
       CAST(NULL AS INT) AS sample_rate, CAST(NULL AS INT) AS n_samples,
       CAST(NULL AS INT) AS n_frames,
       CAST(8 + (16 + media_id % 48) * (16 + (media_id * 7) % 48) AS INT)
         AS n_bytes
FROM ids
UNION ALL
SELECT media_id, 'audio',
       NULL, NULL,
       CAST(CASE WHEN media_id % 2 = 0 THEN 8000 ELSE 16000 END AS INT),
       CAST(64 + (media_id * 13) % 192 AS INT),
       NULL,
       CAST(12 + 64 + (media_id * 13) % 192 AS INT)
FROM ids
UNION ALL
SELECT media_id, 'video',
       8, 8, NULL, NULL,
       CAST(8 + media_id % 24 AS INT),
       CAST(8 + (8 + media_id % 24) * 64 AS INT)
FROM ids
"""


@register("m1_media_metadata_decode", sql=M1_SQL, survey=["S9", "F11"], headline=True)
def m1_media_metadata_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_media_metadata(_media(spark, sf_dir))


# Constant-fill pixels → pooled mean is exactly media_id % 256; the pooling
# arithmetic (crop, reshape, mean) must reproduce it bit-for-bit.

M2_SQL = """
SELECT doc_id AS media_id,
       CAST(8 AS INT) AS out_w, CAST(8 AS INT) AS out_h,
       CAST(doc_id % 256 AS DOUBLE) AS mean_pixel
FROM documents WHERE doc_id < 60
"""


@register("m2_image_resize_pool", sql=M2_SQL, survey=["F11"])
def m2_image_resize_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    return image_resize_pool(_media(spark, sf_dir), out_w=8, out_h=8)


# Frame f of video m is constant-fill (m + f) % 256; sampling stride 4.

M3_SQL = """
WITH ids AS (
    SELECT doc_id AS media_id, 8 + doc_id % 24 AS nf
    FROM documents WHERE doc_id < 60
),
frames AS (
    SELECT media_id, CAST(f AS INT) AS frame_ix,
           CAST((media_id + f) % 256 AS DOUBLE) AS frame_mean
    FROM ids, LATERAL (SELECT unnest(range(0, nf, 4)) AS f)
)
SELECT media_id, frame_ix, frame_mean FROM frames
"""


@register("m3_video_frame_sample", sql=M3_SQL, survey=["F11", "S10"])
def m3_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return video_sample_frames(_media(spark, sf_dir), stride=4)


# NN-embedding stub: byte-histogram features. Deterministic but not worth
# a SQL twin — rows-only; dims and normalization pinned in tests.


@register("m4_media_feature_extract", sql=None, survey=["F11"])
def m4_media_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = media_features(_media(spark, sf_dir), dim=16)
    return feats.select(
        "media_id",
        "kind",
        F.size("feature").alias("dim"),
        F.aggregate("feature", F.lit(0.0), lambda a, x: a + x).alias("mass"),
    )
