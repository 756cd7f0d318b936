"""Tests for the multimodal binary-column operators (the oracle battery
covers metadata/resize/frame-sample values; these pin the codec, the
feature stub, and the corrupt-input path)."""

from __future__ import annotations

import numpy as np
import pytest

from nzgmdb_spark.operators.multimodal import (
    decode_media_metadata,
    encode_fake_audio,
    encode_fake_image,
    encode_fake_video,
    media_features,
)


def test_codec_roundtrip_shapes():
    img = encode_fake_image(37)
    assert img[:4] == b"IMG0"
    w, h = 16 + 37 % 48, 16 + (37 * 7) % 48
    assert len(img) == 8 + w * h
    aud = encode_fake_audio(37)
    assert len(aud) == 12 + (64 + 37 * 13 % 192)
    vid = encode_fake_video(37)
    assert len(vid) == 8 + (8 + 37 % 24) * 64


def test_corrupt_blob_fails_loudly(spark):
    bad = spark.createDataFrame(
        [(1, "image", bytearray(b"XXXX1234"))],
        "media_id bigint, kind string, content binary",
    )
    with pytest.raises(Exception, match="bad magic"):
        decode_media_metadata(bad).collect()


def test_feature_histogram_normalized(spark):
    media = spark.createDataFrame(
        [(1, "image", bytearray(encode_fake_image(1))),
         (2, "audio", bytearray(encode_fake_audio(2)))],
        "media_id bigint, kind string, content binary",
    )
    rows = media_features(media, dim=8).collect()
    for r in rows:
        feat = np.array(r.feature)
        assert len(feat) == 8
        assert abs(feat.sum() - 1.0) < 1e-12  # histogram over all bytes
        assert (feat >= 0).all()
