"""Multimodal binary-column plumbing: Arrow-batched mapInPandas stages
over opaque payloads (codec layer stubbed — see operators/multimodal.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row

from skyhookdb_ceph_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    extract_features,
    frame_sample,
)


@pytest.fixture()
def media(spark):
    rows = [
        Row(media_id=1, payload=b"x" * 1000),
        Row(media_id=2, payload=b"some-fake-image-bytes"),
        Row(media_id=3, payload=b""),
    ]
    return spark.createDataFrame(rows)


def test_extract_features_schema_and_determinism(spark, media):
    out = extract_features(media)
    assert out.schema == FEATURE_SCHEMA
    rows = {r.media_id: r for r in out.collect()}
    assert rows[1].n_bytes == 1000
    assert rows[2].fingerprint == hashlib.md5(b"some-fake-image-bytes").hexdigest()
    assert len(rows[2].feature) == 8
    # deterministic: re-running yields identical features
    again = {r.media_id: r for r in extract_features(media).collect()}
    assert rows[2].feature == again[2].feature


def test_extract_features_real_decode_is_stubbed(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        extract_features(media, decode_stub=False).collect()


def test_frame_sample_keeps_every_nth(spark, media):
    out = frame_sample(media, every_n=2).collect()
    frames_1 = sorted(r.frame_no for r in out if r.media_id == 1)
    assert frames_1 == [0, 2]  # 1000 bytes -> frames 0..3, keep 0 and 2
    assert all(len(r.frame) <= 256 for r in out)
