"""Multimodal plumbing: schema, Arrow batch shape, deterministic features,
frame sampling and resize planning (decode itself is stubbed)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_backup_spark import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    df = mm.synthesize_media(spark, 60)
    df.cache().count()
    return df


def test_media_schema(media):
    assert media.schema == mm.MEDIA_SCHEMA
    assert media.filter(F.col("payload").isNull()).count() == 0


def test_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x00\x01")


def test_feature_extraction_deterministic(spark, media):
    f1 = {r["media_id"]: r["feature"] for r in mm.extract_features(media).collect()}
    f2 = {r["media_id"]: r["feature"] for r in mm.extract_features(media).collect()}
    assert f1 == f2
    assert all(len(v) == mm.FEATURE_DIM for v in f1.values())
    assert all(0.0 <= x <= 1.0 for v in f1.values() for x in v)
    # python-side oracle on one row
    row = media.filter(F.col("media_id") == 3).collect()[0]
    expected = mm.byte_profile(bytes(row["payload"]))
    assert f1[3] == pytest.approx(expected, abs=1e-6)


def test_feature_bytes_match_payload_sizes(media):
    feats = mm.extract_features(media)
    joined = feats.join(media, ["media_id"]).filter(
        F.col("n_bytes") != F.octet_length("payload")
    )
    assert joined.count() == 0


def test_frame_sampling(media):
    frames = mm.sample_frames(media, every_ms=500)
    rows = frames.groupBy("media_id").count().collect()
    durations = {
        r["media_id"]: r["duration_ms"]
        for r in media.filter(F.col("kind") == "video").collect()
    }
    assert set(durations) == {r["media_id"] for r in rows}
    for r in rows:
        # sequence(0, d-1, step) → ceil(d / step) frames
        d = durations[r["media_id"]]
        assert r["count"] == (d + 499) // 500


def test_resize_plan_preserves_aspect(media):
    plan = mm.resize_plan(media, max_side=32)
    for r in plan.collect():
        assert max(r["target_width"], r["target_height"]) <= 32
        # aspect preserved within rounding
        assert abs(
            r["target_width"] / r["target_height"] - r["width"] / r["height"]
        ) < 0.1


def test_feature_u32_slots_exact(spark):
    """u32 slots are the integer core of byte_profile: exact sha256-derived,
    reproducible across engines (the oracle face of the extractor)."""
    import hashlib

    from kafka_backup_spark.multimodal import FEATURE_DIM, feature_u32_slots, synthesize_media

    media = synthesize_media(spark, n=9)
    got = {r["media_id"]: r for r in feature_u32_slots(media).collect()}
    assert len(got) == 9
    for i in (0, 4, 8):
        seed = hashlib.sha256(f"media-{i}".encode()).digest()
        payload = (seed * ((64 + i) // len(seed) + 1))[: 64 + i]
        digest = hashlib.sha256(payload).digest()
        expect = [int.from_bytes(digest[4 * j : 4 * j + 4], "little") for j in range(FEATURE_DIM)]
        assert list(got[i]["feature_u32"]) == expect
        assert got[i]["n_bytes"] == 64 + i
