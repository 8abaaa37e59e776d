"""Multimodal plumbing tests: binary columns, Arrow batching, feature
extraction stub, frame-sampling explode — the Spark-side shapes are real
even though the codecs are stubbed (no imaging libs in this container)."""

from __future__ import annotations

import pytest

from kingfisher_process_spark.functions import multimodal as mm


def test_feature_extraction_plumbing(spark):
    media = mm.synthetic_media(spark, n=30)
    feats = mm.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 30
    by_id = {r["media_id"]: r for r in rows}
    assert by_id[0]["n_bytes"] > 0
    assert len(by_id[0]["feature"]) == 8
    # deterministic: same content → same sha + feature
    again = {r["media_id"]: r for r in mm.extract_features(media).collect()}
    assert again[5]["content_sha"] == by_id[5]["content_sha"]
    assert again[5]["feature"] == by_id[5]["feature"]


def test_frame_sampling_explode(spark):
    media = mm.synthetic_media(spark, n=30)
    frames = mm.frame_sample(media, every_ms=1000)
    rows = frames.collect()
    assert rows, "video rows must fan out to frames"
    one = [r for r in rows if r["media_id"] == 2]
    assert [r["ts_ms"] for r in one] == [i * 1000 for i in range(len(one))]
    assert all(len(r["frame_id"]) == 32 for r in one)


def test_decode_feature_flag():
    """Without a codec the stub raises explicitly; with Pillow installed
    the same hook decodes for real (skipped-unless-available)."""
    if not mm.codec_available():
        with pytest.raises(NotImplementedError):
            mm.decode_image(b"\x89PNG")
        return
    # minimal valid 1x1 PNG
    import base64

    png = base64.b64decode(
        b"iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR4nGNg"
        b"YGAAAAAEAAH2FzhVAAAAAElFTkSuQmCC")
    img = mm.decode_image(png)
    assert img.size == (1, 1)


def test_resize_preserves_schema_and_scales_metadata(spark):
    media = mm.synthetic_media(spark, n=30)
    resized = mm.resize_images(media, max_side=256)
    assert resized.schema == media.schema  # stages compose
    rows = resized.collect()
    assert rows and all(r["kind"] == "image" for r in rows)
    assert all(max(r["width"], r["height"]) <= 256 for r in rows)
    # aspect preserved: 640x480 → 256x192
    assert rows[0]["width"] == 256 and rows[0]["height"] == 192
    # chains: a second resize is a no-op on metadata already within bounds
    twice = mm.resize_images(resized, max_side=256).collect()
    assert {(r["width"], r["height"]) for r in twice} == {(256, 192)}
