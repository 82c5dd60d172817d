"""Multimodal binary-column plumbing: schemas, batch shapes, UDF
signatures are real; decode kernels are deterministic stand-ins."""

from marshmallow_spark.functions.multimodal import (
    IMAGE_SCHEMA,
    VIDEO_SCHEMA,
    image_features,
    sample_frames,
)


def test_image_features_shape_and_determinism(spark):
    rows = [
        ("img-1", b"\x01\x02\x03\x04" * 64, 16, 16, 1, "png"),
        ("img-2", None, 8, 8, 3, "jpg"),
    ]
    df = spark.createDataFrame(rows, IMAGE_SCHEMA)
    out1 = {r.image_id: (r.decode_ok, tuple(r.feat[:4])) for r in image_features(df).collect()}
    out2 = {r.image_id: (r.decode_ok, tuple(r.feat[:4])) for r in image_features(df).collect()}
    assert out1 == out2  # deterministic
    assert out1["img-1"][0] is True
    assert out1["img-2"][0] is False
    assert len(out1["img-1"][1]) == 4


def test_sample_frames_one_to_many(spark):
    rows = [("vid-1", bytes(range(100)), 25.0, 30, "h264")]
    df = spark.createDataFrame(rows, VIDEO_SCHEMA)
    frames = sample_frames(df, every_n=10).collect()
    assert [r.frame_index for r in frames] == [0, 10, 20]
    assert all(r.video_id == "vid-1" for r in frames)
    assert all(isinstance(r.frame_bytes, (bytes, bytearray)) for r in frames)
