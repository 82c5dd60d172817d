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


def _png_bytes(width: int = 4, height: int = 4, value: int = 128) -> bytes:
    """Minimal valid grayscale PNG built with stdlib only (zlib + struct),
    so the conformance test needs no codec library to CREATE the input —
    only to decode it."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes([value]) * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_decoder_probe_consistent():
    """The probe and the flag must agree; with no backend the real
    decoder raises NotImplementedError (the documented stub boundary)."""
    import pytest

    from marshmallow_spark.functions import multimodal as mm

    assert mm.REAL_DECODERS_AVAILABLE == (mm.DECODER_BACKEND is not None)
    if mm.DECODER_BACKEND is None:
        with pytest.raises(NotImplementedError):
            mm._decode_image_real(b"\x00", "png")


def test_real_decode_conformance(spark):
    """Runs ONLY where a codec library is installed (import probe).
    A constant-value PNG decodes to a one-hot intensity histogram."""
    import pytest

    from marshmallow_spark.functions import multimodal as mm

    if not mm.REAL_DECODERS_AVAILABLE:
        pytest.skip("no image codec library in this environment")
    feat = mm._decode_image_real(_png_bytes(value=128), "png")
    assert feat.shape == (256,)
    assert abs(float(feat[128]) - 1.0) < 1e-6
    assert abs(float(feat.sum()) - 1.0) < 1e-6

    rows = [
        ("img-ok", _png_bytes(value=7), 4, 4, 1, "png"),
        ("img-bad", b"not a png", 4, 4, 1, "png"),
        ("img-null", None, 4, 4, 1, "png"),
    ]
    df = spark.createDataFrame(rows, mm.IMAGE_SCHEMA)
    out = {r.image_id: r for r in mm.image_features(df, feat_dim=256).collect()}
    assert out["img-ok"].decode_ok is True
    assert abs(out["img-ok"].feat[7] - 1.0) < 1e-6
    assert out["img-bad"].decode_ok is False
    assert out["img-null"].decode_ok is False
