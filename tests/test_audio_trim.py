"""Silence trimming: per-sample golden against a loop-wise numpy trim,
plus the boundary contracts (threshold-equal samples are active,
fully-silent clips trim to empty, undecodable rows stay NULL)."""

from __future__ import annotations

import numpy as np

from marshmallow_spark.functions.audio import ULAW_DECODE_LUT, ulaw_encode
from marshmallow_spark.functions.audio_transform import trim_silence_clips


def _pcm16(x: np.ndarray) -> bytes:
    return np.clip(np.rint(x * 32767.0), -32768, 32767).astype("<i2").tobytes()


def _loop_trim_pcm16(payload: bytes, thr: float) -> tuple[bytes, int, int]:
    x = np.frombuffer(payload, dtype="<i2").astype(np.float64) / 32768.0
    x32 = x.astype(np.float32)
    act = np.flatnonzero(np.abs(x32) >= np.float32(thr))
    if len(act) == 0:
        return b"", len(x), 0
    lo, hi = int(act[0]), int(act[-1])
    # trimming a pcm16 clip is a PURE byte slice of the kept run
    # (advice r4: the re-encode scale now matches the decode scale, so
    # decode -> cut -> encode preserves kept samples bit-for-bit)
    return payload[lo * 2 : (hi + 1) * 2], lo, len(x) - 1 - hi


def test_trim_silence_golden_and_contracts(spark):
    thr = 0.01
    sig = 0.5 * np.cos(np.linspace(0, 20, 300))  # nonzero endpoints
    pad = np.zeros(50)
    tiny = np.full(30, 0.001)          # below threshold everywhere
    exact = np.full(4, 0.01)           # exactly AT threshold -> active
    rows = [
        ("lead-tail", _pcm16(np.concatenate([pad, sig, pad])), 8000, "pcm16"),
        ("no-trim", _pcm16(sig), 8000, "pcm16"),
        ("all-silent", _pcm16(np.concatenate([pad, tiny])), 8000, "pcm16"),
        ("at-threshold", _pcm16(np.concatenate([pad, exact, pad])), 8000, "pcm16"),
        ("null-bytes", None, 8000, "pcm16"),
        ("bad-codec", _pcm16(sig), 8000, "mp3"),
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, codec string"
    )
    out = {r.clip_id: r for r in trim_silence_clips(df, threshold=thr).collect()}

    for cid, payload, _, codec in rows:
        if payload is None or codec != "pcm16":
            assert out[cid].bytes is None and out[cid].codec is None
            continue
        want_bytes, want_head, want_tail = _loop_trim_pcm16(payload, thr)
        got = out[cid]
        assert bytes(got.bytes) == want_bytes, cid
        assert (got.trimmed_head, got.trimmed_tail) == (want_head, want_tail), cid
        assert got.n_samples == len(want_bytes) // 2
        assert got.codec == "pcm16"
    assert out["no-trim"].trimmed_head == 0 and out["no-trim"].trimmed_tail == 0  # cos endpoints are active
    assert out["all-silent"].n_samples == 0 and bytes(out["all-silent"].bytes) == b""
    # threshold-equal run survives exactly
    assert out["at-threshold"].n_samples == 4


def test_trim_silence_ulaw_roundtrip(spark):
    """ulaw input decodes through the shared LUT before trimming; the
    kept run re-encodes pcm16 from the DECODED values."""
    thr = 0.02
    sig = 0.4 * np.cos(np.linspace(0, 12, 200))
    x = np.concatenate([np.zeros(40), sig, np.zeros(25)])
    # ulaw_encode takes int16-SCALE samples (it encodes the synth's
    # pcm16 stream), not [-1, 1] floats
    enc = ulaw_encode((x * 32767.0).astype(np.float32)).tobytes()
    df = spark.createDataFrame(
        [("u1", enc, 8000, "ulaw")],
        "clip_id string, bytes binary, sr_hz int, codec string",
    )
    got = trim_silence_clips(df, threshold=thr).collect()[0]
    dec = ULAW_DECODE_LUT[np.frombuffer(enc, np.uint8)].astype(np.float64) / 32768.0
    dec32 = dec.astype(np.float32)
    act = np.flatnonzero(np.abs(dec32) >= np.float32(thr))
    want = np.clip(
        np.rint(dec[act[0] : act[-1] + 1] * 32768.0), -32768, 32767
    ).astype("<i2")
    assert bytes(got.bytes) == want.tobytes()
    assert got.trimmed_head == int(act[0])


def test_trim_full_scale_samples_roundtrip_exactly():
    """Full-scale pcm16 values (32767, -32768) survive decode->encode
    unchanged (advice r4: 32767-scale encode perturbed them by 1 LSB)."""
    from marshmallow_spark.functions.audio_transform import _encode_pcm16

    s = np.array([32767, -32768, 1, -1, 0, 16384, -16385], dtype="<i2")
    dec = s.astype(np.float64) / 32768.0
    np.testing.assert_array_equal(_encode_pcm16(dec), s)


def test_binary_offset_overflow_guard():
    """A batch whose re-encoded payload exceeds int32 byte offsets must
    raise (advice r4: silently wrapped negative before) — pa.binary()
    cannot represent it."""
    import pytest

    from marshmallow_spark.functions.audio_transform import _pcm16_offsets

    ok = np.array([0, 10, 20], dtype=np.int64)
    assert _pcm16_offsets(ok).dtype == np.int32
    too_big = np.array([0, 2**30 + 1], dtype=np.int64)  # *2 > int32 max
    with pytest.raises(ValueError, match="int32 offset limit"):
        _pcm16_offsets(too_big)
