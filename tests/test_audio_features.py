"""Spectral features: golden-pinned against a per-clip numpy loop, and
physically validated — the dominant frequency must recover each synth
clip's known tone (110*(1+idx%40) Hz), including the alias fold for
tones above Nyquist at low sample rates."""

from __future__ import annotations

import numpy as np
import pytest

from marshmallow_spark.functions.audio import (
    ALAW_DECODE_LUT,
    SAMPLE_WIDTH,
    ULAW_DECODE_LUT,
)
from marshmallow_spark.functions.audio_features import (
    N_FFT_DEFAULT,
    spectral_features,
)
from marshmallow_spark.sources.synth import synth_clips


def _loop_reference(payload: bytes, codec: str, sr: int, n_fft: int):
    """Per-clip loop-wise reimplementation of the batched kernel."""
    width = SAMPLE_WIDTH[codec]
    usable = (len(payload) // width) * width
    if usable == 0:
        return None
    if codec == "pcm16":
        x = np.frombuffer(payload[:usable], dtype="<i2").astype(np.float64)
    else:
        lut = ULAW_DECODE_LUT if codec == "ulaw" else ALAW_DECODE_LUT
        x = lut[np.frombuffer(payload[:usable], dtype=np.uint8)].astype(
            np.float64
        )
    x = x / 32768.0
    # batched kernel decodes to float32 then widens — mirror that
    x = x.astype(np.float32).astype(np.float64)
    head = x[:n_fft]
    frame = np.zeros(n_fft)
    frame[: len(head)] = head
    frame *= np.hanning(n_fft)
    spec = np.abs(np.fft.rfft(frame))
    body = spec[1:]
    dom = (int(np.argmax(body)) + 1) * sr / n_fft
    cent = float(
        (body * np.arange(1, len(spec))).sum() / max(body.sum(), 1e-30)
    ) * sr / n_fft
    return len(head), dom, cent


def test_spectral_features_golden_vs_loop(spark):
    df = synth_clips(spark, 300, num_partitions=4)
    rows = {r.clip_id: r for r in df.collect()}
    out = {r.clip_id: r for r in spectral_features(df).collect()}
    assert set(out) == set(rows)
    checked = 0
    for cid, src in rows.items():
        got = out[cid]
        if (
            src.bytes is None
            or src.codec not in SAMPLE_WIDTH
            or len(src.bytes) < SAMPLE_WIDTH[src.codec]
        ):
            assert got.dominant_freq_hz is None
            assert got.spectral_centroid_hz is None
            continue
        want = _loop_reference(
            bytes(src.bytes), src.codec, src.sr_hz, N_FFT_DEFAULT
        )
        assert got.n_head == want[0]
        assert got.dominant_freq_hz == pytest.approx(want[1], abs=1e-9)
        assert got.spectral_centroid_hz == pytest.approx(want[2], rel=1e-9)
        checked += 1
    assert checked > 250


def test_dominant_frequency_recovers_synth_tone(spark):
    """Physics check: on clean clips the dominant bin sits within 3
    bins of the clip's known tone — folded at Nyquist for the tones
    the low sample rates alias."""
    df = synth_clips(spark, 400, with_violations=False, num_partitions=4)
    out = spectral_features(df).collect()
    assert len(out) == 400
    misses = []
    for r in out:
        idx = int(r.clip_id.split("-")[1])
        f = 110.0 * (1.0 + (idx % 40))
        alias = min(f % r.sr_hz, r.sr_hz - (f % r.sr_hz))
        tol = 3.0 * r.sr_hz / N_FFT_DEFAULT
        if abs(r.dominant_freq_hz - alias) > tol:
            misses.append((r.clip_id, r.sr_hz, f, alias, r.dominant_freq_hz))
    # a handful of worst cases (very short 8 kHz clips, tone near a
    # fold) may smear into a neighbor lobe; the extractor must still
    # nail essentially all of them
    assert len(misses) <= 4, misses[:5]


def test_spectral_null_sr_yields_null_hz_not_zero(spark):
    """A NULL or non-positive sample rate cannot be converted bin->Hz:
    the *_hz features must be NULL (not 0.0, which would masquerade as
    a DC-dominant clip) while n_head still reports the decoded head
    (advice r4)."""
    tone = (0.4 * np.sin(2 * np.pi * 100 * np.arange(2000) / 8000))
    payload = np.clip(np.rint(tone * 32768.0), -32768, 32767).astype("<i2").tobytes()
    df = spark.createDataFrame(
        [
            ("null-sr", payload, None, "pcm16"),
            ("zero-sr", payload, 0, "pcm16"),
            ("ok", payload, 8000, "pcm16"),
        ],
        "clip_id string, bytes binary, sr_hz int, codec string",
    )
    out = {r.clip_id: r for r in spectral_features(df).collect()}
    for cid in ("null-sr", "zero-sr"):
        assert out[cid].dominant_freq_hz is None, cid
        assert out[cid].spectral_centroid_hz is None, cid
        assert out[cid].n_head == N_FFT_DEFAULT, cid  # head was still measured
    assert out["ok"].dominant_freq_hz == pytest.approx(101.5625, abs=8000 / N_FFT_DEFAULT)
