"""Speech-activity (energy VAD) and transcript<->audio consistency:
the vectorized run-length kernel must agree exactly with the obvious
per-clip loop-wise reference, on crafted signals, on the synth corpus,
and under hypothesis fuzz; the cross-modal gate must flag exactly the
planted mismatched pairs."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from marshmallow_spark.functions.audio import alaw_encode, ulaw_encode
from marshmallow_spark.functions.audio_vad import (
    VAD_MARGIN_DB,
    VAD_WINDOW_MS,
    speech_activity_metrics,
    transcript_consistency_violations,
)
from marshmallow_spark.sources.synth import synth_clips

SILENCE = -60.0


def _py_vad(payload: bytes, codec: str, sr: int, *, window_ms=VAD_WINDOW_MS,
            margin_db=VAD_MARGIN_DB, silence_dbfs=SILENCE):
    """The obvious per-clip reference implementation."""
    if codec == "pcm16":
        usable = len(payload) // 2 * 2
        x = np.frombuffer(payload[:usable], dtype="<i2").astype(np.float64)
        x /= 32768.0
    elif codec in ("ulaw", "alaw"):
        from marshmallow_spark.functions.audio import (
            ALAW_DECODE_LUT,
            ULAW_DECODE_LUT,
        )

        lut = ULAW_DECODE_LUT if codec == "ulaw" else ALAW_DECODE_LUT
        x = lut[np.frombuffer(payload, dtype=np.uint8)].astype(np.float64)
        x /= 32768.0
    else:
        return None
    n = len(x)
    if n == 0 or sr <= 0:
        return None
    w = max(sr * window_ms // 1000, 1)
    wins = [x[i : i + w] for i in range(0, n, w)]
    wdb = [
        10.0 * math.log10(max(float(np.mean(win * win)), 1e-12))
        for win in wins
    ]
    floor, peak = min(wdb), max(wdb)
    thr = (
        silence_dbfs
        if peak - floor <= margin_db
        else max(silence_dbfs, floor + margin_db)
    )
    active = [d > thr for d in wdb]
    wlen = [len(win) for win in wins]
    act_samp = sum(l for a, l in zip(active, wlen) if a)
    # silence runs
    runs = []
    for a, l in zip(active, wlen):
        if runs and runs[-1][0] == a:
            runs[-1][1] += l
        else:
            runs.append([a, l])
    sil = [l for a, l in runs if not a]
    lead = runs[0][1] if not runs[0][0] else 0
    trail = runs[-1][1] if not runs[-1][0] else 0
    to_ms = 1000.0 / sr
    return {
        "n_windows": len(wins),
        "active_windows": sum(active),
        "speech_ratio": act_samp / n,
        "active_ms": act_samp * to_ms,
        "leading_silence_ms": lead * to_ms,
        "trailing_silence_ms": trail * to_ms,
        "longest_silence_ms": (max(sil) if sil else 0) * to_ms,
        "threshold_dbfs": thr,
    }


def _pcm16(x: np.ndarray) -> bytes:
    return np.clip(np.rint(x * 32768.0), -32768, 32767).astype("<i2").tobytes()


def _tone(sr: int, ms: int, freq=440.0, amp=0.5) -> np.ndarray:
    t = np.arange(sr * ms // 1000, dtype=np.float64)
    return amp * np.sin(2 * np.pi * freq * t / sr)


def _assert_rows_match(rows, clips):
    by_id = {r["clip_id"]: r for r in rows}
    assert set(by_id) == {c[0] for c in clips}
    for cid, payload, sr, _dur, codec, *_ in clips:
        exp = _py_vad(payload, codec, sr)
        got = by_id[cid]
        if exp is None:
            assert got["active_ms"] is None, cid
            continue
        for k, v in exp.items():
            g = got[k]
            if isinstance(v, float):
                assert g == pytest.approx(v, abs=1e-9), (cid, k, g, v)
            else:
                assert g == v, (cid, k, g, v)


def _clips_df(spark, clips):
    return spark.createDataFrame(
        [c[:6] if len(c) >= 6 else (*c, None) for c in clips],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string",
    )


def test_vad_crafted_signals(spark):
    sr = 8000
    tone = _tone(sr, 1000)
    gap = np.zeros(sr // 2)  # 500 ms digital silence
    speech_gap_speech = np.concatenate([tone, gap, tone])
    lead_sil = np.concatenate([gap, tone])
    trail_sil = np.concatenate([tone, gap, gap])
    # noise bed at -40 dBFS (well above the -60 absolute gate) with a
    # -6 dBFS tone in the middle: the adaptive threshold must call the
    # bed silent — an absolute -60 gate would call the whole clip speech
    rng_t = np.arange(sr, dtype=np.float64)
    bed = 0.01 * np.sin(2 * np.pi * 3777.0 * rng_t / sr)  # ~-40 dBFS
    noisy = np.concatenate([bed, tone, bed])
    clips = [
        ("uniform-tone", _pcm16(tone), sr, 1000, "pcm16", "hi"),
        ("all-silence", _pcm16(np.zeros(sr)), sr, 1000, "pcm16", "hi"),
        ("mid-gap", _pcm16(speech_gap_speech), sr, 2500, "pcm16", "hi"),
        ("leading", _pcm16(lead_sil), sr, 1500, "pcm16", "hi"),
        ("trailing", _pcm16(trail_sil), sr, 2000, "pcm16", "hi"),
        ("noisy-bed", _pcm16(noisy), sr, 3000, "pcm16", "hi"),
        ("ulaw-gap", ulaw_encode((speech_gap_speech * 32767).astype(np.int16)).tobytes(), sr, 2500, "ulaw", "hi"),
        ("alaw-tone", alaw_encode((tone * 32767).astype(np.int16)).tobytes(), sr, 1000, "alaw", "hi"),
        ("one-sample", _pcm16(np.array([0.5])), sr, 1, "pcm16", "hi"),
        ("bad-codec", _pcm16(tone), sr, 1000, "opus", "hi"),
    ]
    rows = [
        r.asDict()
        for r in speech_activity_metrics(_clips_df(spark, clips)).collect()
    ]
    _assert_rows_match(rows, clips)

    by_id = {r["clip_id"]: r for r in rows}
    # semantic spot checks, independent of the reference impl
    assert by_id["uniform-tone"]["speech_ratio"] == pytest.approx(1.0)
    assert by_id["uniform-tone"]["longest_silence_ms"] == 0.0
    assert by_id["all-silence"]["speech_ratio"] == 0.0
    assert by_id["all-silence"]["leading_silence_ms"] == pytest.approx(1000.0)
    assert by_id["mid-gap"]["longest_silence_ms"] == pytest.approx(500.0)
    assert by_id["mid-gap"]["leading_silence_ms"] == 0.0
    assert by_id["leading"]["leading_silence_ms"] == pytest.approx(500.0)
    assert by_id["trailing"]["trailing_silence_ms"] == pytest.approx(1000.0)
    # the adaptive threshold: bed windows are inactive despite > -60
    nb = by_id["noisy-bed"]
    assert nb["active_ms"] == pytest.approx(1000.0, abs=VAD_WINDOW_MS)
    assert nb["threshold_dbfs"] > -40.0
    assert by_id["bad-codec"]["active_ms"] is None


def test_vad_golden_on_synth_corpus(spark):
    """Synth clips are continuous tones: every decodable clip must be
    fully active under the flat-clip regime; the loop-wise reference
    must agree row-for-row."""
    df = synth_clips(spark, 400, num_partitions=4)
    pdf = df.toPandas()
    rows = [r.asDict() for r in speech_activity_metrics(df).collect()]
    clips = [
        (p.clip_id, bytes(p.bytes) if p.bytes is not None else b"", int(p.sr_hz), int(p.dur_ms), p.codec)
        for p in pdf.itertuples()
    ]
    # the synth table carries duplicate clip_ids (planted uniqueness
    # violations) with identical content — dedupe for the id-keyed check
    seen = {}
    for c in clips:
        seen[c[0]] = c
    uniq = list(seen.values())
    by_id = {}
    for r in rows:
        by_id[r["clip_id"]] = r
    for cid, payload, sr, dur, codec in uniq:
        exp = (
            _py_vad(payload, codec, sr)
            if codec in ("pcm16", "ulaw", "alaw") and sr > 0 and len(payload)
            else None
        )
        got = by_id[cid]
        if exp is None:
            assert got["active_ms"] is None
            continue
        assert got["speech_ratio"] == pytest.approx(exp["speech_ratio"], abs=1e-9)
        assert got["longest_silence_ms"] == pytest.approx(
            exp["longest_silence_ms"], abs=1e-9
        )
        # continuous tone: fully active
        assert exp["speech_ratio"] == pytest.approx(1.0)


@settings(max_examples=30, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # segment pattern id
            st.integers(min_value=0, max_value=2600),  # samples
        ),
        min_size=1,
        max_size=6,
    ),
    sr=st.sampled_from([8000, 16000]),
)
def test_vad_fuzz_vs_loop(data, sr):
    """Vectorized kernel == loop-wise reference on random
    tone/silence/quiet segment layouts (no Spark: batch-level)."""
    import pyarrow as pa

    from marshmallow_spark.functions.audio_vad import speech_activity_batch

    amps = [0.0, 0.5, 0.003, 0.9]
    segs = [
        amps[p] * np.sin(2 * np.pi * 440.0 * np.arange(n) / sr)
        for p, n in data
    ]
    x = np.concatenate(segs) if segs else np.zeros(0)
    payload = _pcm16(x)
    batch = pa.RecordBatch.from_arrays(
        [
            pa.array(["a"]),
            pa.array([payload], type=pa.binary()),
            pa.array([sr], type=pa.int32()),
            pa.array(["pcm16"]),
        ],
        names=["clip_id", "bytes", "sr_hz", "codec"],
    )
    out = speech_activity_batch(batch).to_pylist()[0]
    exp = _py_vad(payload, "pcm16", sr)
    if exp is None:
        assert out["active_ms"] is None
        return
    for k, v in exp.items():
        if isinstance(v, float):
            assert out[k] == pytest.approx(v, abs=1e-9), (k, out[k], v)
        else:
            assert out[k] == v, (k, out[k], v)


def test_transcript_consistency_flags_planted_pairs(spark):
    sr = 8000
    tone = _tone(sr, 2000)
    clips = [
        # silent audio, real transcript -> flagged
        ("silent-with-tx", _pcm16(np.zeros(2 * sr)), sr, 2000, "pcm16", "hello world"),
        # 2 s of speech, empty transcript -> flagged
        ("speech-empty-tx", _pcm16(tone), sr, 2000, "pcm16", ""),
        # whitespace-only counts as empty
        ("speech-blank-tx", _pcm16(tone), sr, 2000, "pcm16", "   "),
        # NULL transcript: structural required's finding, NOT ours
        ("speech-null-tx", _pcm16(tone), sr, 2000, "pcm16", None),
        # healthy pair
        ("ok", _pcm16(tone), sr, 2000, "pcm16", "a plausible sentence here"),
        # silent audio AND empty transcript: agree (degenerate but consistent)
        ("silent-empty", _pcm16(np.zeros(2 * sr)), sr, 2000, "pcm16", ""),
        # undecodable: no cross-modal finding
        ("undecodable", None, sr, 2000, "pcm16", "text"),
    ]
    out = transcript_consistency_violations(_clips_df(spark, clips)).collect()
    got = {(r["clip_id"], r["message"]) for r in out}
    ids = {r["clip_id"] for r in out}
    assert ids == {"silent-with-tx", "speech-empty-tx", "speech-blank-tx"}
    assert (
        "silent-with-tx",
        "Transcript has 11 chars but audio has no speech activity.",
    ) in got
    assert any(
        c == "speech-empty-tx" and "transcript is empty" in m for c, m in got
    )
    assert all(r["field"] == "transcript" for r in out)


def test_transcript_consistency_rate_bounds(spark):
    """chars per ACTIVE second: a clip whose dur_ms is mostly silence
    must be judged on its speech time — the metadata-only rate check's
    blind spot."""
    sr = 8000
    tone1s = _tone(sr, 1000)
    padded = np.concatenate([tone1s, np.zeros(9 * sr)])  # 10 s clip, 1 s speech
    tx = "x" * 100  # 100 chars: 10/s over dur, 100/s over active speech
    clips = [("padded", _pcm16(padded), sr, 10000, "pcm16", tx)]
    # bounds that the metadata rate (10 cps) would pass but the active
    # rate (100 cps) violates
    out = transcript_consistency_violations(
        _clips_df(spark, clips), rate_bounds=(1.0, 50.0)
    ).collect()
    assert len(out) == 1
    assert "chars per active second" in out[0]["message"]
    # same clip, bounds judged on active seconds: 100 cps inside [60, 120]
    ok = transcript_consistency_violations(
        _clips_df(spark, clips), rate_bounds=(60.0, 120.0)
    ).collect()
    assert ok == []


def test_suite_transcript_consistency_integration(spark):
    from marshmallow_spark.plans.pipeline import ClipValidationSuite

    sr = 8000
    base = synth_clips(spark, 2000, num_partitions=4)
    planted = _clips_df(
        spark,
        [
            ("zz-silent-tx", _pcm16(np.zeros(sr)), sr, 1000, "pcm16", "some words"),
            ("zz-speech-notx", _pcm16(_tone(sr, 1000)), sr, 1000, "pcm16", ""),
        ],
    )
    df = base.unionByName(planted)
    suite = ClipValidationSuite(transcript_consistency={})
    v = suite.violations(df)
    tc = v.where(v.check == "transcript_audio").collect()
    assert {r["clip_id"] for r in tc} == {"zz-silent-tx", "zz-speech-notx"}
    # stateless: available on the streaming path too (plan compiles)
    assert suite.violations(df, stateless_only=True).where(
        "check = 'transcript_audio'"
    ).count() == 2


def test_vad_zero_shuffle_plan(spark):
    df = synth_clips(spark, 100, num_partitions=2)
    plan = speech_activity_metrics(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "MapInArrow" in plan
