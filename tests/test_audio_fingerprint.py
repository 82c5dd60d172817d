"""Acoustic-fingerprint duplicate detection: kernel vs plain-numpy
golden, cross-codec duplicate recall, zero-shuffle plan."""

from __future__ import annotations

import numpy as np

from marshmallow_spark.functions import audio
from marshmallow_spark.functions.audio_fingerprint import (
    BAND_DB_DEFAULT,
    ZC_BIN_DEFAULT,
    acoustic_fingerprints,
    fingerprint_batch,
    fingerprint_duplicate_groups,
    fingerprint_duplicate_pairs,
)


def _pcm16_payload(x: np.ndarray) -> bytes:
    return (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()


def _batch(rows):
    import pyarrow as pa

    return pa.RecordBatch.from_arrays(
        [
            pa.array([r[0] for r in rows], pa.string()),
            pa.array([r[1] for r in rows], pa.binary()),
            pa.array([r[2] for r in rows], pa.int32()),
            pa.array([r[3] for r in rows], pa.string()),
        ],
        names=["clip_id", "bytes", "sr_hz", "codec"],
    )


def test_envelope_kernel_matches_plain_numpy():
    """Windows tile the clip (partial tail window included) and the
    quantized loudness matches an unvectorized per-window loop."""
    sr = 8000
    rng = np.random.default_rng(3)
    x = (0.3 * np.sin(2 * np.pi * 440 * np.arange(2500) / sr)).astype(
        np.float32
    )  # 2500 samples = 3 full 800-sample windows + 100-sample tail
    x[1600:2400] *= 0.01  # a quiet window
    rows = [
        ("c1", _pcm16_payload(x), sr, "pcm16"),
        ("c-null", None, sr, "pcm16"),
        ("c-unknown", b"\x00\x00", sr, "mp3"),
    ]
    out = fingerprint_batch(_batch(rows)).to_pydict()
    assert out["n_windows"] == [4, 0, 0]
    assert out["env_a"][1] is None and out["env_b"][2] is None

    # plain-python reference on the DECODED samples (pcm16 round-trip):
    # per window [q_loudness, q_crossings], crossings between adjacent
    # windows assigned to the earlier window
    dec = np.frombuffer(_pcm16_payload(x), dtype="<i2").astype(np.float32) / 32768.0
    w = sr * 100 // 1000
    sign = dec >= 0
    exp_a, exp_b = [], []
    for k in range(4):
        seg = dec[k * w : (k + 1) * w]
        db = 10.0 * np.log10(max(float(np.mean(seg.astype(np.float64) ** 2)), 1e-12))
        hi = min((k + 1) * w, len(dec) - 1)
        zc = int(np.sum(sign[k * w + 1 : hi + 1] != sign[k * w : hi]))
        exp_a += [int(np.floor(db / BAND_DB_DEFAULT)), int(np.floor(zc / ZC_BIN_DEFAULT))]
        exp_b += [int(np.floor(db / BAND_DB_DEFAULT + 0.5)), int(np.floor(zc / ZC_BIN_DEFAULT + 0.5))]
    got_a = list(np.frombuffer(out["env_a"][0], dtype=np.int8))
    got_b = list(np.frombuffer(out["env_b"][0], dtype=np.int8))
    assert got_a == exp_a and got_b == exp_b


def test_cross_codec_duplicate_detected(spark):
    """The same recording as a pcm16 master and its ulaw re-encode
    (byte-distinct, different clip_id) collides on the envelope; a
    different recording does not."""
    sr = np.array([8000, 8000], dtype=np.int64)
    dur = np.array([1000, 1000], dtype=np.int64)
    pcm_a, lens = audio.reference_pcm16_flat(
        np.array([7, 123], dtype=np.int64), sr, dur
    )
    a = pcm_a[: lens[0]].copy()
    other = pcm_a[lens[0] :].copy()
    rows = [
        ("dup-master", a.astype("<i2").tobytes(), 8000, "pcm16"),
        ("dup-reencode", audio.ulaw_encode(a).tobytes(), 8000, "ulaw"),
        ("other", other.astype("<i2").tobytes(), 8000, "pcm16"),
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, codec string"
    )
    pairs = {
        (r.clip_a, r.clip_b)
        for r in fingerprint_duplicate_pairs(df).collect()
    }
    assert pairs == {("dup-master", "dup-reencode")}


def test_fingerprint_zero_shuffle_plan(spark):
    from marshmallow_spark.sources.synth import synth_clips

    df = synth_clips(spark, 100, num_partitions=2)
    out = acoustic_fingerprints(df)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan


def test_duplicate_groups_linear_shape(spark):
    """Groups output is one row per colliding signature (linear in
    bucket size): 4 copies of one recording produce a single n=4 group
    per band, not 6 pairs, and the distinct clip ids are recoverable
    from first/last."""
    sr = np.array([8000], dtype=np.int64)
    dur = np.array([800], dtype=np.int64)
    pcm, lens = audio.reference_pcm16_flat(np.array([5], dtype=np.int64), sr, dur)
    seg = pcm[: lens[0]].copy()
    rows = [
        (f"copy-{i}", seg.astype("<i2").tobytes(), 8000, "pcm16")
        for i in range(4)
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, codec string"
    )
    from marshmallow_spark.functions.audio_fingerprint import (
        fingerprint_duplicate_groups,
    )

    got = fingerprint_duplicate_groups(df).collect()
    assert {(r.band, r.n_clips, r.first_clip, r.last_clip) for r in got} == {
        ("a", 4, "copy-0", "copy-3"),
        ("b", 4, "copy-0", "copy-3"),
    }


def test_duplicate_clusters_transitive(spark):
    """Clusters unify bucket groups: two duplicate families yield two
    components labeled by their minimum clip_id, covering every
    member."""
    sr = np.array([8000, 8000, 8000], dtype=np.int64)
    dur = np.array([700, 700, 700], dtype=np.int64)
    # idx 2 / 9 / 25 -> tones at 330 / 1100 / 2860 Hz (110*(1+idx%40))
    pcm, lens = audio.reference_pcm16_flat(
        np.array([2, 9, 25], dtype=np.int64), sr, dur
    )
    fam1 = pcm[: lens[0]].copy()
    fam2 = pcm[lens[0] : lens[0] + lens[1]].copy()
    solo = pcm[lens[0] + lens[1] :].copy()
    rows = [
        ("a1", fam1.astype("<i2").tobytes(), 8000, "pcm16"),
        ("a2", audio.ulaw_encode(fam1).tobytes(), 8000, "ulaw"),
        ("a3", audio.alaw_encode(fam1).tobytes(), 8000, "alaw"),
        ("b1", fam2.astype("<i2").tobytes(), 8000, "pcm16"),
        ("b2", audio.ulaw_encode(fam2).tobytes(), 8000, "ulaw"),
        ("solo", solo.astype("<i2").tobytes(), 8000, "pcm16"),
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, codec string"
    )
    from marshmallow_spark.functions.audio_fingerprint import (
        fingerprint_duplicate_clusters,
    )

    got = {
        (r.clip_id, r.cluster)
        for r in fingerprint_duplicate_clusters(df).collect()
    }
    assert got == {
        ("a1", "a1"),
        ("a2", "a1"),
        ("a3", "a1"),
        ("b1", "b1"),
        ("b2", "b1"),
    }


def test_duplicate_groups_single_exchange_plan(spark):
    """Group aggregation runs off ONE partial-aggregated hash exchange
    on the digest keys (the decode stage itself is exchange-free)."""
    from marshmallow_spark.sources.synth import synth_clips
    from marshmallow_spark.functions.audio_fingerprint import (
        fingerprint_duplicate_groups,
    )

    df = synth_clips(spark, 200, num_partitions=2)
    out = fingerprint_duplicate_groups(df)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    n_hash = len([
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "Reused" not in ln
    ])
    assert n_hash == 1, plan
    assert "partial_count" in plan or "HashAggregate" in plan, plan


def test_cross_rate_duplicate_detected(spark):
    """The fingerprint is rate-invariant by construction (wall-clock
    windows; RMS and crossing COUNTS are time-domain quantities): the
    same 800 ms recording captured at 16 kHz and at 8 kHz collides
    with no resampling, while a different recording does not."""
    sr = np.array([16000, 8000, 16000], dtype=np.int64)
    dur = np.array([800, 800, 800], dtype=np.int64)
    pcm, lens = audio.reference_pcm16_flat(
        np.array([6, 6, 14], dtype=np.int64), sr, dur
    )
    hi = pcm[: lens[0]].copy()
    lo = pcm[lens[0] : lens[0] + lens[1]].copy()
    other = pcm[lens[0] + lens[1] :].copy()
    rows = [
        ("hi-rate", hi.astype("<i2").tobytes(), 16000, "pcm16"),
        ("lo-rate", lo.astype("<i2").tobytes(), 8000, "pcm16"),
        ("other", other.astype("<i2").tobytes(), 16000, "pcm16"),
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, codec string"
    )
    got = {
        (r.n_clips, r.first_clip, r.last_clip)
        for r in fingerprint_duplicate_groups(df).collect()
    }
    assert got == {(2, "hi-rate", "lo-rate")}


def test_duplicate_clusters_no_cartesian(spark):
    """The cluster path (star edges + large/small-star CC) must never
    degrade to a cartesian/BNLJ plan at any stage."""
    from marshmallow_spark.sources.synth import synth_clips
    from marshmallow_spark.functions.audio_fingerprint import (
        fingerprint_duplicate_clusters,
    )

    df = synth_clips(spark, 300, num_partitions=2)
    out = fingerprint_duplicate_clusters(df, min_windows=2)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
