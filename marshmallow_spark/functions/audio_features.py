"""Per-clip spectral features — dominant frequency and spectral
centroid over the head window of each clip.

The audio-side feature extractor a training pipeline runs after the
signal-quality gate: dominant frequency catches mislabeled tones,
test signals, and hum (50/60 Hz and harmonics); the spectral centroid
is the classic brightness feature fed to curriculum/quality filters.

One vectorized ``mapInArrow`` pass, zero per-row Python:

- only the HEAD ``n_fft`` samples' bytes are sliced out of the Arrow
  flat buffer (the FFT never needs the tail — on hour-long clips this
  reads KBs per row, not MBs);
- the per-codec LUT decode is shared with the invariant/quality
  kernels;
- clips land in one zero-padded (rows, n_fft) matrix via a single
  masked fancy-index, get one batched Hann multiply, and one batched
  ``np.fft.rfft`` over axis 1 — numpy's pocketfft vectorizes across
  rows, so the transform cost amortizes exactly like the decode;
- dominant bin (DC excluded) and centroid come from per-row argmax /
  weighted mean over the magnitude matrix.

Rows that cannot be decoded (unknown codec, NULL payload, zero
samples) emit NULL features; sub-``n_fft`` clips are zero-padded (the
padded transform interpolates the same spectrum, with the main lobe
widened by the shorter effective window — fine for peak picking,
documented for anyone consuming the centroid of very short clips).
"""

from __future__ import annotations

import numpy as np

from .audio import (
    KNOWN_CODECS,
    SAMPLE_WIDTH,
    _gather_bytes,
    _np_bool,
    _varlen_buffers,
    decode_payload_batch,
)

#: Head-window transform size (power of two keeps pocketfft on its
#: fastest path; ~23 ms at 44.1 kHz, ~128 ms at 8 kHz).
N_FFT_DEFAULT = 1024

FEATURES_OUT_SCHEMA = (
    "clip_id string, codec string, sr_hz int, n_head long, "
    "dominant_freq_hz double, spectral_centroid_hz double"
)

#: Rows per numpy working set (same rationale as audio.UDF_CHUNK_ROWS).
FEATURE_CHUNK_ROWS = 2048


def spectral_batch(batch, *, n_fft: int = N_FFT_DEFAULT, chunk_rows: int = 0):
    """One Arrow RecordBatch of clips -> one features RecordBatch
    (always the same row count as the input)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    chunk_rows = chunk_rows or FEATURE_CHUNK_ROWS
    n = batch.num_rows
    col = {name: batch.column(i) for i, name in enumerate(batch.schema.names)}
    id_arr = col["clip_id"]
    codec_arr = col["codec"]
    b_arr = col["bytes"]
    sr_arr = col["sr_hz"]
    b_valid = _np_bool(pc.is_valid(b_arr))
    b_off, b_data = _varlen_buffers(b_arr)
    byte_len = np.where(b_valid, np.diff(b_off), 0).astype(np.int64)
    sr = (
        pc.fill_null(pc.cast(sr_arr, pa.int64()), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )

    n_head = np.zeros(n, dtype=np.int64)
    dom_bin = np.zeros(n, dtype=np.float64)
    cent_bin = np.zeros(n, dtype=np.float64)
    measured = np.zeros(n, dtype=bool)
    window = np.hanning(n_fft)
    bins = np.arange(1, n_fft // 2 + 1, dtype=np.float64)

    for c in KNOWN_CODECS:
        mask = _np_bool(pc.fill_null(pc.equal(codec_arr, pa.scalar(c)), False))
        width = SAMPLE_WIDTH[c]
        usable = (byte_len // width) * width
        sel_all = np.flatnonzero(mask & b_valid & (usable > 0))
        for lo in range(0, len(sel_all), chunk_rows):
            sel = sel_all[lo : lo + chunk_rows]
            heads = np.minimum(usable[sel] // width, n_fft)
            head_bytes = heads * width
            buf = (
                _gather_bytes(b_data, b_off[sel], head_bytes, name="spec_buf")
                if len(sel)
                else np.empty(0, np.uint8)
            )
            dec = decode_payload_batch(buf, None, c).astype(np.float64)
            starts = np.zeros(len(sel), dtype=np.int64)
            if len(sel) > 1:
                np.cumsum(heads[:-1], out=starts[1:])
            cols = np.arange(n_fft)
            valid = cols[None, :] < heads[:, None]
            mat = np.zeros((len(sel), n_fft), dtype=np.float64)
            mat[valid] = dec[(starts[:, None] + cols[None, :])[valid]]
            mat *= window[None, :]
            spec = np.abs(np.fft.rfft(mat, axis=1))
            body = spec[:, 1:]  # DC excluded from both features
            dom_bin[sel] = np.argmax(body, axis=1) + 1
            tot = body.sum(axis=1)
            cent_bin[sel] = (body * bins[None, :]).sum(axis=1) / np.maximum(
                tot, 1e-30
            )
            n_head[sel] = heads
            measured[sel] = True

    hz_per_bin = sr.astype(np.float64) / float(n_fft)
    dom_hz = dom_bin * hz_per_bin
    cent_hz = cent_bin * hz_per_bin

    # A NULL/non-positive sample rate makes the bin->Hz conversion
    # meaningless: emit NULL for the *_hz features (instead of 0.0,
    # which is indistinguishable from a genuinely DC-dominant clip)
    # while keeping n_head — the head was still decoded and measured.
    hz_ok = measured & (sr > 0)

    def _f64(vals):
        return pa.array(
            [float(v) if m else None for v, m in zip(vals, hz_ok)],
            type=pa.float64(),
        )

    return pa.RecordBatch.from_arrays(
        [
            pc.cast(id_arr, pa.string()),
            pc.cast(codec_arr, pa.string()),
            pc.cast(sr_arr, pa.int32()),
            pa.array(
                [int(v) if m else None for v, m in zip(n_head, measured)],
                type=pa.int64(),
            ),
            _f64(dom_hz),
            _f64(cent_hz),
        ],
        names=[
            "clip_id",
            "codec",
            "sr_hz",
            "n_head",
            "dominant_freq_hz",
            "spectral_centroid_hz",
        ],
    )


def spectral_features(df, *, n_fft: int = N_FFT_DEFAULT, chunk_rows: int = 0):
    """DataFrame entry point: (clip_id, codec, sr_hz, n_head,
    dominant_freq_hz, spectral_centroid_hz) — one output row per input
    clip, zero shuffles (a pure mapInArrow over the pruned 4-column
    scan)."""
    pruned = df.select("clip_id", "bytes", "sr_hz", "codec")

    def run(batches):
        for batch in batches:
            yield spectral_batch(batch, n_fft=n_fft, chunk_rows=chunk_rows)

    return pruned.mapInArrow(run, schema=FEATURES_OUT_SCHEMA)
