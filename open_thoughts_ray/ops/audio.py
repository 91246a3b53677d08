"""Audio column operators: PCM decode, frame features, energy gating,
decimation — the audio leg of the multimodal surface (SURVEY.md §7.0,
same contract as ops/multimodal for images).

Payload convention: an opaque ``binary`` column holding 16-bit
little-endian PCM with a 12-byte header (magic ``OTRA``, uint32 sample
rate, uint32 sample count).  Raw PCM needs no external library, so —
unlike jpeg/ffmpeg — the decode here is REAL, not a stub; swap
``decode_pcm`` for soundfile/ffmpeg when compressed formats arrive (the
stage signatures don't change).

Stages are vectorized: frame features come from one reshape +
``mean``/``sign`` pass per batch, never a per-sample Python loop.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa


_MAGIC = b"OTRA"


def encode_pcm(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono samples → framed PCM16 payload."""
    s = np.asarray(samples, dtype="<i2")
    return _MAGIC + struct.pack("<II", int(sample_rate), len(s)) + s.tobytes()


def decode_pcm(buf: bytes) -> tuple[np.ndarray, int]:
    """payload → (int16 samples, sample_rate).  Raises on bad framing."""
    if len(buf) < 12 or buf[:4] != _MAGIC:
        raise ValueError("not an OTRA PCM16 payload")
    sr, n = struct.unpack("<II", buf[4:12])
    s = np.frombuffer(buf, dtype="<i2", offset=12, count=n)
    return s, sr


def _frame(samples: np.ndarray, frame_len: int) -> np.ndarray:
    """(n,) → (n_frames, frame_len) by truncation to whole frames."""
    n_frames = len(samples) // frame_len
    return samples[: n_frames * frame_len].reshape(n_frames, frame_len)


def frame_features(samples: np.ndarray, sample_rate: int,
                   frame_ms: int = 25, n_bands: int = 8) -> np.ndarray:
    """Fixed-size feature vector: per-frame RMS energy + zero-crossing
    rate, each mean/max/std-pooled over frames, plus an ``n_bands``
    coarse energy contour (frame energies block-averaged to n_bands
    slots).  Deterministic, vectorized; length = 6 + n_bands."""
    frame_len = max(1, sample_rate * frame_ms // 1000)
    f = _frame(samples, frame_len).astype(np.float64) / 32768.0
    if len(f) == 0:
        return np.zeros(6 + n_bands)
    rms = np.sqrt((f * f).mean(axis=1))
    zc = (np.diff(np.signbit(f), axis=1) != 0).mean(axis=1)
    edges = np.linspace(0, len(rms), n_bands + 1).astype(np.int64)
    contour = np.asarray([
        rms[a:b].mean() if b > a else 0.0 for a, b in zip(edges[:-1], edges[1:])
    ])
    return np.concatenate([
        [rms.mean(), rms.max(), rms.std(), zc.mean(), zc.max(), zc.std()],
        contour,
    ])


class AudioFeatureStage:
    """Actor-pool stage: payload → duration_s, peak, rms, and an
    ``audio_feat`` list<float> vector.  Use with
    ``map_batches(AudioFeatureStage, concurrency=N, batch_size=B)`` and
    byte-aware (small) batch sizes, as with images."""

    def __init__(self, frame_ms: int = 25, n_bands: int = 8,
                 bytes_col: str = "bytes"):
        self.frame_ms = frame_ms
        self.n_bands = n_bands
        self.bytes_col = bytes_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        durs, peaks, rmss, feats = [], [], [], []
        for buf in batch.column(self.bytes_col).to_pylist():
            s, sr = decode_pcm(buf)
            x = s.astype(np.float64) / 32768.0
            durs.append(len(s) / sr if sr else 0.0)
            peaks.append(float(np.abs(x).max()) if len(x) else 0.0)
            rmss.append(float(np.sqrt((x * x).mean())) if len(x) else 0.0)
            feats.append(frame_features(s, sr, self.frame_ms, self.n_bands)
                         .tolist())
        t = batch.append_column("duration_s", pa.array(durs, pa.float64()))
        t = t.append_column("peak", pa.array(peaks, pa.float64()))
        t = t.append_column("rms", pa.array(rmss, pa.float64()))
        return t.append_column("audio_feat",
                               pa.array(feats, pa.list_(pa.float64())))


def energy_gate(ds, min_rms: float = 0.01, min_duration_s: float = 0.2,
                bytes_col: str = "bytes", concurrency=None):
    """Quality filter for audio corpora: drop near-silent or too-short
    clips (the audio analogue of the caption length/repetition rules).
    Decode happens once inside the stage; payloads of dropped rows never
    re-enter the object store."""

    def gate(batch: pa.Table) -> pa.Table:
        keep = []
        for buf in batch.column(bytes_col).to_pylist():
            s, sr = decode_pcm(buf)
            x = s.astype(np.float64) / 32768.0
            dur = len(s) / sr if sr else 0.0
            rms = float(np.sqrt((x * x).mean())) if len(x) else 0.0
            keep.append(dur >= min_duration_s and rms >= min_rms)
        return batch.filter(pa.array(keep, pa.bool_()))

    # stateless → plain tasks (no pool sizing; chained fixed pools can
    # over-reserve a small cluster).  An explicit concurrency keeps the
    # actor-pool path for callers pinning resources.
    if concurrency is not None:
        class Gate:
            __call__ = staticmethod(gate)

        return ds.map_batches(Gate, batch_format="pyarrow",
                              concurrency=concurrency, num_cpus=1,
                              batch_size=256)
    return ds.map_batches(gate, batch_format="pyarrow", batch_size=256)


class AudioDecimator:
    """Integer-factor decimation (every ``factor``-th sample after a
    3-tap mean smooth) — a REAL poor-man's resampler; swap the body for
    libsamplerate/soxr for production anti-aliasing (stage signature
    and output schema stay fixed)."""

    def __init__(self, factor: int = 2, bytes_col: str = "bytes"):
        if factor < 1:
            raise ValueError("factor must be >= 1")
        self.factor = factor
        self.bytes_col = bytes_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        srs = []
        for buf in batch.column(self.bytes_col).to_pylist():
            s, sr = decode_pcm(buf)
            if self.factor > 1 and len(s) >= 3:
                sm = s.astype(np.float64)
                sm[1:-1] = (sm[:-2] + sm[1:-1] + sm[2:]) / 3.0
                dec = np.clip(np.round(sm[:: self.factor]), -32768, 32767
                              ).astype(np.int16)
            else:
                dec = s[:: self.factor]
            new_sr = sr // self.factor
            out.append(encode_pcm(dec, new_sr))
            srs.append(new_sr)
        t = batch.drop_columns([self.bytes_col])
        t = t.append_column(self.bytes_col, pa.array(out, pa.binary()))
        name = "sample_rate"
        if name in t.column_names:
            t = t.drop_columns([name])
        return t.append_column(name, pa.array(srs, pa.int32()))
