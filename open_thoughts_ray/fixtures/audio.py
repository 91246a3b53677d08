"""Deterministic synthetic audio benchmark rows (the audio analogue of
fixtures/images.py): PCM16 payloads in the ops/audio framing, a pure
function of ``(seed, row_index)``.

Each clip is a sum of 1–3 seeded sinusoids + noise at a seeded
amplitude; ~15 % of rows are near-silent (amplitude ~1e-4) and ~10 %
are very short (< 0.2 s) — the rows an ``energy_gate`` quality filter
must drop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.hashing import row_seed
from ..ops.audio import encode_pcm

SAMPLE_RATE = 8000


def generate_row(seed: int, i: int) -> dict:
    rng = np.random.default_rng(row_seed(seed, i))
    short = rng.random() < 0.10
    silent = rng.random() < 0.15
    dur = float(rng.uniform(0.02, 0.15)) if short else float(rng.uniform(0.3, 2.0))
    n = max(1, int(dur * SAMPLE_RATE))
    t = np.arange(n) / SAMPLE_RATE
    x = np.zeros(n)
    for _ in range(int(rng.integers(1, 4))):
        x += np.sin(2 * np.pi * float(rng.uniform(80, 2000)) * t
                    + float(rng.uniform(0, 2 * np.pi)))
    x += 0.05 * rng.standard_normal(n)
    amp = 1e-4 if silent else float(rng.uniform(0.05, 0.8))
    s = np.clip(np.round(amp * x / max(1e-9, np.abs(x).max()) * 32767),
                -32768, 32767).astype(np.int16)
    return {
        "audio_id": f"a{i:07d}",
        "bytes": encode_pcm(s, SAMPLE_RATE),
        "sample_rate": SAMPLE_RATE,
        "n_samples": n,
        "transcript": f"clip {i} tone",
        "is_silent": bool(silent),
        "is_short": bool(short),
    }


def build_audio_frame(n_rows: int = 500, seed: int = 20) -> pd.DataFrame:
    return pd.DataFrame([generate_row(seed, i) for i in range(n_rows)])
