import numpy as np
import pytest

from open_thoughts_ray.fixtures.audio import SAMPLE_RATE, build_audio_frame
from open_thoughts_ray.ops.audio import (
    AudioDecimator,
    AudioFeatureStage,
    decode_pcm,
    encode_pcm,
    energy_gate,
    frame_features,
)


def test_pcm_roundtrip_exact():
    rng = np.random.default_rng(4)
    s = (rng.standard_normal(12345) * 5000).astype(np.int16)
    out, sr = decode_pcm(encode_pcm(s, 16000))
    assert sr == 16000
    assert np.array_equal(out, s)


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        decode_pcm(b"not audio at all")


def test_frame_features_deterministic_and_sized():
    rng = np.random.default_rng(9)
    s = (rng.standard_normal(8000) * 8000).astype(np.int16)
    f1 = frame_features(s, 8000, frame_ms=25, n_bands=8)
    f2 = frame_features(s, 8000, frame_ms=25, n_bands=8)
    assert f1.shape == (14,)
    assert np.array_equal(f1, f2)
    # silent input → zero energy features
    z = frame_features(np.zeros(8000, np.int16), 8000)
    assert z[0] == 0.0 and z[1] == 0.0


def test_feature_stage_schema_and_values(ray_session):
    import ray.data as rd

    df = build_audio_frame(60)
    out = rd.from_pandas(df, override_num_blocks=3).map_batches(
        AudioFeatureStage, batch_format="pyarrow",
        concurrency=2, batch_size=16, num_cpus=1,
    ).to_pandas().sort_values("audio_id").reset_index(drop=True)
    assert {"duration_s", "peak", "rms", "audio_feat"} <= set(out.columns)
    # values match a direct numpy computation for a spot row
    row = df.iloc[7]
    s, sr = decode_pcm(row["bytes"])
    x = s.astype(np.float64) / 32768.0
    got = out[out.audio_id == row["audio_id"]].iloc[0]
    assert got["duration_s"] == pytest.approx(len(s) / sr)
    assert got["rms"] == pytest.approx(float(np.sqrt((x * x).mean())))
    assert len(got["audio_feat"]) == 14


def test_energy_gate_drops_silent_and_short(ray_session):
    import ray.data as rd

    df = build_audio_frame(300)
    kept = energy_gate(rd.from_pandas(df, override_num_blocks=4),
                       min_rms=0.01, min_duration_s=0.2).to_pandas()
    kept_ids = set(kept["audio_id"])
    for _, r in df.iterrows():
        s, sr = decode_pcm(r["bytes"])
        x = s.astype(np.float64) / 32768.0
        rms = float(np.sqrt((x * x).mean()))
        expect = (len(s) / sr >= 0.2) and (rms >= 0.01)
        assert (r["audio_id"] in kept_ids) == expect
    assert 0 < len(kept) < len(df)


def test_decimator_halves_rate_and_length(ray_session):
    import ray.data as rd

    df = build_audio_frame(20)
    out = rd.from_pandas(df, override_num_blocks=2).map_batches(
        AudioDecimator, fn_constructor_kwargs={"factor": 2},
        batch_format="pyarrow", concurrency=2, batch_size=8, num_cpus=1,
    ).to_pandas().sort_values("audio_id").reset_index(drop=True)
    for _, r in out.iterrows():
        s, sr = decode_pcm(r["bytes"])
        orig = df[df.audio_id == r["audio_id"]].iloc[0]
        s0, sr0 = decode_pcm(orig["bytes"])
        assert sr == sr0 // 2 == r["sample_rate"]
        assert len(s) == (len(s0) + 1) // 2
