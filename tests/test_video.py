import numpy as np
import pandas as pd
import pytest

from open_thoughts_ray.ops.video import (
    VideoFrameFeatures,
    encode_video,
    frame_sample,
    get_frame,
    scene_cut_stage,
    scene_cuts,
    video_meta,
)


def _clip(seed, n_frames=25, w=12, h=8, n_scenes=3):
    """Deterministic clip: n_scenes constant-ish segments with noise."""
    rng = np.random.default_rng(seed)
    bounds = sorted(rng.choice(np.arange(2, n_frames - 1), n_scenes - 1,
                               replace=False).tolist())
    frames = np.empty((n_frames, h, w, 3), np.uint8)
    segs = np.split(np.arange(n_frames), bounds)
    for seg in segs:
        base = rng.integers(0, 256, 3)
        for i in seg:
            frames[i] = np.clip(
                base + rng.integers(-3, 4, (h, w, 3)), 0, 255)
    return frames, bounds


def test_video_roundtrip_and_frame_access():
    frames, _ = _clip(1)
    buf = encode_video(frames)
    assert video_meta(buf) == (12, 8, 25)
    for i in (0, 7, 24):
        assert np.array_equal(get_frame(buf, i), frames[i])
    with pytest.raises(IndexError):
        get_frame(buf, 25)
    with pytest.raises(ValueError):
        video_meta(b"garbage....")


def test_scene_cuts_find_planted_boundaries():
    frames, bounds = _clip(3)
    assert scene_cuts(encode_video(frames), threshold=20.0) == bounds


def test_frame_sample_fanout_and_payload_shrink(ray_session):
    import ray.data as rd

    rows = []
    for i in range(6):
        frames, _ = _clip(i, n_frames=20 + i)
        rows.append({"video_id": f"v{i}", "bytes": encode_video(frames),
                     "lang": "en"})
    ds = rd.from_pandas(pd.DataFrame(rows), override_num_blocks=2)
    out = frame_sample(ds, every_n=5).to_pandas()
    # one row per sampled frame, carry-through column intact
    expect = sum(len(range(0, 20 + i, 5)) for i in range(6))
    assert len(out) == expect
    assert set(out["lang"]) == {"en"}
    # each emitted payload is a 1-frame video matching the source frame
    r = out[(out.video_id == "v2") & (out.frame_id == 5)].iloc[0]
    src, _ = _clip(2, n_frames=22)
    assert np.array_equal(get_frame(r["bytes"], 0), src[5])


def test_frame_features_stage(ray_session):
    import ray.data as rd

    frames, _ = _clip(7)
    ds = rd.from_pandas(pd.DataFrame(
        [{"video_id": "v0", "bytes": encode_video(frames)}]))
    out = frame_sample(ds, every_n=10).map_batches(
        VideoFrameFeatures, batch_format="pyarrow",
        concurrency=1, batch_size=8, num_cpus=1).to_pandas()
    row = out[out.frame_id == 10].iloc[0]
    px = frames[10].astype(np.float64)
    want = np.concatenate([px.mean(axis=(0, 1)), px.std(axis=(0, 1))]) / 255.0
    assert np.allclose(row["frame_feat"], want)


def test_scene_cut_stage(ray_session):
    import ray.data as rd

    rows = []
    expected = {}
    for i in range(4):
        frames, bounds = _clip(10 + i)
        rows.append({"video_id": f"v{i}", "bytes": encode_video(frames)})
        expected[f"v{i}"] = bounds
    out = scene_cut_stage(
        rd.from_pandas(pd.DataFrame(rows), override_num_blocks=2),
        threshold=20.0).to_pandas()
    for _, r in out.iterrows():
        assert list(r["cuts"]) == expected[r["video_id"]]
        assert r["n_frames"] == 25
