"""RIFF/AVI MJPEG container (io/avi.py) + video-op container dispatch.

The real-compressed-video leg: files carry standard AVI 1.0 headers
(avih/strh/strf/idx1), frames are baseline JFIF JPEGs, and the generic
video ops (video_meta / get_frame / scene_cuts / frame_sample) accept
AVI payloads next to the uncompressed OTRV container.  Lossy-format
invariant is the BASELINE.json one: decoded PSNR ≥ 40 dB.
"""

import struct

import numpy as np
import pyarrow as pa
import pytest

from open_thoughts_ray.io.avi import (
    avi_meta,
    encode_avi_mjpeg,
    frame_dimensions_avi,
    get_frame_avi,
    is_avi,
    iter_frames_avi,
)
from open_thoughts_ray.io.codecs import psnr
from open_thoughts_ray.ops.video import get_frame, scene_cuts, video_meta


def _smooth_clip(n=6, h=24, w=32, step=12):
    """JPEG-friendly gradient frames with a hard scene change."""
    base = np.linspace(0, 255, w).astype(np.uint8)[None, :, None] \
        .repeat(h, 0).repeat(3, 2).astype(int)
    frames = [np.clip(base + i * 2, 0, 255).astype(np.uint8)
              for i in range(n // 2)]
    frames += [np.clip(255 - base - i * 2, 0, 255).astype(np.uint8)
               for i in range(n - n // 2)]
    return np.stack(frames)


def test_header_fields_and_structure():
    frames = _smooth_clip()
    buf = encode_avi_mjpeg(frames, fps=24, quality=92)
    assert is_avi(buf)
    # RIFF size field covers the file
    assert 8 + struct.unpack_from("<I", buf, 4)[0] == len(buf)
    w, h, n, fps = avi_meta(buf)
    assert (w, h, n, fps) == (32, 24, 6, 24)
    # per-frame JFIF headers agree with the container geometry
    assert frame_dimensions_avi(buf) == (24, 32)
    # every chunk is word-aligned: a second parse must find every frame
    assert len(list(iter_frames_avi(buf))) == 6


def test_random_access_matches_sequential_and_psnr():
    frames = _smooth_clip()
    buf = encode_avi_mjpeg(frames, fps=30, quality=92)
    seq = list(iter_frames_avi(buf))
    for i in range(len(frames)):
        ra = get_frame_avi(buf, i)
        assert np.array_equal(ra, seq[i])
        assert psnr(frames[i], ra) >= 40.0
    with pytest.raises(IndexError):
        get_frame_avi(buf, len(frames))


def test_video_ops_dispatch_on_avi_magic():
    frames = _smooth_clip()
    buf = encode_avi_mjpeg(frames, fps=24, quality=92)
    assert video_meta(buf) == (32, 24, 6)
    assert np.array_equal(get_frame(buf, 3), get_frame_avi(buf, 3))
    # the planted scene change at the midpoint survives lossy coding
    cuts = scene_cuts(buf, threshold=30.0)
    assert cuts == [3]
    with pytest.raises(ValueError):
        video_meta(b"RIFFxxxxWAVE")  # RIFF but not AVI


def test_frame_sample_over_avi(ray_session):
    import ray.data as rd

    from open_thoughts_ray.ops.video import frame_sample

    frames = _smooth_clip(n=8)
    buf = encode_avi_mjpeg(frames, fps=24, quality=92)
    ds = rd.from_arrow(pa.table({
        "video_id": pa.array(["v0"], pa.string()),
        "bytes": pa.array([buf], pa.binary()),
    }))
    out = frame_sample(ds, every_n=4).to_pandas()
    assert out["frame_id"].tolist() == [0, 4]
    # sampled frames re-framed as 1-frame OTRV payloads, decodable
    for _, row in out.iterrows():
        assert video_meta(row["bytes"]) == (32, 24, 1)
