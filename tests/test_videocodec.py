"""AVI-MJPEG container codec (functions/videocodec.py): demux
round-trips, RIFF rules (odd-size pads, unknown chunks), frame
sampling, loud failures, and the decode_video_frames quarantine/fanout
contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from nextbus2pg_spark.functions.jpegcodec import (
    jpeg_decode,
    jpeg_encode_gray,
)
from nextbus2pg_spark.functions.videocodec import (
    avi_decode_frames,
    avi_encode_mjpeg,
    decode_mjpeg_frames,
)

_rng = np.random.RandomState(9)


def _frames(n, h=16, w=24):
    return [
        jpeg_encode_gray(
            _rng.randint(0, 256, size=(h, w)).astype(np.uint8), quant=1
        )
        for _ in range(n)
    ]


def test_avi_round_trip_preserves_every_frame_byte_for_byte():
    frames = _frames(5)
    data = avi_encode_mjpeg(frames, 24, 16, fps=12)
    w, h, total, got = avi_decode_frames(data)
    assert (w, h, total) == (24, 16, 5)
    assert got == frames  # demux returns the exact JPEG payloads


def test_odd_sized_frames_respect_riff_padding():
    """JPEG payloads are frequently odd-length; the 00dc chunks must
    pad to even without corrupting the NEXT frame."""
    frames = _frames(4, h=9, w=13)  # odd dims → odd-ish payloads
    sizes = [len(f) for f in frames]
    assert any(s % 2 for s in sizes), "fixture should hit odd sizes"
    _, _, _, got = avi_decode_frames(avi_encode_mjpeg(frames, 13, 9))
    assert got == frames


def test_frame_sampling_decodes_every_nth():
    frames = _frames(6)
    data = avi_encode_mjpeg(frames, 24, 16)
    sampled = decode_mjpeg_frames(data, sample_every=2)
    assert [s[0] for s in sampled] == [0, 2, 4]
    for idx, fw, fh, gray in sampled:
        ref_w, ref_h, ref = jpeg_decode(frames[idx])
        assert (fw, fh) == (ref_w, ref_h)
        assert np.array_equal(gray, ref)


def test_malformed_containers_raise():
    with pytest.raises(ValueError, match="magic"):
        avi_decode_frames(b"RIFFxxxxWAVE")
    data = avi_encode_mjpeg(_frames(2), 24, 16)
    with pytest.raises(ValueError, match="truncated"):
        avi_decode_frames(data[:-5])
    # strip hdrl entirely -> missing avih
    movi_at = data.index(b"LIST", 12 + 8)
    stripped = data[:12] + data[movi_at:]
    stripped = stripped[:4] + struct.pack(
        "<I", len(stripped) - 8
    ) + stripped[8:]
    with pytest.raises(ValueError, match="avih"):
        avi_decode_frames(stripped)
    with pytest.raises(ValueError, match="non-empty"):
        avi_encode_mjpeg([], 24, 16)
    with pytest.raises(ValueError, match="sample_every"):
        decode_mjpeg_frames(data, sample_every=0)


def test_decode_video_frames_fanout_and_quarantine(spark):
    from nextbus2pg_spark.operators.multimodal import decode_video_frames

    good = avi_encode_mjpeg(_frames(4), 24, 16)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"RIFFjunk"))],
        "media_id long, payload binary",
    )
    rows = decode_video_frames(
        df, sample_every=2, on_error="null"
    ).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    assert [r.frame_idx for r in sorted(
        by_id[1], key=lambda r: r.frame_idx
    )] == [0, 2]
    assert all(r.decode_error is None for r in by_id[1])
    assert len(by_id[2]) == 1 and by_id[2][0].decode_error
    with pytest.raises(Exception):
        decode_video_frames(df, on_error="raise").collect()


def test_video_scene_cuts_thresholding(spark):
    """Scene cuts (round 10): consecutive-frame absolute differencing,
    integer thresholding, and the quarantine row."""
    import numpy as np

    from nextbus2pg_spark.functions.jpegcodec import jpeg_encode_gray
    from nextbus2pg_spark.functions.videocodec import avi_encode_mjpeg
    from nextbus2pg_spark.operators.multimodal import video_scene_cuts

    def blocky(v):
        return np.full((16, 16), v, dtype=np.uint8)

    # diffs: |10-10|*256=0 (no cut), |200-10|*256=48640 (cut at 2)
    frames = [blocky(10), blocky(10), blocky(200)]
    payload = avi_encode_mjpeg(
        [jpeg_encode_gray(f, quant=1) for f in frames], 16, 16
    )
    rows = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(b"RIFFjunk"))],
        "media_id long, payload binary",
    )
    out = {
        r.media_id: r
        for r in video_scene_cuts(
            rows, threshold=40_000, on_error="null"
        ).collect()
    }
    r1 = out[1]
    assert (r1.n_frames, r1.n_cuts, r1.cut_idx_sum) == (3, 1, 2)
    assert r1.max_diff == 190 * 256
    assert out[2].decode_error is not None
