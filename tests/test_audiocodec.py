"""RIFF/WAVE PCM codec (functions/audiocodec.py): lossless round trips
mono + stereo, RIFF chunk-walk rules (unknown chunks, odd-size pad
byte), loud failures on unsupported encodings, and the decode_audio
quarantine contract. Codec tests need no Spark session."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from nextbus2pg_spark.functions.audiocodec import (
    wav_decode,
    wav_encode_pcm16,
)

_rng = np.random.RandomState(7)


def test_mono_round_trip_is_lossless():
    samples = _rng.randint(-32768, 32768, size=333).astype(np.int16)
    rate, n_ch, mono = wav_decode(wav_encode_pcm16(samples, 22_050))
    assert (rate, n_ch) == (22_050, 1)
    assert np.array_equal(mono, samples.astype(np.int32))


def test_stereo_decodes_to_exact_integer_mean():
    left = _rng.randint(-30000, 30000, size=100).astype(np.int32)
    right = _rng.randint(-30000, 30000, size=100).astype(np.int32)
    frames = np.stack([left, right], axis=1).astype(np.int16)
    rate, n_ch, mono = wav_decode(wav_encode_pcm16(frames, 8_000))
    assert (rate, n_ch) == (8_000, 2)
    assert np.array_equal(mono, (left + right) // 2)


def test_unknown_chunks_and_pad_byte_are_skipped():
    """RIFF rule: readers skip chunks they don't know, and odd-size
    chunks carry one pad byte — a LIST chunk of odd length before the
    data chunk must not derail the walk."""
    samples = np.arange(-5, 5, dtype=np.int16)
    data = wav_encode_pcm16(samples, 16_000)
    # splice an odd-sized junk chunk between 'fmt ' and 'data'
    fmt_end = data.index(b"data")
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad
    spliced = data[:fmt_end] + junk + data[fmt_end:]
    spliced = spliced[:4] + struct.pack(
        "<I", len(spliced) - 8
    ) + spliced[8:]
    rate, n_ch, mono = wav_decode(spliced)
    assert np.array_equal(mono, samples.astype(np.int32))


def test_unsupported_encodings_raise():
    samples = np.zeros(4, dtype=np.int16)
    data = bytearray(wav_encode_pcm16(samples, 16_000))
    fmt_at = bytes(data).index(b"fmt ") + 8
    data[fmt_at : fmt_at + 2] = struct.pack("<H", 3)  # float PCM
    with pytest.raises(ValueError, match="unsupported WAV encoding"):
        wav_decode(bytes(data))
    with pytest.raises(ValueError, match="magic"):
        wav_decode(b"OggS not a wav")
    with pytest.raises(ValueError, match="truncated"):
        wav_decode(wav_encode_pcm16(samples, 16_000)[:-3])


def test_encoder_validates():
    with pytest.raises(ValueError, match="frames"):
        wav_encode_pcm16(np.zeros((3, 4), dtype=np.int16))
    with pytest.raises(ValueError, match="sample_rate"):
        wav_encode_pcm16(np.zeros(4, dtype=np.int16), sample_rate=0)


def test_decode_audio_quarantine(spark):
    """on_error='null' routes garbage to decode_error; clean payloads
    produce the closed-form statistics (the q_media_audio contract)."""
    from nextbus2pg_spark.operators.multimodal import decode_audio

    good = wav_encode_pcm16(np.array([1, -2, 3], dtype=np.int16), 16_000)
    rows = [
        (1, "audio", bytearray(good), None),
        (2, "audio", bytearray(b"RIFFgarbage!"), None),
        (3, "audio", None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, note string",
    )
    out = {r.media_id: r for r in
           decode_audio(df, on_error="null").collect()}
    assert out[1].n_frames == 3 and out[1].sample_sum == 2
    assert out[1].peak == 3 and out[1].decode_error is None
    assert out[2].n_frames is None and out[2].decode_error
    assert out[3].decode_error == "empty payload"
    with pytest.raises(Exception):
        decode_audio(df, on_error="raise").collect()


def test_audio_activity_windows_and_quarantine(spark):
    """VAD (round 10): frame windowing, tail truncation, integer
    threshold, empty-active NULLs, and the quarantine row."""
    import numpy as np

    from nextbus2pg_spark.functions.audiocodec import wav_encode_pcm16
    from nextbus2pg_spark.operators.multimodal import audio_activity

    loud = np.full(100, 1500, dtype=np.int16)   # 2 active frames
    quiet = np.full(120, 10, dtype=np.int16)    # 2 frames, 0 active
    mixed = np.concatenate([np.full(50, 5, np.int16),
                            np.full(50, 2000, np.int16),
                            np.full(30, 2000, np.int16)])  # tail cut
    rows = spark.createDataFrame(
        [
            (1, bytearray(wav_encode_pcm16(loud, 16000))),
            (2, bytearray(wav_encode_pcm16(quiet, 16000))),
            (3, bytearray(wav_encode_pcm16(mixed, 16000))),
            (4, bytearray(b"RIFFjunk")),
        ],
        "media_id long, payload binary",
    )
    out = {
        r.media_id: r
        for r in audio_activity(
            rows, frame_len=50, threshold=1000, on_error="null"
        ).collect()
    }
    assert (out[1].n_frames, out[1].n_active) == (2, 2)
    assert (out[1].first_active, out[1].last_active) == (0, 1)
    assert (out[2].n_frames, out[2].n_active) == (2, 0)
    assert out[2].first_active is None
    assert (out[3].n_frames, out[3].n_active) == (2, 1)
    assert out[3].active_idx_sum == 1  # only frame 1; 30-sample tail gone
    assert out[4].decode_error is not None

    import pytest

    with pytest.raises(ValueError, match="frame_len"):
        audio_activity(rows, frame_len=0)
