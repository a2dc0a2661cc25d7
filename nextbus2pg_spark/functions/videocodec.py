"""Pure-stdlib AVI (MJPEG) container codec for the multimodal pipeline.

The video leg of the multimodal surface, implemented from the
published RIFF/AVI layout — the same stance as the WAV/PNG/JPEG
codecs: REAL container work (RIFF list walk, ``avih`` main header,
``movi`` frame chunks) with the baseline JPEG codec
(``functions/jpegcodec.py``) decoding each frame. Motion-JPEG is the
honest choice for a no-native-deps environment: every frame is a
standalone baseline JPEG, so the demuxer + still-image decoder pair
IS the video decoder — no inter-frame prediction state. H.264-class
codecs need native decoders and are explicitly out of scope; corpora
transcode upstream (the documented scope rule of all codecs here).

Scope (checked, raised on): single video stream, ``00dc``/``00db``
frame chunks in one ``movi`` list, no ``idx1`` required (the walk
reads the chunks in stream order, skipping unknown chunks and odd-size
pad bytes per RIFF).
"""

from __future__ import annotations

import struct

import numpy as np

AVI_MAGIC = b"RIFF"


def _chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return tag + struct.pack("<I", len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def avi_encode_mjpeg(
    frames: "list[bytes]", width: int, height: int, fps: int = 10
) -> bytes:
    """Wrap pre-encoded JPEG frames in a real single-stream AVI:
    RIFF('AVI ') → LIST hdrl(avih, LIST strl(strh 'vids'/'MJPG',
    strf BITMAPINFOHEADER)) → LIST movi('00dc' per frame)."""
    if not frames:
        raise ValueError("frames must be non-empty")
    if width < 1 or height < 1 or fps < 1:
        raise ValueError(f"bad dimensions/fps: {width}x{height}@{fps}")
    us_per_frame = 1_000_000 // fps
    avih = struct.pack(
        "<IIIIIIIIII4I",
        us_per_frame, 0, 0, 0x10, len(frames), 0, 1, 0,
        width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, len(frames),
        0, 0xFFFFFFFF, 0, 0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3,
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_decode_frames(data: bytes) -> tuple[int, int, int, "list[bytes]"]:
    """Demux an AVI → ``(width, height, total_frames, [jpeg bytes])``.

    Real RIFF walk: outer 'AVI ' form, ``avih`` from the hdrl list for
    declared dimensions/frame count, then every ``00dc``/``00db``
    chunk inside the ``movi`` list in stream order. Unknown chunks and
    odd-size pads are skipped per RIFF. Raises ``ValueError`` on
    malformed containers (the decode quarantine contract)."""
    if data[:4] != AVI_MAGIC or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload (bad magic)")
    width = height = total = None
    frames: "list[bytes]" = []

    def walk(buf: bytes) -> None:
        nonlocal width, height, total
        pos = 0
        while pos + 8 <= len(buf):
            tag = buf[pos : pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body = buf[pos + 8 : pos + 8 + size]
            if len(body) != size:
                raise ValueError(f"AVI chunk {tag!r} truncated")
            if tag == b"LIST":
                walk(body[4:])  # recurse past the list kind
            elif tag == b"avih":
                if size < 40:
                    raise ValueError("AVI avih header too short")
                fields = struct.unpack("<10I", body[:40])
                total = fields[4]
                width, height = fields[8], fields[9]
            elif tag in (b"00dc", b"00db"):
                frames.append(body)
            pos += 8 + size + (size & 1)

    walk(data[12:])
    if width is None:
        raise ValueError("AVI missing avih header")
    return int(width), int(height), int(total or 0), frames


def decode_mjpeg_frames(
    data: bytes, sample_every: int = 1
) -> "list[tuple[int, int, int, np.ndarray]]":
    """Demux + decode every ``sample_every``-th frame →
    ``[(frame_idx, width, height, gray raster)]`` — the frame-sampling
    primitive a video-curation stage runs (dHash per sampled frame,
    inter-frame diff, thumbnail stats)."""
    from nextbus2pg_spark.functions.jpegcodec import jpeg_decode

    if sample_every < 1:
        raise ValueError(f"sample_every must be >= 1; got {sample_every}")
    _w, _h, _n, frames = avi_decode_frames(data)
    out = []
    for idx in range(0, len(frames), sample_every):
        fw, fh, gray = jpeg_decode(frames[idx])
        out.append((idx, fw, fh, gray))
    return out
