"""Pure-stdlib image codec (functions/imagecodec.py): PNG encode/decode
round-trips through every filter type, PNM parsing per the netpbm spec,
and loud failures on unsupported variants. No Spark session needed."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from nextbus2pg_spark.functions.imagecodec import (
    PNG_SIGNATURE,
    decode_image,
    png_decode,
    png_encode_gray,
    pnm_decode,
    pnm_encode_gray,
)


def _grid(h, w, seed=0):
    return (
        (seed * 31 + np.arange(h * w, dtype=np.int64) * 7) % 256
    ).astype(np.uint8).reshape(h, w)


@pytest.mark.parametrize("h,w", [(1, 1), (1, 7), (5, 1), (6, 6), (11, 17)])
def test_png_round_trip_cycle_filters(h, w):
    """filter_mode='cycle' walks scanlines through None/Sub/Up/Average/
    Paeth — an (11, 17) image exercises every reconstruction branch at
    least twice; round-trip must be bit-exact."""
    img = _grid(h, w, seed=h * 100 + w)
    data = png_encode_gray(img, filter_mode="cycle")
    assert data[:8] == PNG_SIGNATURE
    dw, dh, gray = png_decode(data)
    assert (dw, dh) == (w, h)
    assert np.array_equal(gray, img)


def test_png_round_trip_none_filters():
    img = _grid(9, 13, seed=3)
    dw, dh, gray = png_decode(png_encode_gray(img, filter_mode="none"))
    assert (dw, dh) == (13, 9) and np.array_equal(gray, img)


@pytest.mark.parametrize(
    "h,w",
    # sub-8 sizes skip entire Adam7 passes; odd sizes exercise the
    # ceil sub-image dims; >=16 runs all seven passes multi-row
    [(1, 1), (3, 5), (7, 7), (8, 8), (9, 13), (16, 21), (33, 40)],
)
def test_png_adam7_round_trip(h, w):
    """Adam7 interlaced encode/decode is bit-exact and equals the
    sequential decode of the same grid, across both filter modes."""
    img = _grid(h, w, seed=h * 7 + w)
    for fm in ("none", "cycle"):
        data = png_encode_gray(img, filter_mode=fm, interlace=True)
        # IHDR interlace byte really is 1 (offset: sig 8 + len/tag 8 +
        # 12 bytes of w/h/depth/color/comp/filter)
        assert data[8 + 8 + 12] == 1
        dw, dh, gray = png_decode(data)
        assert (dw, dh) == (w, h)
        assert np.array_equal(gray, img), (h, w, fm)
        seq = png_decode(png_encode_gray(img, filter_mode=fm))[2]
        assert np.array_equal(gray, seq)


def test_png_adam7_truncated_pass_raises():
    """An interlaced stream cut mid-pass (or padded past the passes)
    must fail loudly, not scatter garbage."""
    img = _grid(16, 16, seed=5)
    data = png_encode_gray(img, interlace=True)
    # rebuild the IDAT with one raw byte missing / one extra
    pos = data.find(b"IDAT") - 4
    (length,) = struct.unpack(">I", data[pos : pos + 4])
    raw = zlib.decompress(data[pos + 8 : pos + 8 + length])

    def rebuild(new_raw):
        body = zlib.compress(new_raw, 6)
        chunk = (
            struct.pack(">I", len(body)) + b"IDAT" + body
            + struct.pack(
                ">I", zlib.crc32(b"IDAT" + body) & 0xFFFFFFFF
            )
        )
        return data[:pos] + chunk + data[pos + 12 + length :]

    with pytest.raises(ValueError, match="too short"):
        png_decode(rebuild(raw[:-1]))
    with pytest.raises(ValueError, match="Adam7"):
        png_decode(rebuild(raw + b"\x00"))


def _png_color(w, h, pixels, ctype):
    ch = {2: 3, 6: 4}[ctype]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = bytearray()
    for r in range(h):
        raw.append(0)
        raw.extend(bytes(pixels[r * w * ch : (r + 1) * w * ch]))

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_rgb_and_rgba_reduce_to_exact_integer_gray():
    # 2x1 RGB: (10, 20, 31) -> 61//3 = 20; (255, 0, 1) -> 256//3 = 85
    w, h, gray = png_decode(_png_color(2, 1, [10, 20, 31, 255, 0, 1], 2))
    assert (w, h) == (2, 1) and list(gray.flatten()) == [20, 85]
    # RGBA: alpha ignored entirely
    w, h, gray = png_decode(
        _png_color(1, 1, [10, 20, 31, 200], 6)
    )
    assert list(gray.flatten()) == [20]


def test_png_crc_corruption_detected():
    data = bytearray(png_encode_gray(_grid(4, 4)))
    data[-5] ^= 0xFF  # flip a byte inside IEND's CRC
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(data))


def test_png_unsupported_variants_raise():
    # 16-bit depth
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    data = PNG_SIGNATURE + chunk(b"IHDR", ihdr)
    with pytest.raises(ValueError, match="unsupported PNG variant"):
        png_decode(data)
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"GIF89a" + b"\x00" * 20)


def test_pnm_round_trip_and_header_parsing():
    img = _grid(3, 5, seed=9)
    w, h, gray = pnm_decode(pnm_encode_gray(img))
    assert (w, h) == (5, 3) and np.array_equal(gray, img)
    # comments + arbitrary whitespace in the header
    data = b"P5 # inline\n# full line comment\n 5\t3 \n255\n" + img.tobytes()
    w, h, gray = pnm_decode(data)
    assert (w, h) == (5, 3) and np.array_equal(gray, img)
    with pytest.raises(ValueError, match="maxval"):
        pnm_decode(b"P5\n1 1\n65535\n\x00\x00")
    with pytest.raises(ValueError, match="magic"):
        pnm_decode(b"P3\n1 1\n255\n0")


def test_decode_image_sniffs_by_magic():
    img = _grid(2, 2)
    assert np.array_equal(decode_image(png_encode_gray(img))[2], img)
    assert np.array_equal(decode_image(pnm_encode_gray(img))[2], img)
    # JPEG magic is RECOGNIZED since round 9 (functions/jpegcodec.py):
    # a garbage body raises a JPEG-specific ValueError, not
    # "unrecognized container" (tests/test_jpegcodec.py covers real
    # decodes through this sniff).
    with pytest.raises(ValueError, match="truncated|malformed"):
        decode_image(b"\xff\xd8\xff\xe0 fake jpeg")
    # GIF is recognized since round 9 too (functions/gifcodec.py)
    with pytest.raises(ValueError, match="GIF"):
        decode_image(b"GIF89a not a real gif body")
    with pytest.raises(ValueError, match="unrecognized image container"):
        decode_image(b"BM bitmap not supported")


def _corrupt_idat(data: bytes) -> bytes:
    """Flip bytes inside the IDAT body and RE-SIGN the CRC, so the
    chunk walk passes and zlib.decompress is what fails."""
    pos = 8
    out = bytearray(data)
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if tag == b"IDAT":
            body = bytearray(data[pos + 8 : pos + 8 + length])
            for i in range(min(4, len(body))):
                body[i] ^= 0xFF
            out[pos + 8 : pos + 8 + length] = body
            crc = zlib.crc32(b"IDAT" + bytes(body)) & 0xFFFFFFFF
            out[pos + 8 + length : pos + 12 + length] = struct.pack(
                ">I", crc
            )
            return bytes(out)
        pos += 12 + length
    raise AssertionError("no IDAT found")


def test_corrupt_idat_surfaces_as_value_error():
    """Round-8 advice: zlib.error from a corrupt DEFLATE stream must be
    translated to ValueError so decode_media's quarantine mode
    (on_error='null') routes it to decode_error instead of crashing."""
    data = _corrupt_idat(png_encode_gray(_grid(8, 8, seed=3)))
    with pytest.raises(ValueError, match="malformed image payload"):
        decode_image(data)


def test_truncated_chunk_surfaces_as_value_error():
    """struct.error from a chunk header cut mid-length-field must also
    surface as ValueError (same quarantine contract)."""
    data = png_encode_gray(_grid(8, 8, seed=4))
    # signature + IHDR length/tag + 5 of 13 body bytes: the chunk walk
    # enters (pos+8 <= len) but the CRC unpack reads an empty slice.
    truncated = data[: 8 + 8 + 5]
    with pytest.raises(ValueError, match="malformed image payload"):
        decode_image(truncated)
