"""GIF codec (functions/gifcodec.py): lossless LZW round trips with
dictionary growth and resets, the KwKwK decoder case, multi-frame
walking, extension skipping, and loud failures. No Spark needed."""

from __future__ import annotations

import numpy as np
import pytest

from nextbus2pg_spark.functions.gifcodec import (
    _lzw_compress,
    _lzw_decompress,
    gif_decode,
    gif_decode_info,
    gif_encode_gray,
)
from nextbus2pg_spark.functions.imagecodec import decode_image

_rng = np.random.RandomState(3)


@pytest.mark.parametrize(
    "shape", [(1, 1), (8, 8), (17, 23), (64, 64), (3, 200)]
)
def test_round_trip_is_lossless(shape):
    img = _rng.randint(0, 256, size=shape).astype(np.uint8)
    w, h, out = gif_decode(gif_encode_gray(img))
    assert (w, h) == (shape[1], shape[0])
    assert np.array_equal(out, img)


def test_lzw_dictionary_growth_and_reset():
    """A large repetitive image drives the string table to 4096 and
    through CLEAR resets; the stream must still decode exactly and
    actually compress (real LZW, not the uncompressed-GIF trick)."""
    img = np.tile(np.arange(256, dtype=np.uint8), (64, 4))
    data = gif_encode_gray(img)
    assert len(data) < img.size // 2  # genuinely compressed
    _, _, out = gif_decode(data)
    assert np.array_equal(out, img)


def test_lzw_kwkwk_case():
    """The code==len(table) special case (KwKwK): aaaa... emits a code
    for a string the decoder hasn't finished building."""
    idx = [5] * 64
    assert _lzw_decompress(_lzw_compress(idx, 8), 8) == idx


def test_extensions_skipped_and_frames_counted():
    img = _rng.randint(0, 256, size=(6, 6)).astype(np.uint8)
    data = gif_encode_gray(img)
    # the image descriptor sits at the STRUCTURAL offset 13 (header +
    # LSD) + 768 (global palette) — bytes.index(0x2c) would find a
    # palette byte instead
    img_at = 13 + 768
    assert data[img_at] == 0x2C
    # splice a Graphic Control Extension before the image block, and a
    # SECOND image frame before the trailer
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    second = data[img_at:-1]  # the image block again
    spliced = data[:img_at] + gce + data[img_at:-1] + second + b"\x3b"
    w, h, n_frames, gray = gif_decode_info(spliced)
    assert (w, h, n_frames) == (6, 6, 2)
    assert np.array_equal(gray, img)  # FIRST frame decoded


def test_malformed_gifs_raise():
    img = _rng.randint(0, 256, size=(6, 6)).astype(np.uint8)
    data = gif_encode_gray(img)
    with pytest.raises(ValueError, match="signature"):
        gif_decode(b"GIF88a" + data[6:])
    with pytest.raises(ValueError, match="truncated"):
        gif_decode(data[:-8])
    # interlace flag set on the image descriptor (structural offset)
    img_at = 13 + 768
    assert data[img_at] == 0x2C
    hacked = bytearray(data)
    hacked[img_at + 9] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        gif_decode(bytes(hacked))
    with pytest.raises(ValueError, match="no image frame"):
        gif_decode(data[:13] + data[13 : 13 + 768] + b"\x3b")


def test_decode_image_sniffs_gif():
    img = _rng.randint(0, 256, size=(9, 9)).astype(np.uint8)
    w, h, out = decode_image(gif_encode_gray(img))
    assert (w, h) == (9, 9)
    assert np.array_equal(out, img)
