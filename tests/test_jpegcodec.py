"""Baseline JPEG codec (functions/jpegcodec.py): encode/decode
round-trips across container variants (grayscale, restart markers,
3-component YCbCr at all supported samplings), constant-block
exactness (the oracle's lossless trick), and loud failures on
unsupported variants. No Spark session needed."""

from __future__ import annotations

import numpy as np
import pytest

from nextbus2pg_spark.functions.imagecodec import decode_image
from nextbus2pg_spark.functions.jpegcodec import (
    jpeg_decode,
    jpeg_encode_gray,
    jpeg_encode_ycbcr,
)

_rng = np.random.RandomState(42)


def _blocky(bh, bw, seed=0):
    """Image constant per 8x8 block — the oracle's exactness shape."""
    bi = np.arange(bh, dtype=np.int64).reshape(-1, 1)
    bj = np.arange(bw, dtype=np.int64)
    vals = (seed * 37 + bi * 19 + bj * 7) % 256
    return np.kron(vals, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)


@pytest.mark.parametrize("bh,bw", [(1, 1), (2, 3), (3, 2), (4, 4)])
def test_constant_block_roundtrip_is_bit_exact(bh, bw):
    """quant=1 + per-block-constant pixels → only the DC coefficient
    is nonzero (an exact integer), so the LOSSY format round-trips
    losslessly — the property the q_media_decode_jpeg oracle relies
    on."""
    img = _blocky(bh, bw, seed=bh * 10 + bw)
    w, h, out = jpeg_decode(jpeg_encode_gray(img, quant=1))
    assert (w, h) == (img.shape[1], img.shape[0])
    assert np.array_equal(out, img)


@pytest.mark.parametrize(
    "shape", [(8, 8), (16, 24), (17, 23), (1, 1), (5, 40), (33, 9)]
)
def test_arbitrary_image_roundtrip_within_quant_error(shape):
    """Random images exercise the AC run-length/ZRL paths constant
    blocks cannot; at quant=1 reconstruction error is bounded by
    coefficient rounding (≤2 greylevels)."""
    img = _rng.randint(0, 256, size=shape).astype(np.uint8)
    w, h, out = jpeg_decode(jpeg_encode_gray(img, quant=1))
    assert (w, h) == (shape[1], shape[0])
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


@pytest.mark.parametrize("interval", [1, 2, 5])
def test_restart_markers_resync_dc_predictors(interval):
    """DRI/RSTn: byte-aligned resync + DC predictor reset — a decoder
    that misses either corrupts every block after the first marker."""
    img = _rng.randint(0, 256, size=(24, 40)).astype(np.uint8)
    data = jpeg_encode_gray(img, quant=1, restart_interval=interval)
    assert b"\xff\xdd" in data  # DRI present
    w, h, out = jpeg_decode(data)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


@pytest.mark.parametrize("sampling", [(1, 1), (2, 1), (1, 2), (2, 2)])
@pytest.mark.parametrize("shape", [(16, 16), (17, 23)])
def test_ycbcr_decodes_luma_through_interleaved_mcus(sampling, shape):
    """3-component scans: chroma blocks must be entropy-decoded to
    keep the bitstream aligned even though only Y is reconstructed.
    Covers 4:4:4 / 4:2:2 / 4:2:0 MCU geometries."""
    y = _rng.randint(0, 256, size=shape).astype(np.uint8)
    data = jpeg_encode_ycbcr(y, sampling=sampling, quant=1)
    w, h, out = jpeg_decode(data)
    assert (w, h) == (shape[1], shape[0])
    assert np.abs(out.astype(int) - y.astype(int)).max() <= 2


def test_color_constant_blocks_stay_exact():
    """The fixture's d%4==0 branch: constant blocks survive the color
    container bit-exactly too (chroma carries no luma information)."""
    img = _blocky(2, 4, seed=8)
    w, h, out = jpeg_decode(jpeg_encode_ycbcr(img, sampling=(2, 2)))
    assert np.array_equal(out, img)


def test_lossy_quant_degrades_gracefully():
    img = (np.add.outer(np.arange(64), np.arange(64)) * 2).astype(np.uint8)
    data = jpeg_encode_gray(img, quant=16)
    _, _, out = jpeg_decode(data)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 20


def test_progressive_and_malformed_raise_value_error():
    data = jpeg_encode_gray(_blocky(2, 2))
    progressive = data.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="baseline"):
        jpeg_decode(progressive)
    with pytest.raises(ValueError, match="SOI"):
        jpeg_decode(b"\x00\x01\x02")
    # truncated mid-entropy: quarantine contract via decode_image
    with pytest.raises(ValueError):
        decode_image(data[: len(data) // 2])


def test_decode_image_sniffs_jpeg_magic():
    img = _blocky(2, 2, seed=5)
    w, h, out = decode_image(jpeg_encode_gray(img))
    assert (w, h) == (16, 16)
    assert np.array_equal(out, img)


def test_encoder_rejects_bad_inputs():
    with pytest.raises(ValueError, match="grayscale"):
        jpeg_encode_gray(np.zeros((2, 2, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="non-empty"):
        jpeg_encode_gray(np.zeros((0, 4), dtype=np.uint8))
    with pytest.raises(ValueError, match="quantization"):
        jpeg_encode_gray(_blocky(1, 1), quant=0)
    with pytest.raises(ValueError, match="sampling"):
        jpeg_encode_ycbcr(_blocky(1, 1), sampling=(3, 1))
