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
    # interlace bit flipped on sequentially-stored rows: decodes (the
    # flag is honored since round 10) but to the PERMUTED row order —
    # same row multiset, different placement
    img_at = 13 + 768
    assert data[img_at] == 0x2C
    hacked = bytearray(data)
    hacked[img_at + 9] |= 0x40
    _, _, scrambled = gif_decode(bytes(hacked))
    assert not np.array_equal(scrambled, img)
    assert np.array_equal(
        np.sort(scrambled, axis=0), np.sort(img, axis=0)
    )
    with pytest.raises(ValueError, match="no image frame"):
        gif_decode(data[:13] + data[13 : 13 + 768] + b"\x3b")


def test_decode_image_sniffs_gif():
    img = _rng.randint(0, 256, size=(9, 9)).astype(np.uint8)
    w, h, out = decode_image(gif_encode_gray(img))
    assert (w, h) == (9, 9)
    assert np.array_equal(out, img)


# ---------------------------------------------------------------------------
# Round 10: interlaced images + animated compositing.
# ---------------------------------------------------------------------------

from nextbus2pg_spark.functions.gifcodec import (  # noqa: E402
    gif_decode_frames,
    gif_encode_gray_frames,
)


@pytest.mark.parametrize("shape", [(1, 1), (7, 5), (8, 8), (23, 17)])
def test_interlaced_roundtrip_is_exact(shape):
    """Four-pass Appendix-E row ordering: encode interlaced, decode
    back to the identical raster (GIF is lossless)."""
    img = _rng.randint(0, 256, size=shape).astype(np.uint8)
    w, h, out = gif_decode(gif_encode_gray(img, interlace=True))
    assert (w, h) == (shape[1], shape[0])
    assert np.array_equal(out, img)


def test_animated_compositing_full_semantics():
    """Placement rectangles, transparency, disposal 2, and an
    interlaced patch — each frame's canvas checked against a numpy
    replay of the GIF89a compositing rules."""
    rng = np.random.RandomState(11)
    sw, sh = 20, 12
    base = rng.randint(0, 256, size=(sh, sw)).astype(np.uint8)
    patch = rng.randint(0, 255, size=(4, 6)).astype(np.uint8)
    patch_t = patch.copy()
    patch_t[0, :] = 7  # transparent row
    data = gif_encode_gray_frames(
        (sw, sh),
        [
            {"img": base},
            {"img": patch, "left": 3, "top": 2},
            {"img": patch_t, "left": 10, "top": 5,
             "transparent": 7, "disposal": 2},
            {"img": patch, "left": 0, "top": 0, "interlace": True},
        ],
        background=9,
    )
    frames = gif_decode_frames(data)
    assert len(frames) == 4
    assert np.array_equal(frames[0], base)
    exp1 = base.copy()
    exp1[2:6, 3:9] = patch
    assert np.array_equal(frames[1], exp1)
    exp2 = exp1.copy()
    m = patch_t != 7
    exp2[5:9, 10:16][m] = patch_t[m]
    assert np.array_equal(frames[2], exp2)
    exp3 = exp1.copy()
    exp3[5:9, 10:16] = 9  # disposal 2 restored to background
    exp3[0:4, 0:6] = patch
    assert np.array_equal(frames[3], exp3)
    # gif_decode/info still return the FIRST frame's rectangle
    w, h, n, first = gif_decode_info(data)
    assert (w, h, n) == (sw, sh, 4)
    assert np.array_equal(first, base)


def test_animated_disposal_previous_raises():
    img = _rng.randint(0, 256, size=(4, 4)).astype(np.uint8)
    data = gif_encode_gray_frames(
        (4, 4), [{"img": img, "disposal": 3}]
    )
    with pytest.raises(ValueError, match="restore to previous"):
        gif_decode_frames(data)


def test_animated_frame_exceeding_screen_raises():
    img = _rng.randint(0, 256, size=(4, 4)).astype(np.uint8)
    with pytest.raises(ValueError, match="exceeds screen"):
        gif_encode_gray_frames((4, 4), [{"img": img, "left": 1}])
    # and decode-side: splice a too-large rect into a legal file
    data = bytearray(gif_encode_gray_frames((4, 4), [{"img": img}]))
    img_at = data.index(0x2C, 13 + 768)
    data[img_at + 1 : img_at + 3] = (2).to_bytes(2, "little")  # left=2
    with pytest.raises(ValueError, match="exceeds screen"):
        gif_decode_frames(bytes(data))


def test_decode_gif_frames_operator_quarantine(spark):
    """The Spark stage: sampled fanout rows plus the one-bad-row
    quarantine contract."""
    from nextbus2pg_spark.operators.multimodal import decode_gif_frames

    img = _rng.randint(0, 256, size=(6, 8)).astype(np.uint8)
    good = gif_encode_gray_frames(
        (8, 6), [{"img": img}, {"img": img}, {"img": img}]
    )
    rows = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"GIF89a junk"))],
        "media_id long, payload binary",
    )
    out = decode_gif_frames(rows, sample_every=2, on_error="null").collect()
    good_rows = sorted(
        (r.frame_idx for r in out if r.media_id == 1 and r.decode_error is None)
    )
    assert good_rows == [0, 2]
    bad = [r for r in out if r.media_id == 2]
    assert len(bad) == 1 and bad[0].decode_error is not None

    import pytest as _pytest

    with _pytest.raises(ValueError, match="sample_every"):
        decode_gif_frames(rows, sample_every=0)
