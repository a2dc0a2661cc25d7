"""EXIF codec (functions/exifcodec.py): APP1/TIFF roundtrips across
both byte orders, inline vs offset value storage, all eight
orientation transforms, and the Spark-side oriented decode operator
(operators/multimodal.exif_oriented_decode)."""

from __future__ import annotations

import numpy as np
import pytest

from nextbus2pg_spark.functions.exifcodec import (
    apply_orientation,
    exif_app1,
    exif_parse,
    with_exif,
)
from nextbus2pg_spark.functions.jpegcodec import (
    jpeg_decode,
    jpeg_encode_gray,
)

_rng = np.random.RandomState(7)


def _jpeg(h=16, w=16):
    return jpeg_encode_gray(
        _rng.randint(0, 256, size=(h, w)).astype(np.uint8), quant=1
    )


@pytest.mark.parametrize("byte_order", ["II", "MM"])
def test_app1_roundtrip_both_byte_orders(byte_order):
    app1 = exif_app1(
        "CamCo", "M-7", 6, "2026:08:16 01:00:00", 16, 12,
        byte_order=byte_order,
    )
    fields = exif_parse(with_exif(_jpeg(), app1))
    assert fields == {
        "make": "CamCo",
        "model": "M-7",
        "orientation": 6,
        "datetime": "2026:08:16 01:00:00",
        "exif_width": 16,
        "exif_height": 12,
    }


def _blocky(bh, bw, seed=0):
    """Block-constant grid — exact through the lossy JPEG roundtrip."""
    bi = np.arange(bh, dtype=np.int64).reshape(-1, 1)
    bj = np.arange(bw, dtype=np.int64)
    vals = (seed * 53 + bi * 29 + bj * 13) % 256
    return np.kron(vals, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)


def test_inline_values_and_decode_transparency():
    """Strings ≤ 3 chars store inline (≤ 4 bytes with NUL) — the other
    TIFF value-storage branch; and the raster decode must be
    unaffected by the APP1 splice (block-constant grid: bit-exact)."""
    img = _blocky(2, 2, seed=4)
    base = jpeg_encode_gray(img, quant=1)
    data = with_exif(base, exif_app1("abc", "x", 1, "d", 3, 4))
    assert exif_parse(data)["make"] == "abc"
    assert exif_parse(data)["model"] == "x"
    _, _, out = jpeg_decode(data)
    assert np.array_equal(out, img)


def test_no_exif_returns_none_and_malformed_raises():
    assert exif_parse(_jpeg()) is None
    app1 = exif_app1("a", "b", 1, "c", 1, 1)
    data = bytearray(with_exif(_jpeg(), app1))
    # corrupt the TIFF byte-order mark inside the APP1 body
    idx = bytes(data).index(b"Exif\x00\x00") + 6
    data[idx : idx + 2] = b"XX"
    with pytest.raises(ValueError, match="byte order"):
        exif_parse(bytes(data))
    with pytest.raises(ValueError, match="SOI"):
        exif_parse(b"nope")


def test_all_eight_orientations():
    """Shape, corner provenance, and sum invariance for every EXIF
    orientation value — pinned against the Exif 2.3 corner table."""
    h, w = 3, 5
    x = np.arange(h * w).reshape(h, w)
    corner = {
        1: x[0, 0], 2: x[0, w - 1], 3: x[h - 1, w - 1], 4: x[h - 1, 0],
        5: x[0, 0], 6: x[h - 1, 0], 7: x[h - 1, w - 1], 8: x[0, w - 1],
    }
    for o in range(1, 9):
        out = apply_orientation(x, o)
        assert out.shape == ((w, h) if o >= 5 else (h, w)), o
        assert out[0, 0] == corner[o], o
        assert out.sum() == x.sum()
    with pytest.raises(ValueError, match="orientation"):
        apply_orientation(x, 9)


def test_orientation_roundtrip_pairs():
    """6 and 8 are inverse rotations; 2/3/4/5/7 are involutions."""
    x = _rng.randint(0, 256, size=(4, 7))
    assert np.array_equal(
        apply_orientation(apply_orientation(x, 6), 8), x
    )
    for o in (2, 3, 4, 5, 7):
        assert np.array_equal(
            apply_orientation(apply_orientation(x, o), o), x
        ), o


def test_exif_oriented_decode_operator(spark):
    """The Spark stage end-to-end: provenance fields, uprighted
    geometry, and the quarantine contract."""
    from nextbus2pg_spark.operators.multimodal import exif_oriented_decode

    img = _blocky(2, 3, seed=9)  # 16 x 24, exact roundtrip
    payload = with_exif(
        jpeg_encode_gray(img, quant=1),
        exif_app1("Cam", "M", 6, "2026:01:01 00:00:00", 24, 16),
    )
    plain = jpeg_encode_gray(img, quant=1)
    rows = spark.createDataFrame(
        [
            (1, bytearray(payload)),
            (2, bytearray(plain)),
            (3, bytearray(b"\xff\xd8broken")),
        ],
        "media_id long, payload binary",
    )
    out = {
        r.media_id: r
        for r in exif_oriented_decode(rows, on_error="null").collect()
    }
    r1 = out[1]
    assert (r1.make, r1.model, r1.orientation) == ("Cam", "M", 6)
    assert (r1.width, r1.height) == (16, 24)  # rotated 90: swapped
    up = apply_orientation(img, 6)
    assert r1.top_left == int(up[0, 0])
    assert r1.pixel_sum == int(img.sum(dtype="int64"))
    r2 = out[2]
    assert r2.make is None and r2.orientation == 1
    assert (r2.width, r2.height) == (24, 16)
    assert out[3].decode_error is not None

    with pytest.raises(ValueError, match="on_error"):
        exif_oriented_decode(rows, on_error="bogus")
