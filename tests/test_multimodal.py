"""Multimodal plumbing tests: schema, Arrow batch shape, stub behavior
(SURVEY.md §2.12 — codecs stubbed, Spark-side contract real)."""

from __future__ import annotations

import pytest

from nextbus2pg_spark.catalog import load_table
from nextbus2pg_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    MEDIA_SCHEMA,
    decode_media,
    extract_features,
    fake_media_from_documents,
    frame_sample,
    repartition_for_media,
)
from tests.conftest import SF_DIR_SMALL


def _media(spark):
    docs = load_table(spark, SF_DIR_SMALL, "documents")
    return fake_media_from_documents(docs)


def test_media_schema(spark):
    media = _media(spark)
    assert media.schema == MEDIA_SCHEMA or [f.name for f in media.schema] == [
        f.name for f in MEDIA_SCHEMA
    ]
    row = media.limit(1).collect()[0]
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.meta.sample_rate == 16000


def test_extract_features_batch_shape(spark):
    feats = extract_features(_media(spark))
    assert feats.schema == FEATURE_SCHEMA
    rows = feats.collect()
    assert len(rows) == 500
    r = {x.media_id: x for x in rows}
    # n_bytes equals n_chars for the ascii fixture text.
    docs = {
        d.doc_id: d.n_chars
        for d in load_table(spark, SF_DIR_SMALL, "documents").collect()
    }
    assert all(r[i].n_bytes == docs[i] for i in list(docs)[:20])
    assert all(len(x.head_hex) == 16 for x in rows)


def test_frame_sample_bounded_fanout(spark):
    frames = frame_sample(_media(spark), every_n_bytes=64)
    row = frames.limit(5).collect()
    for r in row:
        assert all(len(f) <= 64 for f in r.frames)
        assert b"".join(r.frames)  # lossless slicing


def test_repartition_for_media_caps_rows_per_partition(spark):
    """The Arrow-batch memory bound is actually enforced: after
    repartitioning, no partition holds more than the target row count —
    including for a skewed input (all rows crammed into one partition)."""
    import pyspark.sql.functions as F

    skewed = _media(spark).repartition(1)  # worst case: 500 rows, 1 part
    out = repartition_for_media(skewed, target_rows_per_partition=40)
    per_part = (
        out.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    assert sum(r["count"] for r in per_part) == 500
    assert max(r["count"] for r in per_part) <= 40

    # Known row count skips the count() job and still enforces the cap.
    out2 = repartition_for_media(
        skewed, target_rows_per_partition=40, n_rows=500
    )
    per_part2 = (
        out2.groupBy(F.spark_partition_id().alias("pid")).count().collect()
    )
    assert max(r["count"] for r in per_part2) <= 40

    with pytest.raises(ValueError):
        repartition_for_media(skewed, target_rows_per_partition=0)


def test_decode_media_real_png_round_trip(spark):
    """decode_media is REAL now (round-8): fabricate genuine
    zlib-compressed PNGs (filter types cycling through all five), run
    the distributed decode, and verify every raster bit-for-bit against
    the arithmetic grid it encodes."""
    import numpy as np

    from nextbus2pg_spark.operators.multimodal import synthetic_png_media

    docs = load_table(spark, SF_DIR_SMALL, "documents").limit(25)
    out = decode_media(synthetic_png_media(docs), spread=False).collect()
    assert len(out) == 25
    for r in out:
        d = r.media_id
        w, h = 16 + d % 16, 16 + d % 12
        assert (r.width, r.height, r.n_pixels) == (w, h, w * h)
        expect = ((d * 31 + np.arange(w * h, dtype=np.int64) * 7) % 256)
        assert r.pixel_sum == int(expect.sum())
        got = np.frombuffer(r.gray, dtype=np.uint8)
        assert np.array_equal(got, expect.astype(np.uint8))
        assert r.decode_error is None


def test_decode_media_strict_vs_quarantine(spark):
    """on_error='raise' fails loudly on garbage; on_error='null' routes
    it to the decode_error column (the quarantine-sink pattern). Empty
    payloads always quarantine — there is no format to be strict about."""
    rows = [
        (1, "image", bytearray(b"not an image at all"), None),
        (2, "image", None, None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    with pytest.raises(Exception, match="unrecognized image container"):
        decode_media(df.where("media_id = 1"), spread=False).collect()
    got = {
        r.media_id: r
        for r in decode_media(df, on_error="null", spread=False).collect()
    }
    assert got[1].gray is None and "unrecognized" in got[1].decode_error
    assert got[2].gray is None and got[2].decode_error == "empty payload"
    with pytest.raises(ValueError, match="on_error"):
        decode_media(df, on_error="ignore")


def test_decode_media_pnm_payloads(spark):
    """The PGM/PPM path through the same distributed stage: a P5 and a
    P6 payload both decode; the P6 reduces to gray via exact (r+g+b)//3."""
    import numpy as np

    from nextbus2pg_spark.functions.imagecodec import pnm_encode_gray

    img = (np.arange(12, dtype=np.uint8)).reshape(3, 4)
    p5 = bytes(pnm_encode_gray(img))
    rgb = bytes(
        b"P6\n# comment\n2 2\n255\n"
        + bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])
    )
    df = spark.createDataFrame(
        [(1, "image", bytearray(p5), None), (2, "image", bytearray(rgb), None)],
        MEDIA_SCHEMA,
    )
    got = {r.media_id: r for r in decode_media(df, spread=False).collect()}
    assert np.array_equal(
        np.frombuffer(got[1].gray, dtype=np.uint8), img.flatten()
    )
    assert list(np.frombuffer(got[2].gray, dtype=np.uint8)) == [
        20, 50, 80, 110
    ]


def test_dhash_and_resize_on_decoded_rasters(spark):
    """decode → phash → resize end-to-end on real bytes: the true dHash
    matches a numpy reference computed from the known grids, and resize
    gathers the exact nearest-neighbor pixels of the TRUE raster."""
    import numpy as np

    from nextbus2pg_spark.operators.multimodal import (
        dhash_decoded,
        resize_decoded,
        synthetic_png_media,
    )

    docs = load_table(spark, SF_DIR_SMALL, "documents").limit(10)
    decoded = decode_media(synthetic_png_media(docs), spread=False)
    hashes = {r.media_id: r.phash for r in dhash_decoded(decoded).collect()}
    thumbs = {r.media_id: r for r in
              resize_decoded(decoded, out_w=8, out_h=8).collect()}
    assert len(hashes) == 10
    for d, ph in hashes.items():
        w, h = 16 + d % 16, 16 + d % 12
        img = ((d * 31 + np.arange(w * h, dtype=np.int64) * 7) % 256) \
            .astype(np.uint8).reshape(h, w)
        rows = (np.arange(8) * h) // 8
        cols = (np.arange(9) * w) // 9
        g = img[np.ix_(rows, cols)].astype(int)
        bits = (g[:, :-1] < g[:, 1:]).flatten()
        ref = int.from_bytes(np.packbits(bits).tobytes(), "big")
        assert ph == ref & 0x7FFFFFFFFFFFFFFF
        trows = (np.arange(8) * h) // 8
        tcols = (np.arange(8) * w) // 8
        assert thumbs[d].thumb == img[np.ix_(trows, tcols)].tobytes()
        assert (thumbs[d].width, thumbs[d].height) == (8, 8)


def test_resize_media_fixed_output_size(spark):
    """Every thumb is exactly out_w*out_h bytes regardless of input
    payload size; NULL/empty payloads give NULL thumbs; dimensions are
    recorded in the row."""
    from nextbus2pg_spark.operators.multimodal import (
        fake_media_from_documents,
        resize_media,
    )

    docs = spark.createDataFrame(
        [(1, "x" * 5, 5), (2, "y" * 5000, 5000), (3, "", 0)],
        "doc_id long, text string, n_chars long",
    )
    out = {
        r.media_id: r
        for r in resize_media(
            fake_media_from_documents(docs), out_w=16, out_h=16
        ).collect()
    }
    assert len(out[1].thumb) == 256 and len(out[2].thumb) == 256
    assert out[3].thumb is None
    assert out[1].width == 16 and out[1].height == 16


def test_resize_media_deterministic_and_content_sensitive(spark):
    """Same payload -> identical thumb across runs; different payloads
    -> different thumbs (the fake decode is a function of the bytes)."""
    from nextbus2pg_spark.operators.multimodal import (
        fake_media_from_documents,
        resize_media,
    )

    docs = spark.createDataFrame(
        [(1, "abc def ghi jkl" * 40, 600), (2, "zzz yyy xxx www" * 40, 600)],
        "doc_id long, text string, n_chars long",
    )
    media = fake_media_from_documents(docs)
    a = {r.media_id: r.thumb for r in resize_media(media).collect()}
    b = {r.media_id: r.thumb for r in resize_media(media).collect()}
    assert a == b
    assert a[1] != a[2]
