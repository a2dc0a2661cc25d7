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


def test_decode_media_is_explicit_stub(spark):
    with pytest.raises(Exception) as ei:
        decode_media(_media(spark).limit(1)).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


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
