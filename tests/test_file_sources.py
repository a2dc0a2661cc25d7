"""File-source surface tests: schema-explicit CSV/JSONL round-trips,
corrupt-record capture, streaming-parquet schema requirement, and
batch/streaming reader parity."""

from __future__ import annotations

import pytest

from nextbus2pg_spark.sources.files import (
    read_csv,
    read_jsonl,
    read_parquet,
    write_csv,
    write_jsonl,
)

SCHEMA = "vehicle_id string, lat double, n int"
ROWS = [("v1", 37.7, 1), ("v2", -12.5, 2)]


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    p = str(tmp_path / "csv")
    write_csv(df, p)
    back = read_csv(spark, p, SCHEMA)
    assert sorted(tuple(r) for r in back.collect()) == sorted(ROWS)
    assert back.schema.simpleString() == df.schema.simpleString()


def test_jsonl_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    p = str(tmp_path / "jl")
    write_jsonl(df, p)
    back = read_jsonl(spark, p, SCHEMA)
    assert sorted(tuple(r) for r in back.collect()) == sorted(ROWS)


def test_csv_corrupt_record_capture(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "data.csv").write_text("vehicle_id,lat,n\nv1,37.7,1\nv2,not_a_number,2\n")
    df = read_csv(spark, str(p), SCHEMA + ", _corrupt_record string")
    rows = df.collect()
    bad = [r for r in rows if r._corrupt_record is not None]
    good = [r for r in rows if r._corrupt_record is None]
    assert len(bad) == 1 and "not_a_number" in bad[0]._corrupt_record
    assert [r.vehicle_id for r in good] == ["v1"]


def test_streaming_parquet_requires_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        read_parquet(spark, str(tmp_path), streaming=True)


def test_streaming_reader_matches_batch(spark, tmp_path):
    """Same definition serves backfill and live pipeline: streaming
    read of the same files yields the same rows."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    p = str(tmp_path / "stream_src")
    write_jsonl(df, p)
    out = str(tmp_path / "stream_out")
    stream = read_jsonl(spark, p, SCHEMA, streaming=True)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "sck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    back = spark.read.parquet(out)
    assert sorted(tuple(r) for r in back.collect()) == sorted(ROWS)
