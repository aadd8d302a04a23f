"""Multi-format IO roundtrips (formats.py): CSV / JSON-lines / ORC with
explicit schemas must carry the events table bit-identically back into the
engine — the ingest-boundary guarantee for non-parquet upstreams."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from flink_realtime_spark.formats import read_text_format, write_text_format
from flink_realtime_spark.streaming.sources import EVENTS_DDL_NTZ
from flink_realtime_spark.tables import load_table
from tests.conftest import SF_DIR


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_events_roundtrip(spark, fmt):
    ev = load_table(spark, SF_DIR, "events")
    d = tempfile.mkdtemp(prefix=f"fmt_{fmt}_")
    try:
        write_text_format(ev, d, fmt)
        back = read_text_format(spark, d, fmt, EVENTS_DDL_NTZ)
        assert back.schema == ev.schema
        a = sorted(map(tuple, ev.collect()))
        b = sorted(map(tuple, back.collect()))
        assert a == b
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_schema_evolution_missing_column_reads_null(spark):
    """Schema evolution at the ingest boundary: files written before a
    column existed must read under the widened schema with nulls — the
    contract that lets a layer's schema grow without rewriting history."""
    import os

    d = tempfile.mkdtemp(prefix="evolve_")
    try:
        ev = load_table(spark, SF_DIR, "events").limit(100)
        v1 = ev.select("event_id", "user_id")
        v2 = ev.select("event_id", "user_id", "value").filter("event_id >= 50")
        v1.filter("event_id < 50").coalesce(1).write.parquet(os.path.join(d, "p1"))
        v2.coalesce(1).write.parquet(os.path.join(d, "p2"))
        widened = spark.read.schema("event_id LONG, user_id LONG, value DOUBLE").parquet(
            os.path.join(d, "p1"), os.path.join(d, "p2")
        )
        assert widened.count() == 100
        assert widened.filter("value IS NULL").count() == 50
        assert widened.filter("value IS NOT NULL").count() == 50
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_binary_file_ingest_feeds_multimodal_pipeline(spark):
    """binaryFile ingest: fake media files on disk become (path, length,
    content BINARY) rows, glob-pruned at listing time, and flow into the
    multimodal metadata extractor shape (one row per file, bytes intact)."""
    import os

    from flink_realtime_spark.formats import read_binary_files

    d = tempfile.mkdtemp(prefix="media_")
    try:
        payloads = {}
        for i in range(6):
            name = f"img_{i}.jpg" if i % 2 == 0 else f"doc_{i}.txt"
            data = bytes([i]) * (10 + i)
            payloads[name] = data
            with open(os.path.join(d, name), "wb") as f:
                f.write(data)
        all_rows = read_binary_files(spark, d).collect()
        assert len(all_rows) == 6
        jpg = read_binary_files(spark, d, glob="*.jpg")
        rows = jpg.select("path", "length", "content").collect()
        assert len(rows) == 3  # glob pruned before any bytes moved
        for r in rows:
            name = os.path.basename(r["path"])
            assert bytes(r["content"]) == payloads[name]
            assert r["length"] == len(payloads[name])
    finally:
        shutil.rmtree(d, ignore_errors=True)
