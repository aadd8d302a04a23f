"""Multi-format IO roundtrips (formats.py): CSV / JSON-lines / ORC with
explicit schemas must carry the events table bit-identically back into the
engine — the ingest-boundary guarantee for non-parquet upstreams."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from flink_realtime_spark.formats import read_text_format, write_text_format
from flink_realtime_spark.streaming.sources import EVENTS_DDL
from flink_realtime_spark.tables import load_table
from tests.conftest import SF_DIR


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_events_roundtrip(spark, fmt):
    ev = load_table(spark, SF_DIR, "events")
    d = tempfile.mkdtemp(prefix=f"fmt_{fmt}_")
    try:
        write_text_format(ev, d, fmt)
        back = read_text_format(spark, d, fmt, EVENTS_DDL)
        assert back.schema == ev.schema
        a = sorted(map(tuple, ev.collect()))
        b = sorted(map(tuple, back.collect()))
        assert a == b
    finally:
        shutil.rmtree(d, ignore_errors=True)
