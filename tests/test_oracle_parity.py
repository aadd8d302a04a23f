"""Differential oracle parity — replicates the driver's CORRECTNESS check
locally (SURVEY.md §5.1): for every registered query key with an oracle,
run the Spark plan and the DuckDB SQL on the same sf0.01 parquet and demand
exact value equality after column-name sort + row sort. Keys without an
oracle get a rows-return smoke check here (driver runs rows-only too)."""

from __future__ import annotations

import pytest

from flink_realtime_spark import registry
from tests.conftest import SF_DIR, assert_frames_match

registry.load_all()

ORACLE_KEYS = sorted(k for k in registry.QUERIES if k in registry.ORACLES)
ROWS_ONLY_KEYS = sorted(k for k in registry.QUERIES if k not in registry.ORACLES)


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_oracle_parity(spark, duck, key):
    spark_pdf = registry.QUERIES[key](spark, SF_DIR).toPandas()
    oracle_pdf = duck.execute(registry.ORACLES[key]).fetchdf()
    assert_frames_match(spark_pdf, oracle_pdf, key)


@pytest.mark.parametrize("key", ROWS_ONLY_KEYS)
def test_rows_only_smoke(spark, key):
    df = registry.QUERIES[key](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    out = e.entry(spark)
    rows = out.collect()
    assert len(rows) > 0
    assert {"r_name", "o_orderpriority", "l_returnflag", "revenue"} <= set(
        out.columns
    )
