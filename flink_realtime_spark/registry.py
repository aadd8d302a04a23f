"""Query-key registry.

Every operator from SURVEY.md §2 lands here as a named query: a callable
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) the equivalent
ANSI SQL the DuckDB oracle runs on the same parquet tables. The driver
contract (__spark_entry__.py) is a thin view over this registry.

Determinism discipline (SURVEY.md §7.4):
- alias every computed column identically in Spark and oracle SQL;
- double aggregates go through per-row DECIMAL(18,4) casts before SUM so the
  result is exact and independent of accumulation order, then back to DOUBLE;
- integer-valued computed columns cast to BIGINT on both sides (Spark year()
  is int32, DuckDB's is int64);
- session timezone pinned to UTC inside every query via session.prepare().
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_MODULES = [
    "flink_realtime_spark.operators.relational",
    "flink_realtime_spark.operators.joins",
    "flink_realtime_spark.operators.subqueries",
    "flink_realtime_spark.operators.aggregates",
    "flink_realtime_spark.operators.metrics",
    "flink_realtime_spark.operators.tpch",
    "flink_realtime_spark.operators.windows",
    "flink_realtime_spark.operators.analytic",
    "flink_realtime_spark.functions.scalar",
    "flink_realtime_spark.functions.udx",
    "flink_realtime_spark.streaming.stateful",
    "flink_realtime_spark.streaming.sources",
    "flink_realtime_spark.streaming.sinks",
    "flink_realtime_spark.llm.dedup",
    "flink_realtime_spark.llm.similarity",
    "flink_realtime_spark.llm.text",
    "flink_realtime_spark.llm.multimodal",
    "flink_realtime_spark.llm.sampling",
]

_loaded = False


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query key. ``oracle`` is the DuckDB ANSI SQL counterpart;
    omit it for non-SQL-expressible ops (driver then runs rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query key: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so their @query decorators run."""
    global _loaded
    if _loaded:
        return
    for mod in _MODULES:
        importlib.import_module(mod)
    _loaded = True
