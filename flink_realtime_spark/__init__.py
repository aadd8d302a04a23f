"""flink_realtime_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference project Enzonna/Flink-realtime (a Flink real-time data warehouse,
"Flink实时数仓"; snapshot at /root/reference — sole content README.md:1-2).
The capability surface is declared in SURVEY.md §2; every operator is
re-expressed Spark-first: DataFrame/SQL logical plans optimized by Catalyst,
Structured Streaming for unbounded inputs, Arrow-vectorized pandas UDFs only
where built-ins cannot express the semantics.

Layout:
    session.py    — SparkSession factory + defensive per-query session prep
    tables.py     — fixed-schema loaders for the ten warehouse tables
    registry.py   — query-key registry: (spark fn, DuckDB oracle SQL) pairs
    operators/    — relational / join / aggregate / window / analytic ops
    functions/    — scalar function library + UDF/UDAF/UDTF surface
    streaming/    — sources, sinks, stateful operators (CDC, CEP, dedup)
    llm/          — LLM-data-pipeline ops (dedup, similarity, text, multimodal)
    plans/        — composed logical-plan builders (as-of join, cumulate, ...)
"""

from flink_realtime_spark.registry import ORACLES, QUERIES, load_all

__all__ = ["QUERIES", "ORACLES", "load_all"]
