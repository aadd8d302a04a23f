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
    "flink_realtime_spark.operators.serving",
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

# The driver checks keys in queries() iteration order and its time window
# can close early (round 1: it covered exactly the first 50 keys, leaving
# every window/analytic/scalar/streaming/TPC-H/LLM key unverified). Order
# for graceful truncation: first a fast representative slice of EVERY
# SURVEY §2 family, then the remaining keys, and last the iterative /
# estimator / streaming keys whose wall time could eat the window.
_PRIORITY_HEAD = [
    # one fast slice per §2 family, interleaved
    "filter_predicates", "join_inner_equi", "agg_groupby_basic",
    "win_tumble", "over_ranking", "scalar_datetime", "cdc_latest_image",
    "llm_dedup_exact", "llm_knn_cosine", "llm_text_stats",
    "pipe_sample_hash", "llm_multimodal_join", "udf_scalar_pandas",
    "sort_topk", "subq_lateral_topn", "tpch_q6_forecast",
    "mv_incremental_refresh", "state_rule_engine", "dq_anomaly_zscore",
    "llm_dup_gram_share",
    # widen each family with its other cheap members
    "flatmap_explode", "dedup_exact", "setop_union_all", "sort_multi_key",
    "join_outer_left", "join_semi", "join_anti", "join_dim_broadcast",
    "join_interval_time", "join_asof_temporal", "join_theta_range",
    "join_range_binned",
    "agg_star_flagship", "agg_rollup", "agg_pivot", "agg_max_by",
    "agg_histogram", "ads_session_stats", "ads_pareto_share",
    "tpch_q1_pricing",
    "win_slide", "win_session", "win_late_drop", "win_topn", "win_dedup",
    "over_lag_lead", "over_moving_avg", "over_time_range",
    "scalar_math", "scalar_array", "scalar_json_props", "dwd_clean_route",
    "udaf_grouped_pandas", "udtf_split_rows",
    "cdc_scd2_history", "cep_funnel_batch", "state_new_visitor",
    "sink_upsert_latest",
    "llm_dedup_ngram_jaccard", "llm_dedup_simhash", "llm_dedup_minhash",
    "llm_dedup_simhash_pairs", "llm_dedup_containment", "llm_decontaminate",
    "llm_embedding_quantize", "llm_centroid_dist",
    "llm_quality_score", "llm_lang_id", "llm_doc_fingerprint",
    "llm_frame_sample", "llm_media_meta",
    "pipe_sample_stratified", "pipe_token_budget", "pipe_shuffle_shard",
    "llm_curation_pipeline",
]

# Iterative / estimator-fit / streaming-executing keys: register last so a
# closing window can only cost keys that already have weaker (rows-only /
# property) evidence or many cheaper siblings above.
_PRIORITY_TAIL = [
    "llm_dedup_semantic", "llm_dedup_embcos",
    "cogroup_apply", "src_stream_smoke",
    "llm_dedup_minhash_ml", "llm_knn_ivf",
    "llm_dedup_cluster", "llm_dedup_two_stage",
    "graph_pagerank",
]


def ordered_queries() -> dict[str, QueryFn]:
    """QUERIES re-ordered for the driver's early-closing check window:
    family representatives first, slow iterative keys last."""
    load_all()
    missing = [k for k in _PRIORITY_HEAD + _PRIORITY_TAIL if k not in QUERIES]
    if missing:  # real exception: asserts vanish under python -O
        raise ValueError(f"priority list names unknown keys: {missing}")
    head = set(_PRIORITY_HEAD)
    tail = set(_PRIORITY_TAIL)
    if head & tail:
        raise ValueError(f"keys in both priority lists: {sorted(head & tail)}")
    out: dict[str, QueryFn] = {}
    for k in _PRIORITY_HEAD:
        out[k] = QUERIES[k]
    for k in QUERIES:
        if k not in head and k not in tail:
            out[k] = QUERIES[k]
    for k in _PRIORITY_TAIL:
        out[k] = QUERIES[k]
    return out


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
