"""Aggregation operators — SURVEY.md §2.4.

Reference capability: Flink SQL GROUP BY aggregates feeding the DWS/ADS
layers of a real-time warehouse (provenance FLINK/ARCH; the snapshot itself
is README-only, /root/reference/README.md:1-2). Spark-first design: plain
``groupBy().agg()`` — Catalyst plans two-phase (partial→final) hash
aggregation automatically, so map-side combine is free; rollup/cube lower to
a single Expand + aggregate.

Scale notes (100 TB): group-by keys here are low-cardinality flags/priorities
→ partial aggregation collapses almost all rows map-side and the shuffle
carries only (groups × partitions) rows. High-cardinality distincts should
use agg_approx_distinct (HLL) instead of exact COUNT(DISTINCT); AQE handles
skewed keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_realtime_spark.exprs import (
    dtrunc,
    NAN,
    bigint,
    davg,
    davg_sql,
    dsum,
    dsum_over,
    dsum_over_sql,
    dsum_sql,
    finite_or_null,
    finite_sql,
    json_k_path_sql,
    nonfinite,
    nonfinite_sql,
    row_dec_sql,
    sum_bigint_safe,
    try_sum_bigint_sql,
)
from flink_realtime_spark.registry import query
from flink_realtime_spark.tables import Warehouse

_FLAGSHIP_ORACLE = f"""
SELECT
  r.r_name,
  o.o_orderpriority,
  l.l_returnflag,
  {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 12, 38)} AS revenue,
  COUNT(*) AS n_items,
  {davg_sql('l.l_quantity')} AS avg_qty
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY r.r_name, o.o_orderpriority, l.l_returnflag
"""


@query("agg_star_flagship", _FLAGSHIP_ORACLE)
def agg_star_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship star query (SURVEY.md §7.3): revenue by region × priority ×
    returnflag over a ship-date year. Exercises parquet scan with pushed
    filter, three shuffle joins + two broadcast dim joins, two-phase hash
    agg, and sort. The DWS-layer signature query of a 实时数仓."""
    wh = Warehouse(spark, sf_dir)
    li = wh.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return (
        li.join(wh.orders, li["l_orderkey"] == wh.orders["o_orderkey"])
        .join(wh.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(wh.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(wh.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "o_orderpriority", "l_returnflag")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 12, 38).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
            davg(F.col("l_quantity")).alias("avg_qty"),
        )
        .orderBy(F.col("revenue").desc())
    )


@query(
    "agg_groupby_basic",
    f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {dsum_sql('l_quantity')} AS sum_qty,
      {dsum_sql('l_extendedprice')} AS sum_price,
      {davg_sql('l_discount')} AS avg_disc,
      MIN(l_quantity) AS min_qty,
      MAX(l_extendedprice) AS max_price,
      COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_groupby_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUM/COUNT/AVG/MIN/MAX per key — Flink SQL GROUP BY (TPC-H q1 shape).
    Catalyst plans partial+final HashAggregate; no manual combine needed."""
    wh = Warehouse(spark, sf_dir)
    return wh.lineitem.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(F.col("l_quantity")).alias("sum_qty"),
        dsum(F.col("l_extendedprice")).alias("sum_price"),
        davg(F.col("l_discount")).alias("avg_disc"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_extendedprice").alias("max_price"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "agg_count_distinct",
    """
    SELECT
      o_orderpriority,
      COUNT(DISTINCT o_custkey) AS uniq_cust,
      COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group — the warehouse UV metric. Catalyst expands
    distinct aggregates into a two-level Expand plan (Flink's
    SPLIT_DISTINCT_AGG equivalent) automatically."""
    wh = Warehouse(spark, sf_dir)
    return wh.orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("uniq_cust"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "agg_approx_distinct",
    """
    SELECT
      o_orderpriority,
      COUNT(DISTINCT o_custkey) AS exact_uniq_cust,
      CAST(abs(approx_count_distinct(o_custkey) - COUNT(DISTINCT o_custkey))
           <= 0.05 * COUNT(DISTINCT o_custkey) AS BOOLEAN) AS approx_ok,
      CAST(abs(approx_count_distinct(o_custkey) - COUNT(DISTINCT o_custkey))
           <= 0.05 * COUNT(DISTINCT o_custkey) AS BOOLEAN) AS hll_ok
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct (HLL) — the 100 TB path for UV counting where
    exact COUNT(DISTINCT) would shuffle every key. Estimator internals
    differ across engines, so raw estimates can't hash-match; the
    oracle-checkable contract is a TOLERANCE VERDICT: each engine emits the
    exact count (identical by definition) plus booleans asserting its OWN
    estimator lands within ±5% of that exact value (Spark:
    approx_count_distinct rsd=0.02 and the Datasketches HLL; DuckDB: its
    approx_count_distinct for both columns). tests/test_llm_props.py keeps
    the numeric 5% assertion on the raw estimates."""
    wh = Warehouse(spark, sf_dir)
    exact = F.count_distinct("o_custkey")
    approx = F.approx_count_distinct("o_custkey", rsd=0.02)
    hll = F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey"))
    return wh.orders.groupBy("o_orderpriority").agg(
        exact.alias("exact_uniq_cust"),
        (F.abs(approx - exact) <= 0.05 * exact).alias("approx_ok"),
        (F.abs(hll - exact) <= 0.05 * exact).alias("hll_ok"),
    )


_STATS_NF_Q = nonfinite_sql("l_quantity")
_STATS_NF_QP = (
    f"({nonfinite_sql('l_quantity')} OR {nonfinite_sql('l_extendedprice')})"
)


# Exact-decimal moment engine for agg_stats (extremes tier, r10): the
# engines' native STDDEV/VAR/CORR use different accumulation formulas,
# which agree to the last ulp on small values but drift ~100 ulps once
# 9.9e12 magnitudes enter (variance ~1e23). The moments are therefore
# computed from EXACT decimal power sums — per-row (24,4) quantize (24:
# DuckDB's int64-backed (18,4) overflows in the d*d multiply), squares
# exact at (38,8) — combined in one pinned IEEE sequence both engines
# evaluate identically. greatest(.., 0) absorbs catastrophic-cancel
# tiny negatives (a one-row group's s2 - s1²/n is not exactly 0.0 in
# doubles); `+ 0` on corr normalizes DuckDB ROUND's -0.0.
_STATS_DQ = (
    f"(CASE WHEN NOT {_STATS_NF_Q} "
    f"THEN {row_dec_sql('l_quantity', 4, 24)} END)"
)
_STATS_PAIR = (
    f"(NOT {_STATS_NF_QP} AND l_quantity IS NOT NULL "
    "AND l_extendedprice IS NOT NULL)"
)
_STATS_DX = (
    f"(CASE WHEN {_STATS_PAIR} "
    f"THEN {row_dec_sql('l_quantity', 4, 24)} END)"
)
_STATS_DY = (
    f"(CASE WHEN {_STATS_PAIR} "
    f"THEN {row_dec_sql('l_extendedprice', 4, 24)} END)"
)


def _dd(expr: str) -> str:
    """Exact decimal sum of ``expr`` rendered to double via STRING."""
    return f"CAST(CAST(SUM({expr}) AS STRING) AS DOUBLE)"


@query(
    "agg_stats",
    f"""
    WITH m AS (
      SELECT
        l_returnflag,
        BOOL_OR({_STATS_NF_Q}) AS spec_q,
        BOOL_OR({_STATS_NF_QP}) AS spec_qp,
        COUNT({_STATS_DQ}) AS nq,
        {_dd(_STATS_DQ)} AS s1,
        {_dd(f'CAST({_STATS_DQ} * {_STATS_DQ} AS DECIMAL(38,8))')} AS s2,
        COUNT({_STATS_DX}) AS n2,
        {_dd(_STATS_DX)} AS sx,
        {_dd(_STATS_DY)} AS sy,
        {_dd(f'CAST({_STATS_DX} * {_STATS_DX} AS DECIMAL(38,8))')} AS sxx,
        {_dd(f'CAST({_STATS_DY} * {_STATS_DY} AS DECIMAL(38,8))')} AS syy,
        {_dd(f'CAST({_STATS_DX} * {_STATS_DY} AS DECIMAL(38,8))')} AS sxy,
        ROUND(MEDIAN({finite_sql('l_quantity')}), 4) AS med_qty,
        ROUND(QUANTILE_CONT({finite_sql('l_quantity')}, 0.9), 4) AS p90_qty
      FROM lineitem
      GROUP BY l_returnflag
    )
    -- ROUND is gated below 1e15: DuckDB's double ROUND goes through a
    -- multiply/divide that PERTURBS values past the integer-exact range
    -- (2.6487...56e23 came back ...52e23) where Spark's BigDecimal
    -- round is an exact identity; above the gate the raw double is
    -- already coarser than 4 decimals on both engines.
    SELECT
      l_returnflag,
      CASE WHEN spec_q THEN CAST('NaN' AS DOUBLE)
           WHEN nq > 1 THEN
             CASE WHEN sqrt(greatest((s2 - s1 * s1 / nq) / (nq - 1), 0.0))
                       < 1e15
                  THEN ROUND(sqrt(greatest(
                         (s2 - s1 * s1 / nq) / (nq - 1), 0.0)), 4)
                  ELSE sqrt(greatest((s2 - s1 * s1 / nq) / (nq - 1), 0.0))
             END
      END AS std_qty,
      CASE WHEN spec_q THEN CAST('NaN' AS DOUBLE)
           WHEN nq > 1 THEN
             CASE WHEN greatest((s2 - s1 * s1 / nq) / (nq - 1), 0.0) < 1e15
                  THEN ROUND(greatest((s2 - s1 * s1 / nq) / (nq - 1), 0.0), 4)
                  ELSE greatest((s2 - s1 * s1 / nq) / (nq - 1), 0.0)
             END
      END AS var_qty,
      CASE WHEN spec_qp THEN CAST('NaN' AS DOUBLE)
           WHEN n2 > 1
                AND greatest(sxx - sx * sx / n2, 0.0)
                    * greatest(syy - sy * sy / n2, 0.0) > 0.0 THEN
             ROUND((sxy - sx * sy / n2)
                   / sqrt(greatest(sxx - sx * sx / n2, 0.0)
                          * greatest(syy - sy * sy / n2, 0.0)), 6) + 0
      END AS corr_qty_price,
      med_qty,
      p90_qty
    FROM m
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (stddev/var/corr/median/percentile) — Flink SQL
    stat library. Exact interpolated percentiles; at 100 TB switch to
    percentile_approx (t-digest) to avoid the global sort.

    SPECIALS contract (r10 tier): moment statistics propagate — any
    NaN/±Inf in the group yields NaN (the IEEE alarm; DuckDB's STDDEV
    raises 'out of range' on ±Inf, so the oracle gates the aggregate
    behind a BOOL_OR instead of letting it evaluate) — while order
    statistics (median/quantile) are computed over the FINITE subset
    (an interpolated quantile has no ordinal position for NaN, and the
    engines' NaN placement in the interpolation differs)."""
    wh = Warehouse(spark, sf_dir)
    nf_q = nonfinite(F.col("l_quantity"))
    nf_qp = nf_q | nonfinite(F.col("l_extendedprice"))
    q_fin = finite_or_null(F.col("l_quantity"))
    pair = (
        ~nf_qp
        & F.col("l_quantity").isNotNull()
        & F.col("l_extendedprice").isNotNull()
    )
    nan = F.lit(NAN)
    # Exact decimal power sums (see the oracle's rationale above): the
    # native stddev/var/corr accumulators drift from DuckDB's at 1e23
    # variance magnitudes. Spark's (18,4) quantize is repr-exact like
    # the oracle's string route; squares are exact at (38,8).
    dq = q_fin.cast("decimal(18,4)")
    dx = F.when(pair, F.col("l_quantity")).cast("decimal(18,4)")
    dy = F.when(pair, F.col("l_extendedprice")).cast("decimal(18,4)")
    agg = wh.lineitem.groupBy("l_returnflag").agg(
        F.max(nf_q).alias("spec_q"),
        F.max(nf_qp).alias("spec_qp"),
        F.count(dq).alias("nq"),
        F.sum(dq).cast("string").cast("double").alias("s1"),
        F.sum((dq * dq).cast("decimal(38,8)")).cast("string").cast("double").alias("s2"),
        F.count(dx).alias("n2"),
        F.sum(dx).cast("string").cast("double").alias("sx"),
        F.sum(dy).cast("string").cast("double").alias("sy"),
        F.sum((dx * dx).cast("decimal(38,8)")).cast("string").cast("double").alias("sxx"),
        F.sum((dy * dy).cast("decimal(38,8)")).cast("string").cast("double").alias("syy"),
        F.sum((dx * dy).cast("decimal(38,8)")).cast("string").cast("double").alias("sxy"),
        F.round(F.median(q_fin), 4).alias("med_qty"),
        F.round(F.percentile(q_fin, 0.9), 4).alias("p90_qty"),
    )
    s1, s2, nq = F.col("s1"), F.col("s2"), F.col("nq")
    sx, sy, n2 = F.col("sx"), F.col("sy"), F.col("n2")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    var_raw = F.greatest((s2 - s1 * s1 / nq) / (nq - 1), F.lit(0.0))
    gx = F.greatest(sxx - sx * sx / n2, F.lit(0.0))
    gy = F.greatest(syy - sy * sy / n2, F.lit(0.0))

    def _round4(c):
        # the oracle's ROUND gate (see SQL comment): identity past 1e15
        return F.when(c < 1e15, F.round(c, 4)).otherwise(c)

    return agg.select(
        "l_returnflag",
        F.when(F.col("spec_q"), nan)
        .when(nq > 1, _round4(F.sqrt(var_raw)))
        .alias("std_qty"),
        F.when(F.col("spec_q"), nan)
        .when(nq > 1, _round4(var_raw))
        .alias("var_qty"),
        F.when(F.col("spec_qp"), nan)
        .when(
            (n2 > 1) & (gx * gy > 0.0),
            F.round((sxy - sx * sy / n2) / F.sqrt(gx * gy), 6) + F.lit(0),
        )
        .alias("corr_qty_price"),
        "med_qty",
        "p90_qty",
    )


@query(
    "agg_collect",
    """
    SELECT
      o_orderstatus,
      ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT o_orderpriority)), ',')
        AS priorities,
      COUNT(*) AS n
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group collection aggregates (Flink SQL COLLECT/LISTAGG). Collected
    sets are sorted then joined to a string so the result is order-stable
    for the oracle hash."""
    wh = Warehouse(spark, sf_dir)
    return wh.orders.groupBy("o_orderstatus").agg(
        F.array_join(F.sort_array(F.collect_set("o_orderpriority")), ",").alias(
            "priorities"
        ),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_rollup",
    f"""
    SELECT
      o_orderstatus,
      o_orderpriority,
      CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
      CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
      COUNT(*) AS n_orders,
      {dsum_sql('o_totalprice')} AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    HAVING COUNT(*) > 0
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP multi-granularity aggregates — the ADS-layer pattern (daily /
    daily+status / grand-total in one pass via a single Expand).

    Empty-input contract (empty-shape probe find, r09): Spark lowers
    ROLLUP/CUBE/GROUPING SETS through Expand + group-by-grouping-id, so an
    EMPTY input yields zero groups — including the () grand-total set —
    while the SQL standard (and DuckDB) emits one grand-total row over
    empty input. The engine documents Spark's Expand semantics; the oracle
    mirrors it with HAVING COUNT(*) > 0, which is vacuous on any non-empty
    input (every real group has >= 1 row)."""
    wh = Warehouse(spark, sf_dir)
    return (
        wh.orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            bigint(F.grouping("o_orderstatus")).alias("g_status"),
            bigint(F.grouping("o_orderpriority")).alias("g_prio"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .select(
            "o_orderstatus",
            "o_orderpriority",
            "g_status",
            "g_prio",
            "n_orders",
            "total_price",
        )
    )


@query(
    "agg_cube",
    f"""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
      CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
      {dsum_sql('l_quantity')} AS sum_qty,
      COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    HAVING COUNT(*) > 0
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions — all 4 grouping sets in one Expand pass."""
    wh = Warehouse(spark, sf_dir)
    return (
        wh.lineitem.cube("l_returnflag", "l_linestatus")
        .agg(
            bigint(F.grouping("l_returnflag")).alias("g_flag"),
            bigint(F.grouping("l_linestatus")).alias("g_status"),
            dsum(F.col("l_quantity")).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "g_flag", "g_status", "sum_qty", "n")
    )


_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


@query(
    "agg_pivot",
    f"""
    SELECT
      c_nationkey,
      {', '.join(f"CAST(COUNT(CASE WHEN c_mktsegment = '{s}' THEN 1 END) AS BIGINT) AS {s}" for s in _SEGMENTS)}
    FROM customer
    GROUP BY c_nationkey
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key→column pivot (ARCH reporting layer). Pivot values are declared
    explicitly — never inferred — so the plan is one pass and the output
    schema is stable at any scale. Missing combinations surface as 0 (not
    null) so both engines agree on type and value."""
    wh = Warehouse(spark, sf_dir)
    pivoted = (
        wh.customer.groupBy("c_nationkey")
        .pivot("c_mktsegment", _SEGMENTS)
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "c_nationkey",
        *[F.coalesce(F.col(s), F.lit(0)).cast("long").alias(s) for s in _SEGMENTS],
    )


@query(
    "agg_unpivot",
    f"""
    WITH wide AS (
      SELECT
        o_orderpriority,
        CAST(COUNT(*) AS DOUBLE) AS n_orders,
        {dsum_sql('o_totalprice')} AS total_price,
        CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
      FROM orders
      GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value FROM wide
    UNION ALL
    SELECT o_orderpriority, 'total_price', total_price FROM wide
    UNION ALL
    SELECT o_orderpriority, 'max_price', max_price FROM wide
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column→row unpivot (melt) — the inverse of agg_pivot and the shape
    a reporting layer needs to feed a generic (entity, metric, value)
    store. Spark's native ``DataFrame.unpivot`` lowers to one Expand pass
    over the already-aggregated wide relation (group-cardinality rows ×
    #measures — metadata-sized at any corpus scale, zero extra
    shuffles); the oracle's UNION ALL is the ANSI equivalent that would
    instead re-scan the relation per measure. Measures are cast to one
    common DOUBLE type first — unpivot requires it, and it keeps both
    engines' value column identically typed."""
    wh = Warehouse(spark, sf_dir)
    wide = wh.orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("total_price"),
        F.max("o_totalprice").cast("double").alias("max_price"),
    )
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=["n_orders", "total_price", "max_price"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@query(
    "agg_grouping_sets",
    f"""
    SELECT
      o_orderstatus,
      o_orderpriority,
      CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
      CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
      COUNT(*) AS n_orders,
      {dsum_sql('o_totalprice')} AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    HAVING COUNT(*) > 0
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the SQL-string frontend (engine entry
    point B, SURVEY.md §3.2): the query text goes through the same Catalyst
    pipeline as the DataFrame API — one engine, two frontends. Registers the
    orders table as a temp view and plans a single Expand pass."""
    wh = Warehouse(spark, sf_dir)
    wh.orders.createOrReplaceTempView("orders_v")
    return spark.sql(
        f"""
        SELECT
          o_orderstatus,
          o_orderpriority,
          CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
          CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
          COUNT(*) AS n_orders,
          {dsum_sql('o_totalprice')} AS total_price
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "ads_daily_uv_pv",
    """
    SELECT
      CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
      event_type,
      COUNT(*) AS pv,
      COUNT(DISTINCT user_id) AS uv,
      CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT user_id) AS pv_per_user
    FROM events
    GROUP BY 1, 2
    """,
)
def ads_daily_uv_pv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical ADS-layer dashboard metric of a 实时数仓: daily PV/UV
    per event type. Exact COUNT(DISTINCT) here; at 100 TB swap uv for the
    HLL sketch (agg_approx_distinct) and keep the same query shape —
    sketches merge across days for rollups."""
    wh = Warehouse(spark, sf_dir)
    return wh.events.groupBy(
        dtrunc("day", "ts").alias("day"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("pv"),
        F.countDistinct("user_id").alias("uv"),
        (F.count(F.lit(1)).cast("double") / F.countDistinct("user_id")).alias(
            "pv_per_user"
        ),
    )


_LAYERED_ORACLE = f"""
WITH dwd AS (  -- ODS→DWD: parse the raw JSON payload, enrich with DIM
  SELECT
    CAST(date_trunc('day', e.ts) AS TIMESTAMP) AS day,
    n.n_name,
    e.user_id,
    e.value,
    {json_k_path_sql('e.props')} AS k
  FROM events e
  JOIN customer c ON e.user_id = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
),
dws AS (  -- DWD→DWS: daily per-nation windowed aggregates
  SELECT
    day,
    n_name,
    COUNT(*) AS pv,
    COUNT(DISTINCT user_id) AS uv,
    {dsum_sql('value')} AS value_sum,
    {try_sum_bigint_sql('k')} AS k_sum
  FROM dwd
  GROUP BY day, n_name
)
SELECT day, n_name, pv, uv, value_sum, k_sum  -- DWS→ADS: daily Top-3 board
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY day ORDER BY pv DESC, n_name
  ) AS rn
  FROM dws
) t
WHERE rn <= 3
"""


@query("ads_layered_pipeline", _LAYERED_ORACLE)
def ads_layered_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full 实时数仓 layer DAG as ONE declarative plan (SURVEY.md §1.1:
    layers are composable query functions, not Kafka topics): ODS (raw
    events, JSON props parsed) → DWD (broadcast DIM enrichment to nation) →
    DWS (daily per-nation pv/uv/value aggregates) → ADS (top-3 nations per
    day, unique n_name tiebreak). Catalyst fuses the layers: the JSON
    parse and joins pipeline into one stage before the aggregation
    shuffle — a Flink topology's four jobs collapse into one plan with two
    exchanges. In streaming form each layer binds unchanged (windows +
    update mode), with the ADS Top-N served from the upsert sink."""
    wh = Warehouse(spark, sf_dir)
    dwd = (
        wh.events.join(
            wh.customer, wh.events["user_id"] == wh.customer["c_custkey"]
        )
        .join(F.broadcast(wh.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            dtrunc("day", "ts").alias("day"),
            "n_name",
            "user_id",
            "value",
            # lenient integral path contract + overflow-safe sum
            # (extremes tier, r10 — exprs.json_k_path_sql rationale)
            F.get_json_object("props", "$.k").try_cast("long").alias("k"),
        )
    )
    dws = dwd.groupBy("day", "n_name").agg(
        F.count(F.lit(1)).alias("pv"),
        F.countDistinct("user_id").alias("uv"),
        dsum(F.col("value")).alias("value_sum"),
        sum_bigint_safe(F.col("k")).alias("k_sum"),
    )
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy("day").orderBy(F.col("pv").desc(), F.col("n_name"))
    )
    return (
        dws.withColumn("rn", rn)
        .filter(F.col("rn") <= 3)
        .select("day", "n_name", "pv", "uv", "value_sum", "k_sum")
    )


@query(
    "tpch_q6_forecast",
    f"""
    SELECT
      {dsum_sql('l_extendedprice * l_discount', 12, 38)} AS revenue_delta,
      COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q6 shape — pure scan-filter-aggregate, the query class where
    pushed filters + whole-stage codegen do all the work (no shuffle at
    all beyond the final single-group agg)."""
    wh = Warehouse(spark, sf_dir)
    return wh.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), 12, 38).alias("revenue_delta"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "tpch_q3_priority",
    f"""
    SELECT
      l.l_orderkey,
      {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 12, 38)} AS revenue,
      o.o_orderdate,
      o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    """,
)
def tpch_q3_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q3 shape (shipping priority): selective dimension filter joined
    into two fact tables with group-by revenue — the segment filter prunes
    customer before the join, so the build side stays broadcastable."""
    wh = Warehouse(spark, sf_dir)
    c = wh.customer.filter(F.col("c_mktsegment") == "BUILDING")
    return (
        c.join(wh.orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
        .join(wh.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 12, 38).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "tpch_q13_custdist",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) t
    GROUP BY c_count
    """,
)
def tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q13 shape (customer order-count distribution): outer join with
    a join-residual predicate, then a two-level aggregation. COUNT of a
    nullable column (not COUNT(*)) makes no-order customers count 0; the
    second group-by is on the derived count. Both aggregations are
    two-phase; the first reuses the join's o_custkey partitioning."""
    wh = Warehouse(spark, sf_dir)
    per_cust = (
        wh.customer.join(
            wh.orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@query(
    "agg_uv_sketch_rollup",
    """
    WITH weekly AS (
      SELECT
        CAST(date_trunc('week', CAST(date_trunc('day', ts) AS TIMESTAMP))
             AS TIMESTAMP) AS week,
        COUNT(DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP)) AS n_days,
        COUNT(DISTINCT user_id) AS uv_exact,
        approx_count_distinct(user_id) AS uv_est
      FROM events
      GROUP BY 1
    )
    SELECT week, n_days, uv_exact,
      CAST(abs(uv_est - uv_exact) <= 0.05 * uv_exact AS BOOLEAN) AS sketch_ok
    FROM weekly
    """,
)
def agg_uv_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup — THE 100 TB UV pattern: per-day HLL
    sketches of the visitor set (a few KB each, computed once, map-side
    combined), then weekly UV by MERGING sketches (`hll_union_agg`) —
    never re-touching raw events. A Flink warehouse stores these per-window
    sketches in the DWS layer for exactly this reason: any rollup
    granularity (week/month/campaign) becomes a union over sketch rows.
    Sketch bytes are engine-specific, so the oracle-checkable contract is
    a TOLERANCE VERDICT: both engines emit the exact weekly UV (identical
    by definition) plus a boolean asserting their own estimate — Spark's
    MERGED daily sketches, DuckDB's direct weekly estimator — lands within
    ±5% of it. The exact column exists only to make the contract
    hash-checkable at test scale; production keeps just the sketch path.
    tests/test_llm_props.py keeps the numeric 5% assertion."""
    wh = Warehouse(spark, sf_dir)
    daily = wh.events.groupBy(dtrunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = daily.groupBy(dtrunc("week", "day").alias("week")).agg(
        bigint(F.hll_sketch_estimate(F.hll_union_agg("sk"))).alias("uv_est"),
        F.count(F.lit(1)).alias("n_days"),
    )
    exact = wh.events.groupBy(
        dtrunc("week", dtrunc("day", "ts")).alias("week")
    ).agg(F.count_distinct("user_id").alias("uv_exact"))
    return merged.join(exact, "week").select(
        "week",
        "n_days",
        "uv_exact",
        (F.abs(F.col("uv_est") - F.col("uv_exact")) <= 0.05 * F.col("uv_exact"))
        .alias("sketch_ok"),
    )


@query(
    "ads_retention_cohort",
    """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d
      FROM events
    ),
    cohort AS (
      SELECT user_id, MIN(d) AS cohort_day FROM days GROUP BY user_id
    )
    SELECT
      c.cohort_day,
      CAST(date_diff('day', c.cohort_day, d.d) AS BIGINT) AS day_offset,
      COUNT(DISTINCT d.user_id) AS active_users
    FROM days d
    JOIN cohort c ON d.user_id = c.user_id
    WHERE date_diff('day', c.cohort_day, d.d) <= 14
    GROUP BY c.cohort_day, day_offset
    """,
)
def ads_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the other canonical ADS dashboard of a
    实时数仓 (alongside PV/UV): users grouped by first-seen day, retention
    counted at each day offset ≤ 14. Two-phase throughout: the distinct
    (user, day) grid collapses map-side, the min-day cohort assignment is a
    single shuffle on user_id, and the cohort join reuses that partitioning
    (same key → no extra exchange under AQE). At 100 TB the (user, day)
    grid is the scaling term — it is bounded by users × horizon, not by raw
    event count, precisely because the distinct runs first."""
    wh = Warehouse(spark, sf_dir)
    days = wh.events.select(
        "user_id", dtrunc("day", "ts").alias("d")
    ).distinct()
    cohort = days.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    return (
        days.join(cohort, "user_id")
        .withColumn("day_offset", bigint(F.datediff(F.col("d"), F.col("cohort_day"))))
        .filter(F.col("day_offset") <= 14)
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@query(
    "ads_gmv_dashboard",
    f"""
    WITH daily AS (
      SELECT
        CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
        {dsum_sql('o_totalprice')} AS gmv,
        COUNT(*) AS n_orders
      FROM orders
      GROUP BY 1
    )
    SELECT
      day,
      gmv,
      n_orders,
      CAST(
        {dsum_over_sql('gmv', 'w')}
        / COUNT(*) OVER w
      AS DOUBLE) AS gmv_7d_avg,
      CAST(ROW_NUMBER() OVER (
        PARTITION BY day IS NOT DISTINCT FROM NULL,
                     date_trunc('month', day)
        ORDER BY gmv DESC NULLS LAST, day
      ) AS BIGINT) AS rank_in_month
    FROM daily
    -- IS NOT DISTINCT FROM NULL: DuckDB 1.0 misfolds IS NULL to FALSE
    -- on a GROUP-BY-computed key (see ads_monthly_yoy). The rank
    -- partition ALSO leads with day-nullness: DuckDB's window
    -- partitioning of the misfolded NULL computed key is run-to-run
    -- UNSTABLE (r11 nulls-tier find — the NULL-day row wandered into a
    -- different real month's partition per run, shifting that month's
    -- ranks by one), so the null row is pinned to its own partition by
    -- a non-null boolean key on BOTH sides.
    WINDOW w AS (PARTITION BY day IS NOT DISTINCT FROM NULL
                 ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def ads_gmv_dashboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-GMV dashboard: per-day order totals, a 7-day moving average,
    and each day's rank within its month — the composed DWS→ADS serving
    query. The base agg collapses to one row per day, so the over-windows
    run on a relation bounded by the calendar (~2.4k rows for the fixture's
    7 years), never by raw order volume: the global ORDER BY day frame is
    safe at any scale because its input is days, not orders. row_number
    tiebreaks on day for a deterministic rank under GMV ties. The 7-day
    frame partitions by day-nullness: a populated, 2-bounded spec (so the
    single-bucket intent survives constant folding) that ALSO gives an
    unknown-date row its own partition instead of letting it slide into a
    real day's trailing average (r08 nulls-tier class; DuckDB's default
    null placement in window sorts is not even run-to-run stable)."""
    from pyspark.sql import Window

    wh = Warehouse(spark, sf_dir)
    daily = wh.orders.groupBy(
        dtrunc("day", "o_orderdate").alias("day")
    ).agg(
        dsum(F.col("o_totalprice")).alias("gmv"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    # The trailing frame PARTITIONS BY day-nullness (r08 nulls-tier
    # class): an unknown-date row must not slide into any real day's
    # 7-day average, and DuckDB's DEFAULT null placement in a window
    # sort is not run-to-run stable, so the null row gets its own
    # 1-row partition on BOTH sides. Rank ties pin NULLS LAST.
    w7 = (
        Window.partitionBy(F.col("day").isNull())
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    wm = Window.partitionBy(
        F.col("day").isNull(), dtrunc("month", "day")
    ).orderBy(F.col("gmv").desc_nulls_last(), F.col("day"))
    return daily.select(
        "day",
        "gmv",
        "n_orders",
        (dsum_over(F.col("gmv"), w7) / F.count(F.lit(1)).over(w7))
        .cast("double")
        .alias("gmv_7d_avg"),
        bigint(F.row_number().over(wm)).alias("rank_in_month"),
    )


@query(
    "agg_max_by",
    f"""
    WITH ranked AS (
      SELECT o_orderpriority, o_orderkey,
        ROW_NUMBER() OVER (PARTITION BY o_orderpriority
          ORDER BY cls DESC, pn DESC, o_orderkey DESC) AS rmax,
        ROW_NUMBER() OVER (PARTITION BY o_orderpriority
          ORDER BY cls ASC, pn ASC, o_orderkey ASC) AS rmin
      FROM (
        SELECT o_orderpriority, o_orderkey,
          CASE WHEN isnan(o_totalprice) THEN 2
               WHEN o_totalprice = CAST('Infinity' AS DOUBLE) THEN 1
               WHEN o_totalprice = CAST('-Infinity' AS DOUBLE) THEN -1
               ELSE 0 END AS cls,
          CASE WHEN NOT {nonfinite_sql('o_totalprice')}
               THEN o_totalprice + 0 ELSE 0.0 END AS pn
        FROM orders
        WHERE o_totalprice IS NOT NULL
      )
    ),
    agg AS (
      SELECT o_orderpriority,
        MAX(o_totalprice) + 0 AS max_price,
        MIN(o_totalprice) + 0 AS min_price
      FROM orders GROUP BY o_orderpriority
    )
    SELECT a.o_orderpriority,
      mx.o_orderkey AS top_order,
      mn.o_orderkey AS low_order,
      a.max_price, a.min_price
    FROM agg a
    LEFT JOIN (SELECT * FROM ranked WHERE rmax = 1) mx
      ON a.o_orderpriority IS NOT DISTINCT FROM mx.o_orderpriority
    LEFT JOIN (SELECT * FROM ranked WHERE rmin = 1) mn
      ON a.o_orderpriority IS NOT DISTINCT FROM mn.o_orderpriority
    """,
)
def agg_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAX_BY/MIN_BY (Flink SQL's argmax/argmin aggregates): the order id
    carrying each priority's extreme total. Both engines leave ties
    implementation-defined, so the ordering value is a (class, price,
    key) struct — deterministic argmax without a window sort.

    SPECIALS (r10 tier): the original price·1e6 + key fold is exact for
    finite prices but collapses every NaN (or ±Inf) price to ONE tied
    ordering value, and the engines keep different tie members. The
    struct ranks the IEEE class explicitly (NaN > +Inf > finite > -Inf —
    both engines' comparison order), keeps the exact price for finite
    rows (normalized +0 so a -0.0/0.0 pair can't split on DuckDB's
    total order), and tiebreaks on the unique key; a NULL price keeps a
    NULL ordering value so both argmaxes skip it (nulls-tier contract).
    MAX/MIN outputs get the same +0 normalizer. DuckDB 1.0's max_by has
    no STRUCT overload, so the oracle spells the same ordering as
    explicit window ranks over the (cls, pn, key) triple."""
    wh = Warehouse(spark, sf_dir)
    p = F.col("o_totalprice")
    cls = (
        F.when(F.isnan(p), F.lit(2))
        .when(p == F.lit(float("inf")), F.lit(1))
        .when(p == F.lit(float("-inf")), F.lit(-1))
        .otherwise(F.lit(0))
    )
    pn = F.when(~nonfinite(p), p + F.lit(0.0)).otherwise(F.lit(0.0))
    ordv = F.when(
        p.isNotNull(), F.struct(cls.alias("c"), pn.alias("p"), F.col("o_orderkey").alias("k"))
    )
    return wh.orders.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", ordv).alias("top_order"),
        F.min_by("o_orderkey", ordv).alias("low_order"),
        (F.max("o_totalprice") + F.lit(0.0)).alias("max_price"),
        (F.min("o_totalprice") + F.lit(0.0)).alias("min_price"),
    )


@query(
    "agg_bool_family",
    """
    SELECT
      o_orderstatus,
      COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
      bool_and(o_totalprice > 1000) AS all_over_1k,
      bool_or(o_totalprice > 400000) AS any_over_400k,
      CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
        AS BIGINT) AS n_urgent,
      MIN(o_orderkey) AS first_key
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_bool_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean/conditional aggregate family (Flink SQL COUNT FILTER /
    EVERY / SOME parity): count_if, bool_and (EVERY), bool_or (SOME), a
    conditional sum, and a deterministic ANY_VALUE stand-in (MIN — the
    nondeterministic any_value has no cross-engine oracle). All map-side
    combinable single-bit states — the cheapest aggregates there are."""
    wh = Warehouse(spark, sf_dir)
    return wh.orders.groupBy("o_orderstatus").agg(
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
        F.sum(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
        )
        .cast("long")
        .alias("n_urgent"),
        F.min("o_orderkey").alias("first_key"),
    )
