"""Over-windows (analytic functions) — SURVEY.md §2.6.

Reference capability: Flink SQL OVER aggregations, the Top-N pattern
(``ROW_NUMBER() ... WHERE rn <= N``), LAG/LEAD and value functions
(provenance FLINK; snapshot is README-only, /root/reference/README.md:1-2).
Spark-first: ``pyspark.sql.Window`` specs; the per-group Top-N filter is
recognized by Catalyst's WindowGroupLimit rule, which pushes the limit below
the shuffle so only N rows per key per partition survive the exchange.

Determinism discipline: every ORDER BY carries a unique tiebreak column
(row_number/ntile are otherwise engine-dependent on ties), and framed SUM/AVG
go through the DECIMAL(18,4) cast so segment-tree vs sequential accumulation
cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_realtime_spark.exprs import dsum, dsum_over, dsum_over_sql, dsum_sql, epoch_us, epoch_us
from flink_realtime_spark.registry import query
from flink_realtime_spark.tables import Warehouse

# Explicit NULLS LAST: DuckDB's default null placement is not
# run-to-run stable under parallel sort (r08 nulls-tier find) and
# over_topn_pergroup ranks the UNFILTERED orders relation, where
# o_totalprice can be null. Matches Spark's desc_nulls_last.
_RANK_ORDER = "ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC"


@query(
    "over_ranking",
    f"""
    SELECT
      o_orderkey,
      o_orderpriority,
      CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority {_RANK_ORDER}) AS BIGINT) AS rn,
      CAST(RANK() OVER (PARTITION BY o_orderpriority {_RANK_ORDER}) AS BIGINT) AS rnk,
      CAST(DENSE_RANK() OVER (PARTITION BY o_orderpriority {_RANK_ORDER}) AS BIGINT) AS drnk,
      CAST(NTILE(4) OVER (PARTITION BY o_orderpriority {_RANK_ORDER}) AS BIGINT) AS quartile,
      PERCENT_RANK() OVER (PARTITION BY o_orderpriority {_RANK_ORDER}) AS pct_rank,
      CUME_DIST() OVER (PARTITION BY o_orderpriority {_RANK_ORDER}) AS cdist
    FROM orders
    WHERE o_totalprice > 300000
    """,
)
def over_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family (Flink SQL OVER): ROW_NUMBER/RANK/DENSE_RANK/NTILE/
    PERCENT_RANK/CUME_DIST per priority partition with a unique tiebreak."""
    wh = Warehouse(spark, sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc_nulls_last(), F.col("o_orderkey").asc()
    )
    return wh.orders.filter(F.col("o_totalprice") > 300000).select(
        "o_orderkey",
        "o_orderpriority",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cdist"),
    )


@query(
    "over_topn_pergroup",
    f"""
    SELECT o_orderpriority, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice, rn
    FROM (
      SELECT *,
        CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority {_RANK_ORDER}) AS BIGINT) AS rn
      FROM orders
    )
    WHERE rn <= 3
    """,
)
def over_topn_pergroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical Flink SQL Top-N: top 3 orders per priority. Catalyst's
    WindowGroupLimit pushes the rn<=3 limit below the exchange, so each map
    task ships at most 3 rows per group — the 100 TB-safe formulation."""
    wh = Warehouse(spark, sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc_nulls_last(), F.col("o_orderkey").asc()
    )
    return (
        wh.orders.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "rn",
        )
    )


@query(
    "over_lag_lead",
    """
    SELECT
      user_id,
      event_id,
      CAST(COALESCE(LAG(value) OVER w, -1.0) AS DOUBLE) AS prev_value,
      COALESCE(LEAD(event_type) OVER w, 'none') AS next_type,
      CAST(COALESCE(
        DATE_DIFF('second', LAG(ts) OVER w, ts), -1
      ) AS BIGINT) AS gap_sec
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def over_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD offsets per user timeline (Flink SQL OVER offsets) — the
    building block for gap detection and funnel steps. Nulls at partition
    edges are coalesced to sentinels for engine-stable types."""
    wh = Warehouse(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return wh.events.select(
        "user_id",
        "event_id",
        F.coalesce(F.lag("value").over(w), F.lit(-1.0))
        .cast("double")
        .alias("prev_value"),
        F.coalesce(F.lead("event_type").over(w), F.lit("none")).alias("next_type"),
        F.coalesce(
            (epoch_us(F.col("ts")) / F.lit(1_000_000)).cast("long")
            - F.lag(
                (epoch_us(F.col("ts")) / F.lit(1_000_000)).cast("long")
            ).over(w),
            F.lit(-1),
        )
        .cast("long")
        .alias("gap_sec"),
    )


@query(
    "over_value_fns",
    """
    SELECT DISTINCT
      user_id,
      FIRST_VALUE(event_type) OVER w AS first_type,
      LAST_VALUE(event_type) OVER w AS last_type,
      CAST(COALESCE(NTH_VALUE(event_id, 2) OVER w, -1) AS BIGINT) AS second_event
    FROM events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    )
    """,
)
def over_value_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST/LAST/NTH_VALUE over full-partition frames: each user's first,
    last and second event (Flink SQL value functions)."""
    wh = Warehouse(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return wh.events.select(
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
        F.coalesce(F.nth_value("event_id", 2).over(w), F.lit(-1))
        .cast("long")
        .alias("second_event"),
    ).distinct()


@query(
    "over_running_sum",
    f"""
    SELECT
      user_id,
      event_id,
      {dsum_over_sql('value', 'w')} AS running_value
    FROM events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS UNBOUNDED PRECEDING
    )
    """,
)
def over_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per user (Flink OVER ... ROWS UNBOUNDED PRECEDING).
    Decimal-cast accumulation keeps segment-tree vs sequential window
    evaluation bit-identical across engines; NaN/±Inf values propagate
    IEEE-style from the frame they enter (dsum_over, r10 specials)."""
    wh = Warehouse(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return wh.events.select(
        "user_id",
        "event_id",
        dsum_over(F.col("value"), w).alias("running_value"),
    )


@query(
    "over_moving_avg",
    f"""
    SELECT
      user_id,
      event_id,
      CAST(
        {dsum_over_sql('value', 'w')}
        / COUNT(*) OVER w
      AS DOUBLE) AS moving_avg
    FROM events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
    )
    """,
)
def over_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving average over the last 4 events per user (Flink framed OVER
    aggregate) — exact decimal sum / frame count, one final double divide;
    specials propagate from the frames they sit in (dsum_over, r10)."""
    wh = Warehouse(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return wh.events.select(
        "user_id",
        "event_id",
        (dsum_over(F.col("value"), w) / F.count(F.lit(1)).over(w))
        .cast("double")
        .alias("moving_avg"),
    )


@query(
    "over_event_transitions",
    """
    WITH seq AS (
      SELECT
        user_id,
        event_type,
        LAG(event_type) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
        ) AS prev_type
      FROM events
    )
    SELECT
      prev_type,
      event_type AS curr_type,
      COUNT(*) AS n_transitions,
      COUNT(DISTINCT user_id) AS n_users
    FROM seq
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, curr_type
    """,
)
def over_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition (Markov) matrix per user journey — the DWD
    behavior-analysis feed of a 实时数仓 (which pages lead to purchase,
    which to error). One lag() pass partitioned by user (single shuffle on
    user_id, per-partition sort), then a low-cardinality groupBy whose
    partial agg collapses the 25-cell matrix map-side. Tiebreak (ts,
    event_id) makes the sequence — and therefore every transition pair —
    deterministic under same-timestamp events. At 100 TB this is one
    shuffle of the fact table; the skew risk is bot users with millions of
    events, which AQE skew-split handles because nothing here needs a
    whole user in one task beyond the sort."""
    wh = Warehouse(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = wh.events.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("curr_type"))
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@query(
    "over_time_range",
    f"""
    SELECT
      event_id,
      user_id,
      ts,
      COUNT(*) OVER w AS n_trailing_1h,
      {dsum_over_sql('value', 'w')} AS v_trailing_1h
    FROM events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY ts
      RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW
    )
    """,
)
def over_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE over-window (the signature Flink streaming OVER shape:
    ``RANGE BETWEEN INTERVAL '1' HOUR PRECEDING``): per event, the count
    and sum of the same user's events in the trailing hour. Spark's
    rangeBetween frames only order by numerics, so the order key is
    unix_micros(ts) with a µs-exact interval offset — value-based frames
    make ties deterministic (every equal-ts row shares the same frame).
    In streaming, this per-row emission pattern is an
    applyInPandasWithState running aggregate (SURVEY.md §7.4)."""
    wh = Warehouse(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_us(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return wh.events.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_trailing_1h"),
        dsum_over(F.col("value"), w).alias("v_trailing_1h"),
    )


@query(
    "over_pct_of_total",
    f"""
    WITH nat AS (
      SELECT n.n_regionkey, n.n_name,
             {dsum_sql('o.o_totalprice')} AS nation_rev
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_regionkey, n.n_name
    )
    SELECT
      n_regionkey,
      n_name,
      nation_rev,
      CAST(nation_rev /
           {dsum_over_sql('nation_rev', '(PARTITION BY n_regionkey)', 4, 38)}
           AS DOUBLE) AS region_share
    FROM nat
    """,
)
def over_pct_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total within group (Oracle RATIO_TO_REPORT / the ADS
    'share of region' column): nation revenue over its region's window
    sum. The numerator aggregates through the exact decimal path; the
    window denominator sums the resulting per-nation doubles — safe
    because ≤ 25 addends per region arrive in the deterministic window
    frame order... which streaming/partitioning CAN permute, so the
    denominator also goes through a decimal cast. One agg shuffle + one
    25-row window."""
    wh = Warehouse(spark, sf_dir)
    nat = (
        wh.orders.join(
            wh.customer, F.col("o_custkey") == F.col("c_custkey")
        )
        .join(F.broadcast(wh.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_regionkey", "n_name")
        .agg(dsum(F.col("o_totalprice")).alias("nation_rev"))
    )
    w = Window.partitionBy("n_regionkey")
    # prec 38: a nation's rev can exceed 1e14 once 9.9e12-magnitude
    # orders exist (extremes tier, r10) — the per-row re-quantize of the
    # window stage must not overflow DECIMAL(18,4)'s 1e14 cap.
    denom = dsum_over(F.col("nation_rev"), w, 4, 38)
    return nat.select(
        "n_regionkey",
        "n_name",
        "nation_rev",
        (F.col("nation_rev") / denom).cast("double").alias("region_share"),
    )
