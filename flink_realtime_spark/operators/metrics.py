"""ADS-layer metric operators — cohort retention, windowed funnels,
histograms, and the binned range join.

Reference capability: the serving-layer metrics every 实时数仓 ADS exposes —
cohort retention boards, time-bounded conversion funnels (the ClickHouse
``retention``/``windowFunnel`` functions commonly sunk to from Flink jobs),
and value-distribution histograms (provenance ARCH/FLINK; the snapshot is
README-only, /root/reference/README.md:1-2). Spark-first: all plain
DataFrame joins + conditional aggregates — no UDFs, everything inside
whole-stage codegen.

Scale notes (100 TB):
- retention: the (user, day) distinct relation is one shuffle on user_id;
  the cohort join is a self-join on user_id (AQE handles skewed power
  users). State is (users × active-days), far below event volume.
- windowed funnel: three keyed min-aggregations chained by time-bound
  joins on user_id — each is one shuffle on the same key, so a cluster
  co-partitions them; never a per-event sort.
- histogram: fixed bucket arithmetic → plain two-phase hash agg; bucket
  count bounds the output regardless of input volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_realtime_spark.exprs import (
    dtrunc,
    epoch_us,
    bigint,
    dsum,
    dsum_over,
    dsum_over_sql,
    dsum_sql,
    finite_or_null,
    finite_sql,
    nonfinite,
    nonfinite_sql,
)
from flink_realtime_spark.registry import query
from flink_realtime_spark.tables import Warehouse


@query(
    "agg_retention",
    """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d
      FROM events
    ),
    coh AS (SELECT user_id, MIN(d) AS d0 FROM days GROUP BY user_id)
    SELECT
      c.d0 AS cohort_day,
      COUNT(DISTINCT c.user_id) AS n_users,
      COUNT(DISTINCT CASE WHEN d.d = c.d0 + INTERVAL 1 DAY
                          THEN c.user_id END) AS r1,
      COUNT(DISTINCT CASE WHEN d.d = c.d0 + INTERVAL 3 DAY
                          THEN c.user_id END) AS r3,
      COUNT(DISTINCT CASE WHEN d.d = c.d0 + INTERVAL 7 DAY
                          THEN c.user_id END) AS r7
    FROM coh c JOIN days d ON c.user_id = d.user_id
    GROUP BY c.d0
    """,
)
def agg_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention in the wide ClickHouse-``retention()`` shape: one
    row per cohort with fixed day+1/+3/+7 return counts as columns (the
    long-format day-offset matrix is ads_retention_cohort in
    operators/aggregates.py). The (user, day) relation is
    distinct-compressed before any join, so the self-join carries
    active-days rows, not raw events."""
    wh = Warehouse(spark, sf_dir)
    days = (
        wh.events.select("user_id", dtrunc("day", "ts").alias("d"))
        .distinct()
    )
    coh = days.groupBy("user_id").agg(F.min("d").alias("d0"))

    def returned(interval: str) -> F.Column:
        return F.countDistinct(
            F.when(F.col("d") == F.col("d0") + F.expr(interval), F.col("user_id"))
        )

    return (
        coh.join(days, "user_id")
        .groupBy(F.col("d0").alias("cohort_day"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            returned("INTERVAL 1 DAY").alias("r1"),
            returned("INTERVAL 3 DAY").alias("r3"),
            returned("INTERVAL 7 DAY").alias("r7"),
        )
    )


@query(
    "agg_funnel_window",
    """
    WITH u AS (SELECT DISTINCT user_id FROM events),
    v AS (SELECT user_id, MIN(ts) AS t1 FROM events
          WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT v.user_id, MIN(e.ts) AS t2
          FROM v JOIN events e ON e.user_id = v.user_id
            AND e.event_type = 'click'
            AND e.ts > v.t1 AND e.ts <= v.t1 + INTERVAL 1 DAY
          GROUP BY v.user_id),
    p AS (SELECT c.user_id, MIN(e.ts) AS t3
          FROM c JOIN v ON v.user_id = c.user_id
          JOIN events e ON e.user_id = c.user_id
            AND e.event_type = 'purchase'
            AND e.ts > c.t2 AND e.ts <= v.t1 + INTERVAL 1 DAY
          GROUP BY c.user_id)
    SELECT
      CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                WHEN c.user_id IS NOT NULL THEN 2
                WHEN v.user_id IS NOT NULL THEN 1
                ELSE 0 END AS BIGINT) AS funnel_level,
      COUNT(*) AS n_users
    FROM u
    LEFT JOIN v ON u.user_id = v.user_id
    LEFT JOIN c ON u.user_id = c.user_id
    LEFT JOIN p ON u.user_id = p.user_id
    GROUP BY 1
    """,
)
def agg_funnel_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-windowed conversion funnel (ClickHouse ``windowFunnel`` shape):
    per user, the deepest view→click→purchase chain reachable greedily
    (earliest qualifying step each time) within 1 day of the first view;
    output is the level distribution. Greedy-min chaining makes the result
    deterministic and SQL-checkable, unlike full NFA backtracking — the
    stateful streaming NFA lives in streaming/stateful.py (cep_funnel)."""
    wh = Warehouse(spark, sf_dir)
    ev = wh.events.select("user_id", "event_type", "ts")
    u = ev.select("user_id").distinct()
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    day = F.expr("INTERVAL 1 DAY")
    c = (
        v.join(
            ev.filter(F.col("event_type") == "click").withColumnRenamed(
                "user_id", "e_user"
            ),
            (F.col("e_user") == v["user_id"])
            & (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + day),
        )
        .groupBy(v["user_id"])
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        c.join(v.withColumnRenamed("user_id", "v_user"), c["user_id"] == F.col("v_user"))
        .join(
            ev.filter(F.col("event_type") == "purchase").withColumnRenamed(
                "user_id", "e_user"
            ),
            (F.col("e_user") == c["user_id"])
            & (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t1") + day),
        )
        .groupBy(c["user_id"])
        .agg(F.min("ts").alias("t3"))
    )
    lvl = (
        u.join(v.select(F.col("user_id").alias("vu")), u["user_id"] == F.col("vu"), "left")
        .join(c.select(F.col("user_id").alias("cu")), u["user_id"] == F.col("cu"), "left")
        .join(p.select(F.col("user_id").alias("pu")), u["user_id"] == F.col("pu"), "left")
        .select(
            bigint(
                F.when(F.col("pu").isNotNull(), 3)
                .when(F.col("cu").isNotNull(), 2)
                .when(F.col("vu").isNotNull(), 1)
                .otherwise(0)
            ).alias("funnel_level")
        )
    )
    return lvl.groupBy("funnel_level").agg(F.count(F.lit(1)).alias("n_users"))


_HIST_LO, _HIST_W, _HIST_NB = 0.0, 25000.0, 20


@query(
    "agg_histogram",
    f"""
    SELECT
      CASE WHEN NOT {nonfinite_sql('o_totalprice')} THEN
        CAST(LEAST(FLOOR((o_totalprice - {_HIST_LO}) / {_HIST_W}),
                   {_HIST_NB - 1}) AS BIGINT) END AS bucket,
      CASE WHEN NOT {nonfinite_sql('o_totalprice')} THEN
        CAST(LEAST(FLOOR((o_totalprice - {_HIST_LO}) / {_HIST_W}),
                   {_HIST_NB - 1}) * {_HIST_W} AS DOUBLE) END AS bucket_lo,
      COUNT(*) AS n_orders,
      {dsum_sql('o_totalprice')} AS sum_price
    FROM orders
    GROUP BY 1, 2
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bound value histogram of order totals (20 × 25k buckets, top
    bucket clamped open-ended) — the ADS distribution-board metric. Pure
    bucket arithmetic + two-phase hash agg; output cardinality is the
    bucket count, independent of input volume.

    SPECIALS (r10 tier): a NaN/±Inf price has no bucket ordinal — the
    BIGINT cast throws on -Inf/NaN in both engines, and the engines'
    LEAST(NaN, k) disagree — so non-finite rows group under a NULL
    bucket whose count and IEEE sum stay visible (the data-quality
    signal, not a silent drop)."""
    wh = Warehouse(spark, sf_dir)
    p = F.col("o_totalprice")
    bucket = F.when(
        ~nonfinite(p),
        bigint(
            F.least(
                F.floor((p - _HIST_LO) / _HIST_W),
                F.lit(_HIST_NB - 1),
            )
        ),
    )
    return (
        wh.orders.select(
            bucket.alias("bucket"),
            (bucket * _HIST_W).cast("double").alias("bucket_lo"),
            "o_totalprice",
        )
        .groupBy("bucket", "bucket_lo")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("sum_price"),
        )
    )


_AQ_PRICE = finite_sql("CAST(l_extendedprice AS DOUBLE)")


@query(
    "agg_approx_quantile",
    f"""
    SELECT
      l_returnflag,
      ROUND(CAST(quantile_cont({_AQ_PRICE}, 0.5)
            AS DOUBLE), 4) AS p50_exact,
      ROUND(CAST(quantile_cont({_AQ_PRICE}, 0.95)
            AS DOUBLE), 4) AS p95_exact,
      ROUND(CAST(quantile_cont({_AQ_PRICE}, 0.99)
            AS DOUBLE), 4) AS p99_exact,
      COUNT(*) AS n_items,
      CAST(approx_quantile({_AQ_PRICE}, 0.5)
           BETWEEN quantile_cont({_AQ_PRICE}, 0.48)
               AND quantile_cont({_AQ_PRICE}, 0.52)
           AS BOOLEAN) AS p50_ok,
      CAST(approx_quantile({_AQ_PRICE}, 0.95)
           BETWEEN quantile_cont({_AQ_PRICE}, 0.93)
               AND quantile_cont({_AQ_PRICE}, 0.97)
           AS BOOLEAN) AS p95_ok,
      CAST(approx_quantile({_AQ_PRICE}, 0.99)
           BETWEEN quantile_cont({_AQ_PRICE}, 0.97)
               AND quantile_cont({_AQ_PRICE}, 1.0)
           AS BOOLEAN) AS p99_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate per-group quantiles (percentile_approx / t-digest-style
    mergeable sketch) — the 100 TB path for agg_stats' exact percentiles:
    exact per-group percentile sorts every group; the sketch is one
    two-phase agg with O(accuracy) state per group, mergeable across
    partitions. Sketch values are engine-specific, so the hash-checkable
    contract is the tolerance-verdict shape (see agg_approx_distinct):
    both engines emit the exact interpolated percentiles (identical,
    rounded to 4 — the pipe_dataset_card-proven pattern) plus booleans
    asserting their OWN sketch lands inside an exact RANK band
    (percentile p ± 0.02) — the band is in rank space because that is
    what both sketches actually guarantee (GK bounds rank error at
    n/accuracy = 0.01% here; t-digest is quantile-accurate near tails),
    so the verdict holds with a 100-200× margin and cannot flake on a
    sparse value distribution or a merge-order-dependent estimate the
    way a relative-VALUE band could. tests/test_metrics_props.py keeps
    the numeric rank-band bound.

    SPECIALS (r10 tier): quantiles run over the FINITE subset on both
    sides (the agg_stats order-statistics contract — an interpolated
    quantile has no ordinal position for NaN, and the engines place it
    differently in the interpolation)."""
    wh = Warehouse(spark, sf_dir)
    acc = F.lit(10000)
    price = finite_or_null(F.col("l_extendedprice").cast("double"))
    bands = ((0.5, 0.48, 0.52, 50), (0.95, 0.93, 0.97, 95), (0.99, 0.97, 1.0, 99))
    out = wh.lineitem.groupBy("l_returnflag").agg(
        *[
            F.round(F.percentile(price, F.lit(p)), 4).alias(f"p{n}_exact")
            for p, _lo, _hi, n in bands
        ],
        F.count(F.lit(1)).alias("n_items"),
        *[
            F.percentile_approx(price, F.lit(p), acc)
            .between(
                F.percentile(price, F.lit(lo)), F.percentile(price, F.lit(hi))
            )
            .alias(f"p{n}_ok")
            for p, lo, hi, n in bands
        ],
    )
    return out


@query(
    "ads_audience_overlap",
    """
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
    SELECT
      a.event_type AS type_a,
      b.event_type AS type_b,
      COUNT(*) AS overlap_users
    FROM ut a
    JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
    """,
)
def ads_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix (crowd-selection ADS board): |A ∩ B| per
    event-type pair. Distinct (user, type) first — the self-join carries
    one row per membership, not per event, and COUNT(*) of the joined
    distinct pairs IS the distinct-user overlap (no second distinct). At
    100 TB replace the exact self-join with per-segment HLL sketches and
    inclusion-exclusion (|A∩B| ≈ |A|+|B|−|A∪B| via hll_union_agg — the
    mergeable-sketch path agg_uv_sketch_rollup demonstrates)."""
    wh = Warehouse(spark, sf_dir)
    ut = wh.events.select("user_id", "event_type").distinct()
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select(F.col("user_id").alias("b_user"), F.col("event_type").alias("type_b"))
    return (
        a.join(b, (a["user_id"] == b["b_user"]) & (F.col("type_a") < F.col("type_b")))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("overlap_users"))
    )


@query(
    "ads_session_stats",
    """
    WITH marked AS (
      SELECT user_id, ts, event_id,
        CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  IS NULL THEN 1
             WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  >= INTERVAL '30 minutes' THEN 1
             ELSE 0 END AS new_sess
      FROM events
    ),
    numbered AS (
      SELECT *, SUM(new_sess) OVER (
        PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
      ) AS sess_id
      FROM marked
    ),
    sessions AS (
      SELECT user_id, sess_id,
        MIN(ts) AS first_ts,
        epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us,
        COUNT(*) AS n_events
      FROM numbered GROUP BY user_id, sess_id
    )
    SELECT
      CAST(date_trunc('day', first_ts) AS TIMESTAMP) AS day,
      COUNT(*) AS n_sessions,
      CAST(CAST(SUM(dur_us) AS DOUBLE) / COUNT(*) / 1000000.0 AS DOUBLE)
        AS avg_duration_s,
      CAST(CAST(SUM(n_events) AS DOUBLE) / COUNT(*) AS DOUBLE)
        AS avg_events
    FROM sessions
    GROUP BY 1
    """,
)
def ads_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-quality ADS board: per day (of session start), session
    count, mean duration, mean depth — the engagement dashboard built ON
    the sessionizer. Durations sum as exact integer microseconds before
    one final double division, so the averages are accumulation-order
    free. Composes F.session_window (the same primitive win_session
    oracle-checks) with a daily rollup."""
    wh = Warehouse(spark, sf_dir)
    sess = (
        wh.events.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .select(
            dtrunc("day", "first_ts").alias("day"),
            (epoch_us(F.col("last_ts")) - epoch_us(F.col("first_ts"))).alias(
                "dur_us"
            ),
            "n_events",
        )
    )
    return sess.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        (
            F.sum("dur_us").cast("double") / F.count(F.lit(1)) / 1000000.0
        ).cast("double").alias("avg_duration_s"),
        (F.sum("n_events").cast("double") / F.count(F.lit(1)))
        .cast("double")
        .alias("avg_events"),
    )


@query(
    "dq_integrity_checks",
    """
    SELECT 'orders.custkey_fk' AS check_name, COUNT(*) AS violations
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey IS NULL
    UNION ALL
    SELECT 'lineitem.orderkey_fk', COUNT(*)
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IS NULL
    UNION ALL
    SELECT 'orders.pk_unique', COUNT(*) FROM (
      SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1
    )
    UNION ALL
    SELECT 'events.ts_not_null', COUNT(*) FROM events WHERE ts IS NULL
    UNION ALL
    SELECT 'lineitem.discount_range', COUNT(*)
    FROM lineitem WHERE l_discount < 0 OR l_discount > 0.1
    """,
)
def dq_integrity_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate (the dbt-test / Flink-job-preflight battery as one
    relation): referential integrity via anti-join counts, key
    uniqueness, null and domain checks — each a violation count, all zero
    on healthy input. Anti-joins broadcast the dimension side; the whole
    battery is one pass per table at scan speed, and the output relation
    is the audit artifact a layer promotion gates on."""
    wh = Warehouse(spark, sf_dir)
    orders, cust, li, ev = wh.orders, wh.customer, wh.lineitem, wh.events
    checks = [
        (
            "orders.custkey_fk",
            orders.join(
                cust, orders["o_custkey"] == cust["c_custkey"], "left_anti"
            ),
        ),
        (
            "lineitem.orderkey_fk",
            li.join(
                orders, li["l_orderkey"] == orders["o_orderkey"], "left_anti"
            ),
        ),
        (
            "orders.pk_unique",
            orders.groupBy("o_orderkey")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1),
        ),
        ("events.ts_not_null", ev.filter(F.col("ts").isNull())),
        (
            "lineitem.discount_range",
            li.filter((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)),
        ),
    ]
    out = None
    for name, df in checks:
        one = df.agg(F.count(F.lit(1)).alias("violations")).select(
            F.lit(name).alias("check_name"), "violations"
        )
        out = one if out is None else out.unionByName(one)
    return out


@query(
    "agg_freq_items",
    """
    WITH t AS (SELECT COUNT(*) AS n FROM events),
    ev AS (
      SELECT event_type, COUNT(*) AS c FROM events GROUP BY event_type
    ),
    uh AS (SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id)
    SELECT 'event_type' AS col,
      CAST((SELECT COUNT(*) FROM ev, t WHERE c > 0.05 * n) AS BIGINT)
        AS n_heavy,
      CAST(0 AS BIGINT) AS n_missed
    UNION ALL
    SELECT 'user_id',
      CAST((SELECT COUNT(*) FROM uh, t WHERE c > 0.05 * n) AS BIGINT),
      CAST(0 AS BIGINT)
    """,
)
def agg_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate heavy hitters via DataFrame.stat.freqItems (the
    Karp-Schenker-Papadimitriou one-pass algorithm): every value with
    frequency above the support threshold is guaranteed present (false
    positives possible, false negatives not). The sketch's item LIST is
    not engine-stable, so the hash-checkable contract is the guarantee
    itself: per column, the exact heavy-hitter count (identical on both
    engines) and how many exact heavy hitters the sketch MISSED — zero by
    the algorithm's no-false-negative property, and the oracle pins the
    literal zero. tests/test_metrics_props.py keeps the set-level check."""
    wh = Warehouse(spark, sf_dir)
    ev = wh.events.select("event_type", "user_id")
    fi = ev.stat.freqItems(["event_type", "user_id"], support=0.05)
    total = ev.agg(F.count(F.lit(1)).alias("n"))

    def verdict(col: str, fi_col: str) -> DataFrame:
        heavy = (
            ev.groupBy(col)
            .agg(F.count(F.lit(1)).alias("c"))
            .crossJoin(F.broadcast(total))
            .filter(F.col("c") > 0.05 * F.col("n"))
        )
        sketch_items = fi.select(F.explode(fi_col).alias(col))
        missed = heavy.join(F.broadcast(sketch_items), col, "left_anti")
        return (
            heavy.agg(F.count(F.lit(1)).alias("n_heavy"))
            .crossJoin(missed.agg(F.count(F.lit(1)).alias("n_missed")))
            .select(
                F.lit(col).alias("col"),
                F.col("n_heavy").cast("long").alias("n_heavy"),
                F.col("n_missed").cast("long").alias("n_missed"),
            )
        )

    return verdict("event_type", "event_type_freqItems").unionByName(
        verdict("user_id", "user_id_freqItems")
    )


@query(
    "dq_gap_detection",
    """
    WITH bounds AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             COUNT(DISTINCT date_trunc('hour', ts)) AS observed_hours
      FROM events GROUP BY 1
    )
    SELECT
      day,
      CAST(24 AS BIGINT) AS expected_hours,
      observed_hours,
      CAST(24 - observed_hours AS BIGINT) AS missing_hours
    FROM bounds
    """,
)
def dq_gap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-completeness monitor: hours with zero events per calendar
    day — the 'did the pipeline stall' board (ARCH ops monitoring, the
    batch analog of a watermark-stall alert). Distinct hour buckets per
    day against the 24-slot calendar; at scale this runs on the layer's
    partition metadata rather than raw rows."""
    wh = Warehouse(spark, sf_dir)
    return (
        wh.events.groupBy(dtrunc("day", "ts").alias("day"))
        .agg(
            F.countDistinct(dtrunc("hour", "ts")).alias("observed_hours")
        )
        .select(
            "day",
            F.lit(24).cast("long").alias("expected_hours"),
            "observed_hours",
            (F.lit(24) - F.col("observed_hours")).cast("long").alias(
                "missing_hours"
            ),
        )
    )


@query(
    "ads_pareto_share",
    f"""
    -- every decimal→double routes VIA STRING (exprs.dsum_sql rationale):
    -- at ×1000 facts cum_rev carries ~17 significant digits, where
    -- DuckDB's direct CAST(DECIMAL AS DOUBLE) double-rounds 1 ulp off
    -- Spark's correctly-rounded BigDecimal cast (caught by the r07
    -- ×1000-tier widening; sf0.01–×100 magnitudes masked it)
    WITH cust AS (
      SELECT o_custkey, {dsum_sql('o_totalprice')} AS rev
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT o_custkey, rev,
        CAST(ROW_NUMBER() OVER (
          ORDER BY rev DESC NULLS LAST, o_custkey NULLS FIRST
        ) AS BIGINT)
          AS rnk,
        {dsum_over_sql('rev', 'w')} AS cum_rev,
        {dsum_over_sql('rev', '()')} AS total_rev
      FROM cust
      WINDOW w AS (
        ORDER BY rev DESC NULLS LAST, o_custkey NULLS FIRST
        ROWS UNBOUNDED PRECEDING
      )
    )
    SELECT o_custkey, rev, rnk,
      CAST(cum_rev / total_rev AS DOUBLE) AS cum_share,
      CASE WHEN cum_rev / total_rev <= 0.5 THEN 'A'
           WHEN cum_rev / total_rev <= 0.8 THEN 'B'
           ELSE 'C' END AS abc_class
    FROM ranked
    """,
)
def ads_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC customer analysis (the 'top customers drive X% of
    revenue' ADS board): revenue-ranked cumulative share with A/B/C tiers
    at 50%/80%. Every sum — per customer, running, and grand total — goes
    through the decimal-exact path so the share boundaries can't drift
    between engines. The rank and running sum are the two-phase ordered
    prefix from plans/ordered.py (no partition-less window — even at
    customer cardinality the single-task formulation is the wrong shape);
    the grand total is a broadcast one-row cross join."""
    from flink_realtime_spark.plans.ordered import Prefix, ordered_prefix

    wh = Warehouse(spark, sf_dir)
    cust = wh.orders.groupBy("o_custkey").agg(
        dsum(F.col("o_totalprice")).alias("rev")
    )
    # dsum's two-channel form carried through the ordered prefix: the
    # decimal channel holds the exact finite running sum, the double
    # channel holds only specials (0 when none) — their per-row combine
    # below is exactly dsum's CASE (r10 specials tier; per-customer rev
    # can be NaN/±Inf once a price is).
    nf = nonfinite(F.col("rev"))
    dec = F.when(~nf, F.col("rev")).cast("decimal(18,4)")
    spec = F.when(nf, F.col("rev")).otherwise(F.lit(0.0))
    total = cust.agg(dsum(F.col("rev")).alias("total_rev"))
    ranked = (
        ordered_prefix(
            cust,
            [F.col("rev").desc_nulls_last(), F.col("o_custkey").asc_nulls_first()],
            prefixes=[
                Prefix("__cum_d", dec, "sum"),
                Prefix("__cum_s", spec, "sum"),
            ],
            pos_col="rnk",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "o_custkey",
            "rev",
            "rnk",
            F.when(
                F.isnan(F.col("__cum_s")) | (F.col("__cum_s") != 0.0),
                F.col("__cum_s"),
            )
            .otherwise(F.col("__cum_d").cast("string").cast("double"))
            .alias("cum_rev"),
            "total_rev",
        )
    )
    share = F.col("cum_rev") / F.col("total_rev")
    return ranked.select(
        "o_custkey",
        "rev",
        "rnk",
        share.cast("double").alias("cum_share"),
        F.when(share <= 0.5, "A").when(share <= 0.8, "B").otherwise("C").alias(
            "abc_class"
        ),
    )


@query(
    "ads_monthly_yoy",
    f"""
    WITH monthly AS (
      SELECT
        CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
        {dsum_sql('o_totalprice')} AS gmv,
        COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT
      month,
      gmv,
      n_orders,
      CAST(COALESCE(LAG(gmv, 12) OVER w, -1.0) AS DOUBLE)
        AS gmv_last_year,
      CAST(CASE WHEN LAG(gmv, 12) OVER w IS NULL THEN -1.0
           ELSE gmv / LAG(gmv, 12) OVER w - 1.0
           END AS DOUBLE) AS yoy_growth
    FROM monthly
    -- IS NOT DISTINCT FROM NULL, not IS NULL: DuckDB 1.0 misfolds
    -- IS NULL to FALSE on a GROUP-BY-computed key (broken null-stats
    -- propagation through the aggregate — the same broken reasoning
    -- makes the null row's SORT placement run-to-run unstable, the
    -- original r08 flake on this key)
    WINDOW w AS (PARTITION BY month IS NOT DISTINCT FROM NULL
                 ORDER BY month)
    """,
)
def ads_monthly_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year growth board: monthly GMV against the same month one
    year back (LAG 12 over the month series — correct because monthly
    buckets are dense in the fixture; production guards gaps by joining
    on month - INTERVAL 1 YEAR instead). Missing baselines coalesce to a
    -1 sentinel for engine-stable types. The LAG window runs over the
    calendar-bounded monthly aggregate, partitioned by MONTH-NULLNESS
    (r08 nulls-tier find): an unknown-month row must not shift every
    real month's LAG-12 baseline off by one — and DuckDB's DEFAULT null
    placement in a window sort is not even run-to-run stable (observed
    1-in-6 flipping on this key: the oracle's null row sometimes drew
    the 69th month's gmv as its "year ago"). The nullness partition is
    a populated, 2-bounded spec, so the single-bucket plan-audit intent
    is preserved too."""
    wh = Warehouse(spark, sf_dir)
    monthly = (
        wh.orders.groupBy(dtrunc("month", "o_orderdate").alias("month"))
        .agg(
            dsum(F.col("o_totalprice")).alias("gmv"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    w = Window.partitionBy(F.col("month").isNull()).orderBy("month")
    ly = F.lag("gmv", 12).over(w)
    return monthly.select(
        "month",
        "gmv",
        "n_orders",
        F.coalesce(ly, F.lit(-1.0)).cast("double").alias("gmv_last_year"),
        F.when(ly.isNull(), -1.0)
        .otherwise(F.col("gmv") / ly - 1.0)
        .cast("double")
        .alias("yoy_growth"),
    )


@query(
    "ads_new_vs_returning",
    """
    WITH first_day AS (
      SELECT user_id,
             MIN(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS d0
      FROM events GROUP BY user_id
    ),
    daily AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
      FROM events
    )
    SELECT
      daily.day,
      CAST(SUM(CASE WHEN daily.day = f.d0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_new,
      CAST(SUM(CASE WHEN daily.day > f.d0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_returning
    FROM daily JOIN first_day f ON daily.user_id = f.user_id
    GROUP BY daily.day
    """,
)
def ads_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning visitor split (the acquisition board next to
    PV/UV): users active each day classified by whether it is their
    first-ever day. Same compressed (user, day) relation as retention —
    one shuffle for first-day, one join, one day rollup."""
    wh = Warehouse(spark, sf_dir)
    daily = (
        wh.events.select("user_id", dtrunc("day", "ts").alias("day"))
        .distinct()
    )
    first_day = daily.groupBy("user_id").agg(F.min("day").alias("d0"))
    return (
        daily.join(first_day, "user_id")
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("day") == F.col("d0"), 1).otherwise(0))
            .cast("long")
            .alias("n_new"),
            F.sum(F.when(F.col("day") > F.col("d0"), 1).otherwise(0))
            .cast("long")
            .alias("n_returning"),
        )
    )


@query(
    "over_streak_detection",
    """
    WITH daily AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
      FROM events
    ),
    grouped AS (
      SELECT user_id, day,
        day - CAST(ROW_NUMBER() OVER (
                PARTITION BY user_id ORDER BY day) AS BIGINT)
              * INTERVAL 1 DAY AS anchor
      FROM daily
    ),
    streaks AS (
      SELECT user_id, anchor, COUNT(*) AS len
      FROM grouped GROUP BY user_id, anchor
    )
    SELECT
      user_id,
      CAST(MAX(len) AS BIGINT) AS longest_streak,
      CAST(SUM(len) AS BIGINT) AS n_active_days,
      COUNT(*) AS n_streaks
    FROM streaks
    GROUP BY user_id
    """,
)
def over_streak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user (the engagement
    metric next to retention): classic gaps-and-islands — consecutive
    days share the same (day − row_number·1day) anchor, so streaks fall
    out of one group-by. Two shuffles on user_id over the compressed
    (user, day) relation."""
    wh = Warehouse(spark, sf_dir)
    daily = (
        wh.events.select("user_id", dtrunc("day", "ts").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    grouped = daily.withColumn(
        "anchor",
        F.col("day")
        - F.row_number().over(w).cast("long") * F.expr("INTERVAL 1 DAY"),
    )
    streaks = grouped.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.max("len").cast("long").alias("longest_streak"),
        F.sum("len").cast("long").alias("n_active_days"),
        F.count(F.lit(1)).alias("n_streaks"),
    )


@query(
    "ads_time_to_convert",
    """
    WITH u AS (
      SELECT user_id,
             MIN(ts) FILTER (WHERE event_type = 'view') AS first_view,
             MIN(ts) FILTER (WHERE event_type = 'purchase') AS first_purchase
      FROM events GROUP BY user_id
    ),
    conv AS (
      SELECT
        CAST(date_trunc('day', first_purchase) AS TIMESTAMP) AS conv_day,
        epoch_us(first_purchase) - epoch_us(first_view) AS dur_us
      FROM u
      WHERE first_purchase > first_view
    )
    SELECT
      conv_day,
      COUNT(*) AS n_converted,
      CAST(CAST(SUM(dur_us) AS DOUBLE) / COUNT(*) / 1000000.0 AS DOUBLE)
        AS avg_sec,
      CAST(median(dur_us) / 1000000.0 AS DOUBLE) AS median_sec
    FROM conv
    GROUP BY conv_day
    """,
)
def ads_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert board (the latency companion to the conversion
    funnel): per conversion day, how many users made their first purchase
    after their first view, with mean and median view→purchase latency.
    Durations are exact integer microseconds (unix_micros difference), so
    the mean is SUM(BIGINT)/COUNT — one deterministic double division —
    and the median interpolates two exact integers, identical in both
    engines.

    Scale shape: one keyed aggregation compresses events to a per-user
    (first_view, first_purchase) pair — conditional MIN, the same
    one-shuffle chain the windowed funnel uses — then a day-level agg
    over |converted users| rows. The exact median sorts only the
    day-group durations (group size = conversions/day); at extreme
    volumes swap median for percentile_approx (t-digest, mergeable) per
    the agg_approx_quantile pattern."""
    wh = Warehouse(spark, sf_dir)
    u = wh.events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    conv = u.filter(F.col("first_purchase") > F.col("first_view")).select(
        dtrunc("day", "first_purchase").alias("conv_day"),
        (
            epoch_us(F.col("first_purchase")) - epoch_us(F.col("first_view"))
        ).alias("dur_us"),
    )
    return conv.groupBy("conv_day").agg(
        F.count(F.lit(1)).alias("n_converted"),
        (F.sum("dur_us").cast("double") / F.count(F.lit(1)) / 1e6)
        .cast("double")
        .alias("avg_sec"),
        (F.median("dur_us") / 1e6).cast("double").alias("median_sec"),
    )


@query(
    "ads_heatmap_hour_dow",
    """
    SELECT
      CAST(isodow(ts) AS BIGINT) AS dow,
      CAST(hour(ts) AS BIGINT) AS hod,
      COUNT(*) AS pv,
      COUNT(DISTINCT user_id) AS uv
    FROM events
    GROUP BY 1, 2
    """,
)
def ads_heatmap_hour_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity heatmap by (ISO day-of-week, hour-of-day) — the traffic
    calendar on every ops dashboard. ISO numbering (Mon=1..Sun=7) on both
    sides: Spark's dayofweek() counts from Sunday while DuckDB's counts
    Monday=1, so the portable form is weekday()+1 == isodow — a
    cross-engine calendar-convention trap worth pinning in code. Output is
    at most 7×24 rows off one two-phase agg (the distinct-UV expansion is
    the only second shuffle)."""
    wh = Warehouse(spark, sf_dir)
    return (
        wh.events.groupBy(
            (F.weekday("ts") + 1).cast("long").alias("dow"),
            F.hour("ts").cast("long").alias("hod"),
        )
        .agg(
            F.count(F.lit(1)).alias("pv"),
            F.countDistinct("user_id").alias("uv"),
        )
    )


# The event-flow state machine the DQ board validates against: a user may
# browse (view→view/click/signup), act (click→purchase/view/click), etc.
# Transitions OUTSIDE this allowed set are process violations to count.
_FSM_ALLOWED = [
    "view>view", "view>click", "view>signup", "view>error",
    "click>view", "click>click", "click>purchase",
    "signup>view", "purchase>view", "error>view",
]


@query(
    "dq_illegal_transitions",
    f"""
    WITH seq AS (
      SELECT
        user_id,
        CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
        LAG(event_type) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
        ) || '>' || event_type AS trans
      FROM events
    )
    SELECT
      d,
      COUNT(*) AS n_transitions,
      COUNT(*) FILTER (
        WHERE trans NOT IN ({", ".join("'" + t + "'" for t in _FSM_ALLOWED)})
      ) AS n_illegal,
      CAST(COUNT(*) FILTER (
        WHERE trans NOT IN ({", ".join("'" + t + "'" for t in _FSM_ALLOWED)})
      ) AS DOUBLE) / COUNT(*) AS illegal_rate
    FROM seq
    WHERE trans IS NOT NULL
    GROUP BY d
    """,
)
def dq_illegal_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-flow FSM validation (the DQ twin of CEP pattern matching):
    per-user consecutive event-type transitions checked against an
    allowed-transition set, daily counts and illegal rate. One keyed
    window (the same per-user LAG the CEP family uses — deterministic
    (ts, event_id) tiebreak) and a membership probe against the literal
    FSM edge list; the per-day agg is two-phase. At 100 TB the FSM table
    is config data broadcast exactly like state_rule_engine's rules."""
    wh = Warehouse(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # F.concat (not concat_ws) so a NULL event_type on EITHER end makes
    # the transition NULL, exactly like the oracle's `||` — a null-typed
    # row is not a legal FSM edge endpoint, and concat_ws would silently
    # count "prev>" edges into n_transitions (nulls-tier find). The
    # IS NOT NULL filter then subsumes the old has_prev first-row guard.
    trans = F.concat(
        F.lag("event_type").over(w), F.lit(">"), F.col("event_type")
    )
    seq = wh.events.select(
        dtrunc("day", "ts").alias("d"),
        trans.alias("trans"),
    ).filter(F.col("trans").isNotNull())
    illegal = ~F.col("trans").isin(_FSM_ALLOWED)
    return seq.groupBy("d").agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.count(F.when(illegal, 1)).alias("n_illegal"),
        (
            F.count(F.when(illegal, 1)).cast("double") / F.count(F.lit(1))
        ).alias("illegal_rate"),
    )


@query(
    "ads_stickiness_dau_wau",
    """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d
      FROM events
    ),
    cal AS (SELECT DISTINCT d FROM days)
    SELECT
      c.d,
      COUNT(DISTINCT CASE WHEN a.d = c.d THEN a.user_id END) AS dau,
      COUNT(DISTINCT a.user_id) AS wau,
      CAST(COUNT(DISTINCT CASE WHEN a.d = c.d THEN a.user_id END) AS DOUBLE)
        / COUNT(DISTINCT a.user_id) AS stickiness
    FROM cal c
    JOIN days a
      ON a.d BETWEEN c.d - INTERVAL 6 DAY AND c.d
    GROUP BY c.d
    """,
)
def ads_stickiness_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness board: per calendar day, daily actives, trailing
    7-day actives, and their ratio (the classic engagement-health metric).
    Events compress to the distinct (user, day) relation FIRST — the same
    compression retention uses, so the trailing-window path carries
    active-days rows, not events. The trailing membership is then a
    BOUNDED EXPLODE, not a theta join: each active day covers exactly the
    7 calendar days [d, d+6] (`explode(sequence(d, d+6))`), and the
    observed-calendar restriction rides a broadcast EQUI-join on the
    exploded day — a BroadcastHashJoin with 7× fan-out on the big side,
    versus the naive `a.d BETWEEN c.d-6 AND c.d` predicate which has no
    equi component and plans a BroadcastNestedLoopJoin comparing every
    (user, day) row against ALL calendar days (O(|user-days| × |cal|) —
    ~1000× avoidable work at 3 years of data). Same bounded-fanout trick
    as join_range_binned. At extreme user counts the exact distinct swaps
    for mergeable HLL sketches per day, unioned over the window (the
    agg_uv_sketch_rollup pattern)."""
    wh = Warehouse(spark, sf_dir)
    days = (
        wh.events.select("user_id", dtrunc("day", "ts").alias("d"))
        .distinct()
    )
    cal = days.select("d").distinct().select(F.col("d").alias("cd"))
    covered = days.select(
        "user_id",
        "d",
        F.explode(
            F.sequence(
                F.col("d"),
                F.col("d") + F.expr("INTERVAL 6 DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("cd"),
    )
    joined = covered.join(F.broadcast(cal), "cd")
    same_day_user = F.when(F.col("d") == F.col("cd"), F.col("user_id"))
    return (
        joined.groupBy("cd")
        .agg(
            F.countDistinct(same_day_user).alias("dau"),
            F.countDistinct("user_id").alias("wau"),
            (
                F.countDistinct(same_day_user).cast("double")
                / F.countDistinct("user_id")
            ).alias("stickiness"),
        )
        .withColumnRenamed("cd", "d")
    )


@query(
    "ads_stickiness_sketch",
    """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d
      FROM events
    ),
    cal AS (SELECT DISTINCT d AS cd FROM days),
    cov AS (
      SELECT user_id, d,
             unnest(generate_series(d, d + INTERVAL 6 DAY, INTERVAL 1 DAY))
               AS cd
      FROM days
    ),
    j AS (SELECT cov.* FROM cov JOIN cal USING (cd))
    SELECT
      cd AS d,
      COUNT(DISTINCT CASE WHEN d = cd THEN user_id END) AS dau_exact,
      COUNT(DISTINCT user_id) AS wau_exact,
      CAST(abs(approx_count_distinct(CASE WHEN d = cd THEN user_id END)
               - COUNT(DISTINCT CASE WHEN d = cd THEN user_id END))
           <= 0.05 * COUNT(DISTINCT CASE WHEN d = cd THEN user_id END)
           AS BOOLEAN) AS dau_ok,
      CAST(abs(approx_count_distinct(user_id)
               - COUNT(DISTINCT user_id))
           <= 0.05 * COUNT(DISTINCT user_id) AS BOOLEAN) AS wau_ok
    FROM j
    GROUP BY cd
    """,
)
def ads_stickiness_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stickiness board's documented 100 TB path made executable: at
    extreme user counts the exact COUNT(DISTINCT) over the 7×-exploded
    relation swaps for mergeable HLL sketches (1.5 KB/group vs the key
    universe). Estimator internals differ across engines, so the
    oracle-checkable contract is the agg_approx_distinct tolerance
    verdict: both engines emit the exact counts (identical by definition)
    plus booleans asserting their OWN estimator lands within ±5%. Same
    bounded-explode equi-join shape as ads_stickiness_dau_wau."""
    wh = Warehouse(spark, sf_dir)
    days = (
        wh.events.select("user_id", dtrunc("day", "ts").alias("d"))
        .distinct()
    )
    cal = days.select("d").distinct().select(F.col("d").alias("cd"))
    covered = days.select(
        "user_id",
        "d",
        F.explode(
            F.sequence(
                F.col("d"),
                F.col("d") + F.expr("INTERVAL 6 DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("cd"),
    )
    joined = covered.join(F.broadcast(cal), "cd")
    same_day = F.when(F.col("d") == F.col("cd"), F.col("user_id"))
    dau_exact = F.countDistinct(same_day)
    wau_exact = F.countDistinct("user_id")
    dau_hll = F.approx_count_distinct(same_day, rsd=0.02)
    wau_hll = F.approx_count_distinct("user_id", rsd=0.02)
    return (
        joined.groupBy("cd")
        .agg(
            dau_exact.alias("dau_exact"),
            wau_exact.alias("wau_exact"),
            (F.abs(dau_hll - dau_exact) <= 0.05 * dau_exact).alias("dau_ok"),
            (F.abs(wau_hll - wau_exact) <= 0.05 * wau_exact).alias("wau_ok"),
        )
        .withColumnRenamed("cd", "d")
    )
