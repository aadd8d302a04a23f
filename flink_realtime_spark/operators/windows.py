"""Event-time windows — SURVEY.md §2.5, the heart of a 实时数仓.

Reference capability: Flink TUMBLE / HOP / SESSION / CUMULATE windows with
watermarks (provenance FLINK/ARCH; snapshot is README-only,
/root/reference/README.md:1-2). Spark-first: ``F.window`` /
``F.session_window`` group keys — identical expressions run bounded here and
unbounded under ``readStream`` + ``withWatermark`` (tests/test_streaming.py
asserts the equivalence). CUMULATE has no Spark primitive; it is composed
from tumbling slices + a running window sum. The watermark late-drop rule is
modeled in batch as a running-max arrival-order filter so even it is
oracle-checkable.

Scale notes (100 TB): window group-bys shuffle on (window, key) — partial
aggregation collapses rows map-side first. Sliding windows multiply rows by
size/slide (here 2×) inside the Expand, before the combine. Session windows
shuffle on the key only and merge per partition. State in the streaming
variants is bounded by the watermark horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_realtime_spark.exprs import dsum, dsum_over, dsum_over_sql, dsum_sql, dtrunc, epoch_us
from flink_realtime_spark.registry import query
from flink_realtime_spark.tables import Warehouse


@query(
    "win_tumble",
    f"""
    SELECT
      date_trunc('hour', ts) AS win_start,
      date_trunc('hour', ts) + INTERVAL '1 hour' AS win_end,
      event_type,
      COUNT(*) AS n_events,
      {dsum_sql('value')} AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def win_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event type (Flink TUMBLE).
    Streaming form: identical expression + withWatermark (see
    tests/test_streaming.py)."""
    wh = Warehouse(spark, sf_dir)
    return (
        wh.events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "win_slide",
    f"""
    SELECT
      time_bucket(INTERVAL '30 minutes', ts) - k * INTERVAL '30 minutes'
        AS win_start,
      time_bucket(INTERVAL '30 minutes', ts) - k * INTERVAL '30 minutes'
        + INTERVAL '1 hour' AS win_end,
      COUNT(*) AS n_events,
      {dsum_sql('value')} AS total_value
    FROM events, range(2) t(k)
    GROUP BY 1, 2
    """,
)
def win_slide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) windows: 1-hour size, 30-minute slide (Flink HOP).
    Spark's Expand assigns each event to its size/slide = 2 windows; the
    oracle reproduces that with an explicit range(2) cross join."""
    wh = Warehouse(spark, sf_dir)
    return (
        wh.events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "n_events",
            "total_value",
        )
    )


@query(
    "win_session",
    f"""
    WITH marked AS (
      SELECT
        user_id, event_id, ts, value,
        CASE
          WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               IS NULL THEN 1
          WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               >= INTERVAL '30 minutes' THEN 1
          ELSE 0
        END AS new_sess
      FROM events
    ),
    numbered AS (
      SELECT *,
        SUM(new_sess) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS UNBOUNDED PRECEDING
        ) AS sess_id
      FROM marked
    )
    SELECT
      user_id,
      MIN(ts) AS sess_start,
      MAX(ts) + INTERVAL '30 minutes' AS sess_end,
      COUNT(*) AS n_events,
      {dsum_sql('value')} AS total_value
    FROM numbered
    GROUP BY user_id, sess_id
    """,
)
def win_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows, 30-minute gap (Flink SESSION; ARCH
    sessionization). Spark's session_window merges events strictly closer
    than the gap; session end = last event + gap. Oracle is the classic
    gaps-and-islands rewrite."""
    wh = Warehouse(spark, sf_dir)
    return (
        wh.events.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("sess_start"),
            F.col("w.end").alias("sess_end"),
            "n_events",
            "total_value",
        )
    )


@query(
    "win_cumulate",
    f"""
    WITH hourly AS (
      SELECT
        CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        date_trunc('hour', ts) + INTERVAL '1 hour' AS hour_end,
        COUNT(*) AS n,
        {dsum_sql('value')} AS v
      FROM events
      GROUP BY 1, 2
    )
    SELECT
      day,
      hour_end,
      CAST(SUM(n) OVER w AS BIGINT) AS cum_events,
      {dsum_over_sql('v', 'w')} AS cum_value
    FROM hourly
    WINDOW w AS (PARTITION BY day ORDER BY hour_end ROWS UNBOUNDED PRECEDING)
    """,
)
def win_cumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative (expanding) windows within a day — Flink CUMULATE, the
    daily-so-far dashboard. No Spark primitive: composed as hourly tumble
    slices + a running per-day window sum; the composition is itself the
    documented scale path (slices aggregate map-side, the running sum only
    touches 24 rows per day per key)."""
    wh = Warehouse(spark, sf_dir)
    hourly = (
        wh.events.groupBy(
            dtrunc("day", "ts").alias("day"),
            F.window("ts", "1 hour").alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("value")).alias("v"),
        )
        .select("day", F.col("w.end").alias("hour_end"), "n", "v")
    )
    w = (
        Window.partitionBy("day")
        .orderBy("hour_end")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return hourly.select(
        "day",
        "hour_end",
        F.sum("n").over(w).cast("long").alias("cum_events"),
        dsum_over(F.col("v"), w).alias("cum_value"),
    )


@query(
    "win_late_drop",
    """
    WITH arr AS (
      SELECT
        event_id, user_id, ts,
        MAX(ts) OVER (ORDER BY event_id ROWS UNBOUNDED PRECEDING) AS wm
      FROM events
    )
    SELECT event_id, user_id, ts
    FROM arr
    WHERE ts >= wm - INTERVAL '10 minutes'
    """,
)
def win_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data drop (Flink WatermarkStrategy bounded
    out-of-orderness), modeled in batch: watermark = running max event time
    in arrival order (event_id) minus 10 minutes; rows older than the
    watermark at their arrival are dropped. The streaming counterpart is
    withWatermark('ts', '10 minutes') — tests/test_streaming.py replays this
    table through readStream and asserts the survivor set is consistent.
    Spark gap vs Flink: no allowedLateness re-fire / side output
    (SURVEY.md §7.4) — late rows are dropped, period. The running max is
    the two-phase prefix from plans/ordered.py (range-partition on
    arrival order → per-partition running max → broadcast prefix-max
    offsets), not a partition-less window."""
    from flink_realtime_spark.plans.ordered import Prefix, ordered_prefix

    wh = Warehouse(spark, sf_dir)
    return (
        ordered_prefix(
            wh.events.select("event_id", "user_id", "ts"),
            [F.col("event_id")],
            prefixes=[Prefix("wm", F.col("ts"), "max")],
        )
        .filter(F.col("ts") >= F.col("wm") - F.expr("INTERVAL 10 MINUTES"))
        .select("event_id", "user_id", "ts")
    )


@query(
    "win_late_side_output",
    """
    WITH arr AS (
      SELECT
        event_id, user_id, ts, event_type,
        MAX(ts) OVER (ORDER BY event_id ROWS UNBOUNDED PRECEDING) AS wm
      FROM events
    )
    SELECT
      event_id,
      user_id,
      event_type,
      CAST(ts < wm - INTERVAL '10 minutes' AS BOOLEAN) AS is_late,
      CAST(CASE WHEN ts < wm - INTERVAL '10 minutes'
           THEN date_diff('second', ts, wm) ELSE 0 END AS BIGINT) AS late_by_sec
    FROM arr
    """,
)
def win_late_side_output(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data side output (Flink OutputTag analog — SURVEY.md §7.4 gap):
    Spark has no tagged side outputs, so the engine's documented mitigation
    is two filtered branches of one watermark-annotated relation. This key
    materializes the tag itself (is_late + lateness) so both branches are
    derivable and the rule is oracle-checked; in streaming the same
    predicate splits the stream before the watermark drop happens. The
    arrival-order running max is the two-phase prefix from
    plans/ordered.py — no partition-less window."""
    from flink_realtime_spark.plans.ordered import Prefix, ordered_prefix

    wh = Warehouse(spark, sf_dir)
    wm_df = ordered_prefix(
        wh.events.select("event_id", "user_id", "event_type", "ts"),
        [F.col("event_id")],
        prefixes=[Prefix("wm", F.col("ts"), "max")],
    )
    late = F.col("ts") < F.col("wm") - F.expr("INTERVAL 10 MINUTES")
    return wm_df.select(
        "event_id",
        "user_id",
        "event_type",
        late.alias("is_late"),
        F.when(
            late,
            (epoch_us(F.col("wm")) / F.lit(1_000_000)).cast("long")
            - (epoch_us(F.col("ts")) / F.lit(1_000_000)).cast("long"),
        )
        .otherwise(0)
        .cast("long")
        .alias("late_by_sec"),
    )


@query(
    "win_late_refire",
    f"""
    WITH arr AS (
      SELECT
        event_id, ts, value,
        MAX(ts) OVER (
          ORDER BY
            ts + CASE
              WHEN event_id % 31 = 0 THEN INTERVAL '3 hours'
              WHEN event_id % 7 = 0 THEN INTERVAL '30 minutes'
              ELSE INTERVAL '0 seconds'
            END,
            event_id
          ROWS UNBOUNDED PRECEDING
        ) AS wm
      FROM events
    ),
    cls AS (
      SELECT
        date_trunc('hour', ts) AS ws,
        (wm - INTERVAL '10 minutes')
          < date_trunc('hour', ts) + INTERVAL '1 hour' AS on_time,
        value
      FROM arr
      WHERE (wm - INTERVAL '10 minutes')
        < date_trunc('hour', ts) + INTERVAL '1 hour' + INTERVAL '1 hour'
    )
    SELECT
      ws AS win_start,
      CAST(COUNT(CASE WHEN on_time THEN 1 END) AS BIGINT) AS n_on_time,
      COALESCE({dsum_sql('CASE WHEN on_time THEN value END')}, 0.0)
        AS sum_on_time,
      CAST(COUNT(CASE WHEN NOT on_time THEN 1 END) AS BIGINT) AS n_refires,
      CAST(COUNT(*) AS BIGINT) AS n_final,
      {dsum_sql('value')} AS sum_final,
      CAST(COUNT(CASE WHEN NOT on_time THEN 1 END) > 0 AS BOOLEAN)
        AS corrected
    FROM cls
    GROUP BY ws
    """,
)
def win_late_refire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """allowedLateness re-fire, reconciled in batch (the §7.4 gap's
    mitigation made executable): Flink re-fires a window for every late
    element until watermark >= window_end + allowedLateness; Spark's
    single global watermark can only drop. The engine's answer is the
    Lambda patch — per window, emit BOTH panes: the first-fire aggregate
    (elements that arrived while the watermark had not passed window end)
    and the final corrected aggregate (plus within-lateness late
    arrivals), with the re-fire count Flink would have emitted in
    between. A serving layer upserts windows where ``corrected`` — the
    same keyed-upsert contract the CDC sink uses, so downstream state
    converges to Flink's post-lateness result without re-fire support.
    Watermark model matches win_late_drop (running max event time over
    arrival order, 10-minute delay; two-phase prefix, no partition-less
    window); lateness = 1 hour; elements past window_end + lateness are
    dropped exactly as Flink drops them. The fixture carries no arrival
    timestamps (event_id order IS time order), so arrival order is
    synthesized with a deterministic straggler pattern — every 7th event
    arrives 30 minutes late (the re-fire band when it straddles an hour
    boundary), every 31st three hours late (always past lateness →
    dropped) — identical arithmetic on both engines, scale-invariant
    pane semantics."""
    from flink_realtime_spark.plans.ordered import Prefix, ordered_prefix

    wh = Warehouse(spark, sf_dir)
    delay = (
        F.when(F.col("event_id") % 31 == 0, F.expr("INTERVAL 3 HOURS"))
        .when(F.col("event_id") % 7 == 0, F.expr("INTERVAL 30 MINUTES"))
        .otherwise(F.expr("INTERVAL 0 SECONDS"))
    )
    base = ordered_prefix(
        wh.events.select(
            "event_id", "ts", "value", (F.col("ts") + delay).alias("arr_ts")
        ),
        [F.col("arr_ts"), F.col("event_id")],
        prefixes=[Prefix("wm", F.col("ts"), "max")],
    )
    ws = dtrunc("hour", F.col("ts"))
    we = ws + F.expr("INTERVAL 1 HOUR")
    eff = F.col("wm") - F.expr("INTERVAL 10 MINUTES")
    on_time = eff < we
    kept = eff < we + F.expr("INTERVAL 1 HOUR")
    return (
        base.filter(kept)
        .select(ws.alias("ws"), on_time.alias("on_time"), "value")
        .groupBy("ws")
        .agg(
            F.count(F.when(F.col("on_time"), 1)).alias("n_on_time"),
            F.coalesce(
                dsum(F.when(F.col("on_time"), F.col("value"))), F.lit(0.0)
            ).alias("sum_on_time"),
            F.count(F.when(~F.col("on_time"), 1)).alias("n_refires"),
            F.count(F.lit(1)).alias("n_final"),
            dsum(F.col("value")).alias("sum_final"),
            (F.count(F.when(~F.col("on_time"), 1)) > 0).alias("corrected"),
        )
        .withColumnRenamed("ws", "win_start")
    )


@query(
    "win_tumble_offset",
    f"""
    -- make_timestamp(µs), not n * INTERVAL 1 SECOND: DuckDB narrows the
    -- interval multiplier to INT32, which overflows at year-2262 epochs
    -- (extremes tier, r10); the µs form is int64 end to end and handles
    -- the negative pre-1970 epochs the same floor() already does.
    SELECT
      make_timestamp(
        (CAST(floor((epoch(ts) - 10800) / 21600) AS BIGINT) * 21600 + 10800)
        * 1000000) AS win_start,
      make_timestamp(
        (CAST(floor((epoch(ts) - 10800) / 21600) AS BIGINT) * 21600 + 32400)
        * 1000000) AS win_end,
      COUNT(*) AS n_events,
      {dsum_sql('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def win_tumble_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling windows with a start offset (Flink TUMBLE's offset arg —
    e.g. business days starting 03:00, or non-UTC day boundaries): 6-hour
    tumble anchored at +3h via F.window's startTime. Same shuffle shape as
    win_tumble; the oracle recomputes the bucket with epoch arithmetic
    (DuckDB epoch() returns double seconds — safe here because floor()
    only consumes the integral part, and an event's distance from a
    6-hour boundary dwarfs the fp error of seconds-since-2024)."""
    wh = Warehouse(spark, sf_dir)
    return (
        wh.events.groupBy(
            F.window("ts", "6 hours", "6 hours", "3 hours").alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "n_events",
            "total_value",
        )
    )


@query(
    "join_window_tvf",
    """
    WITH c AS (
      SELECT user_id, event_id AS click_id,
             CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win_start
      FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT user_id, event_id AS purchase_id,
             CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win_start
      FROM events WHERE event_type = 'purchase'
    )
    SELECT c.win_start, c.user_id, c.click_id, p.purchase_id
    FROM c JOIN p ON c.user_id = p.user_id AND c.win_start = p.win_start
    """,
)
def join_window_tvf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window join (Flink 1.14 window-TVF join): both sides assigned to the
    same tumbling window, then equi-joined on (key, window). Differs from
    the interval join in state shape: window joins expire whole panes at
    watermark, not per-row ranges. The window struct is folded to its
    scalar start for the join key (scalar keys — SCALE.md Lessons); in
    streaming both sides carry the same watermark and the pane state drops
    atomically."""
    wh = Warehouse(spark, sf_dir)
    ev = wh.events.select("user_id", "event_id", "event_type", "ts")

    def windowed(etype: str, idname: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .select(
                "user_id",
                F.col("event_id").alias(idname),
                F.window("ts", "1 hour").alias("w"),
            )
            .select("user_id", idname, F.col("w.start").alias("win_start"))
        )

    c = windowed("click", "click_id")
    p = windowed("purchase", "purchase_id").withColumnsRenamed(
        {"user_id": "p_user", "win_start": "p_win"}
    )
    return c.join(
        p,
        (c["user_id"] == p["p_user"]) & (c["win_start"] == p["p_win"]),
    ).select("win_start", "user_id", "click_id", "purchase_id")


@query(
    "win_topn",
    """
    WITH agg AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS win_start,
             user_id, COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT win_start, user_id, n_events, rn
    FROM (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY win_start
               ORDER BY n_events DESC, user_id NULLS FIRST) AS rn
      FROM agg
    )
    WHERE rn <= 3
    """,
)
def win_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window Top-N (Flink window-TVF Top-N): leaders per tumbling window —
    the 'top products per hour' ADS board. Window agg then per-window
    rank; the rank filter lowers to WindowGroupLimit so each partition
    keeps ≤N rows per window map-side. user_id tiebreak keeps ties
    deterministic (CLAUDE.md invariant: unique tiebreak on every
    row_number ORDER BY)."""
    wh = Warehouse(spark, sf_dir)
    agg = (
        wh.events.groupBy(
            F.window("ts", "1 day").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("win_start"), "user_id", "n_events")
    )
    # user_id is a nullable tiebreak (the null-user event group is one
    # row per window): placement pinned on both sides, r08 nulls-tier
    # class (DuckDB's default placement is not run-to-run stable).
    w = Window.partitionBy("win_start").orderBy(
        F.col("n_events").desc(), F.col("user_id").asc_nulls_first()
    )
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


@query(
    "win_dedup",
    """
    SELECT win_start, user_id, event_id, ts
    FROM (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win_start,
             user_id, event_id, ts,
             ROW_NUMBER() OVER (
               PARTITION BY CAST(date_trunc('hour', ts) AS TIMESTAMP), user_id
               ORDER BY ts, event_id) AS rn
      FROM events
    )
    WHERE rn = 1
    """,
)
def win_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window deduplication (Flink window-TVF dedup): the first event per
    (user, tumbling window) — e.g. first touch per hour. Same
    WindowGroupLimit lowering as win_topn with N=1; streaming state is one
    row per open (window, key), dropped when the pane expires. ts+event_id
    tiebreak keeps simultaneous events deterministic."""
    wh = Warehouse(spark, sf_dir)
    win = (
        wh.events.select(
            F.window("ts", "1 hour").alias("w"), "user_id", "event_id", "ts"
        )
        .select(F.col("w.start").alias("win_start"), "user_id", "event_id", "ts")
    )
    w = Window.partitionBy("win_start", "user_id").orderBy("ts", "event_id")
    return (
        win.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "win_session_dynamic",
    """
    WITH g AS (
      SELECT user_id, event_id, ts,
             CASE WHEN event_type IN ('view', 'click')
                  THEN 1800000000 ELSE 600000000 END AS gap_us
      FROM events
    ),
    marked AS (
      SELECT *,
        CASE WHEN MAX(epoch_us(ts) + gap_us) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) IS NULL THEN 1
             WHEN epoch_us(ts) >= MAX(epoch_us(ts) + gap_us) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) THEN 1
             ELSE 0 END AS new_sess
      FROM g
    ),
    numbered AS (
      SELECT *, SUM(new_sess) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS UNBOUNDED PRECEDING
      ) AS sess_id
      FROM marked
    )
    SELECT
      user_id,
      MIN(ts) AS sess_start,
      make_timestamp(MAX(epoch_us(ts) + gap_us)) AS sess_end,
      COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, sess_id
    """,
)
def win_session_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-gap session windows (Flink's session gap extractor): each
    event extends its session by a PER-EVENT gap — engaged events
    (view/click: 30 min) hold sessions open longer than passive ones
    (10 min). Spark's session_window accepts a gap COLUMN; semantics
    (verified empirically): every event opens [ts, ts+gap) and
    overlapping windows merge, so session end = max(ts+gap) over members.
    The oracle replays that merge rule as running-max gaps-and-islands in
    integer microseconds (exact; epoch() doubles would round µs)."""
    wh = Warehouse(spark, sf_dir)
    gap = F.when(
        F.col("event_type").isin("view", "click"), F.lit("30 minutes")
    ).otherwise(F.lit("10 minutes"))
    return (
        wh.events.groupBy(
            F.session_window("ts", gap).alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("sess_start"),
            F.col("w.end").alias("sess_end"),
            "n_events",
        )
    )
