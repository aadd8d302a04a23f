"""Row-level operators, sorts, limits, set operations — SURVEY.md §2.2/§2.7.

Reference capability: Flink DataStream map/filter/flatMap and SQL
SELECT/WHERE/UNNEST/ORDER BY/LIMIT/UNION/INTERSECT/EXCEPT (provenance
FLINK/ARCH; snapshot is README-only, /root/reference/README.md:1-2).
Spark-first: these are pure narrow/exchange built-ins — Catalyst pushes the
filters and pruned columns into the parquet scan, so at 100 TB the scan
reads only the referenced columns and skips row groups via min/max stats.

Determinism notes: dedup uses DISTINCT (keyed keep-one dedup lives in
streaming/stateful.py as cdc_latest_image with a total-order tiebreak);
top-k sorts always carry a unique tiebreak column so the selected set is
engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_realtime_spark.registry import query
from flink_realtime_spark.tables import Warehouse


@query(
    "proj_compute",
    """
    SELECT
      l_orderkey,
      l_linenumber,
      CAST(l_extendedprice * (1 - l_discount) AS DOUBLE) AS net_price,
      CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DOUBLE) AS charge,
      l_returnflag || '/' || l_linestatus AS flag_status,
      CAST(l_quantity >= 25 AS BOOLEAN) AS bulk
    FROM lineitem
    """,
)
def proj_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row computed columns / renames / casts (Flink map, SQL SELECT).
    Pure narrow op: whole-stage codegen, no shuffle, column-pruned scan."""
    wh = Warehouse(spark, sf_dir)
    li = wh.lineitem
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("double")
        .alias("net_price"),
        (
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax"))
        )
        .cast("double")
        .alias("charge"),
        # F.concat (not concat_ws): SQL || NULL-PROPAGATES, concat_ws
        # silently skips null parts — divergent once flags can be null
        # (nulls-tier find).
        F.concat("l_returnflag", F.lit("/"), "l_linestatus").alias(
            "flag_status"
        ),
        (F.col("l_quantity") >= 25).alias("bulk"),
    )


@query(
    "filter_predicates",
    """
    SELECT
      o_orderkey,
      o_orderstatus,
      o_orderpriority,
      CAST(o_totalprice AS DOUBLE) AS o_totalprice,
      CASE
        WHEN o_totalprice >= 200000 THEN 'high'
        WHEN o_totalprice >= 100000 THEN 'mid'
        ELSE 'low'
      END AS price_band
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_totalprice BETWEEN 50000 AND 400000
      AND NOT (o_orderstatus = 'P')
      AND o_orderpriority LIKE '%-%'
      AND o_custkey IS NOT NULL
    """,
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate suite: AND/OR/NOT, IN, BETWEEN, LIKE, IS NULL, CASE WHEN
    (Flink filter / SQL WHERE). All predicates reach the parquet scan as
    PushedFilters — verified in tests/test_plans.py."""
    wh = Warehouse(spark, sf_dir)
    o = wh.orders
    return o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_totalprice").between(50000, 400000)
        & ~(F.col("o_orderstatus") == "P")
        & F.col("o_orderpriority").like("%-%")
        & F.col("o_custkey").isNotNull()
    ).select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        F.when(F.col("o_totalprice") >= 200000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
    )


@query(
    "flatmap_explode",
    """
    SELECT d.doc_id, w.word
    FROM documents d, UNNEST(STR_SPLIT(d.text, ' ')) AS w(word)
    WHERE LENGTH(w.word) > 0
    """,
)
def flatmap_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row → N rows (Flink flatMap, SQL UNNEST/LATERAL): tokenize each
    document. Generate runs inside codegen; no shuffle."""
    wh = Warehouse(spark, sf_dir)
    return (
        wh.documents.select(
            "doc_id", F.explode(F.split("text", " ")).alias("word")
        )
        .filter(F.length("word") > 0)
    )


@query(
    "flatmap_explode_outer",
    """
    SELECT doc_id, w.word
    FROM (
      SELECT doc_id,
             CASE WHEN len(fw) = 0 THEN [''] ELSE fw END AS fw2
      FROM (
        -- COALESCE to []: a NULL text yields a NULL list, and DuckDB
        -- UNNEST(NULL) emits ZERO rows while Spark explode_outer(NULL)
        -- emits one null row (coalesced to '') — the empty-list branch
        -- must cover NULL too for the sides to agree.
        SELECT doc_id,
               COALESCE(list_filter(str_split(text, ' '),
                                    x -> length(x) > 7), []) AS fw
        FROM documents
      )
    ), UNNEST(fw2) AS w(word)
    """,
)
def flatmap_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OUTER unnest (Flink LEFT JOIN UNNEST / Spark explode_outer): every
    document keeps a row even when its long-token list (> 7 chars; 106
    of 500 sf0.01 docs have none, so both outer paths are exercised) is
    empty — the variant plain explode silently drops, which matters
    whenever the exploded attribute is optional (tags, attachments).
    Nulls from the outer path coalesce to '' on both sides (the pivot/
    outer-join null invariant). The per-token length predicate rides an
    interpreted array lambda — one comparison per element, cheaper than
    the explode-then-reaggregate alternative's extra shuffle."""
    wh = Warehouse(spark, sf_dir)
    long_words = F.filter(
        F.split("text", " "), lambda w: F.length(w) > 7
    )
    return wh.documents.select(
        "doc_id", F.explode_outer(long_words).alias("word")
    ).select("doc_id", F.coalesce("word", F.lit("")).alias("word"))


@query(
    "dedup_exact",
    "SELECT DISTINCT user_id, event_type FROM events",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate elimination (Flink ROW_NUMBER()=1 dedup pattern; the
    bounded analog of streaming dropDuplicatesWithinWatermark). DISTINCT is
    used (not dropDuplicates-on-subset) so the surviving row is
    deterministic; keyed keep-latest dedup is cdc_latest_image."""
    wh = Warehouse(spark, sf_dir)
    return wh.events.select("user_id", "event_type").distinct()


@query(
    "setop_union_all",
    """
    SELECT event_id, user_id, event_type FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, user_id, event_type FROM events WHERE event_type = 'purchase'
    """,
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of same-schema branches (Flink union). unionByName avoids
    silent positional mismatches."""
    wh = Warehouse(spark, sf_dir)
    ev = wh.events.select("event_id", "user_id", "event_type")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    return clicks.unionByName(purchases)


@query(
    "setop_union_distinct",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-semantics UNION: nations having customers or suppliers."""
    wh = Warehouse(spark, sf_dir)
    c = wh.customer.select(F.col("c_nationkey").alias("nationkey"))
    s = wh.supplier.select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


@query(
    "setop_intersect",
    """
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers with both finished and open orders."""
    wh = Warehouse(spark, sf_dir)
    f = wh.orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    o = wh.orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    return f.intersect(o)


@query(
    "setop_except",
    """
    SELECT o_custkey AS custkey FROM orders
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers whose orders are all non-finished (set
    difference with a non-empty result at every scale factor)."""
    wh = Warehouse(spark, sf_dir)
    o = wh.orders.select(F.col("o_custkey").alias("custkey"))
    f = wh.orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return o.subtract(f)


@query(
    "sort_nulls_first",
    """
    SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS status_or_null
    FROM orders
    ORDER BY status_or_null ASC NULLS FIRST, o_orderkey ASC
    LIMIT 1000
    """,
)
def sort_nulls_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit null ordering under a global top-k — a REAL cross-engine
    divergence this key pins: Spark's ASC defaults to NULLS FIRST while
    DuckDB's defaults to NULLS LAST, so any ordered limit over a nullable
    sort key silently selects different ROWS unless the null placement is
    written out on both sides. NULLIF manufactures nulls (5088 'P' rows
    at sf0.01 > the limit), so the selected set exists entirely inside
    the null partition and the hash check fails on any default-ordering
    regression. Global top-k lowers to TakeOrderedAndProject — the
    per-partition-heap form, no partition-less window."""
    wh = Warehouse(spark, sf_dir)
    return (
        wh.orders.select(
            "o_orderkey",
            F.nullif(F.col("o_orderstatus"), F.lit("P")).alias(
                "status_or_null"
            ),
        )
        .orderBy(
            F.col("status_or_null").asc_nulls_first(),
            F.col("o_orderkey").asc(),
        )
        .limit(1000)
    )


@query(
    "sort_multi_key",
    """
    SELECT
      o_orderkey,
      o_orderpriority,
      CAST(o_totalprice AS DOUBLE) AS o_totalprice,
      CAST(ROW_NUMBER() OVER (
        ORDER BY o_orderpriority ASC NULLS LAST, o_totalprice DESC NULLS LAST,
                 o_orderkey ASC
      ) AS BIGINT) AS pos
    FROM orders
    WHERE o_totalprice > 350000
    """,
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global multi-key sort (Flink SQL ORDER BY, bounded). The emitted
    ``pos`` column makes the total order value-checkable by an
    order-insensitive oracle; the tiebreak key (o_orderkey, unique) makes it
    deterministic. ``pos`` comes from the two-phase rank in plans/ordered.py
    (range-partition → per-partition row_number → broadcast partition-count
    offsets) — a bare ``row_number() OVER (ORDER BY ...)`` would move the
    whole relation to ONE task, which plain ``df.orderBy`` never does."""
    from flink_realtime_spark.plans.ordered import ordered_prefix

    wh = Warehouse(spark, sf_dir)
    filtered = wh.orders.filter(F.col("o_totalprice") > 350000).select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )
    # Null placement is EXPLICIT on both sides (NULLS LAST): Spark's bare
    # .asc() is NULLS FIRST while DuckDB's bare ASC is NULLS LAST — the
    # rank diverges silently the moment a sort column is nullable
    # (nulls-tier find). The unique-key tiebreak stays bare: o_orderkey
    # is a PK.
    return ordered_prefix(
        filtered,
        [
            F.col("o_orderpriority").asc_nulls_last(),
            F.col("o_totalprice").desc_nulls_last(),
            F.col("o_orderkey").asc(),
        ],
        pos_col="pos",
    ).orderBy("pos")


@query(
    "sort_topk",
    """
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC
    LIMIT 100
    """,
)
def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k of a global sort (Flink SQL LIMIT). Spark plans
    TakeOrderedAndProject — per-partition heaps, no full sort/shuffle; the
    unique o_orderkey tiebreak keeps the selected set deterministic.
    Null placement is explicit on BOTH sides: DuckDB's DEFAULT placement
    is not even run-to-run stable under its parallel sort (r08 nulls-tier
    find on ads_monthly_yoy), so every sort over a nullable key pins
    NULLS FIRST/LAST."""
    wh = Warehouse(spark, sf_dir)
    return (
        wh.orders.select(
            "o_orderkey", F.col("o_totalprice").cast("double").alias("o_totalprice")
        )
        .orderBy(
            F.col("o_totalprice").desc_nulls_last(), F.col("o_orderkey").asc()
        )
        .limit(100)
    )


@query(
    "setop_intersect_all",
    """
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiset semantics): each custkey appears
    min(count_F, count_O) times — the bag-algebra form Flink SQL exposes
    alongside the set form."""
    wh = Warehouse(spark, sf_dir)
    f = wh.orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    o = wh.orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    return f.intersectAll(o)


@query(
    "setop_except_all",
    """
    SELECT o_custkey AS custkey FROM orders
    EXCEPT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset semantics): each custkey survives
    count(all) − count(F) times."""
    wh = Warehouse(spark, sf_dir)
    o = wh.orders.select(F.col("o_custkey").alias("custkey"))
    f = wh.orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return o.exceptAll(f)
