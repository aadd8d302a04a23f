"""TPC-H-shaped analytics queries — the ADS-layer workload family.

Reference capability: a Flink real-time warehouse's ADS layer serves exactly
this class of star-schema analytics (revenue rollups, top-N customer boards,
promo-share ratios) continuously; in batch form they are the canonical TPC-H
shapes (provenance ARCH/FLINK; the snapshot is README-only,
/root/reference/README.md:1-2). q3/q6/q13 shapes live in
operators/aggregates.py; this module adds the q1/q5/q7/q10/q14/q19 shapes,
adapted to the driver fixture's columns (no l_shipmode/p_container — see
FIXTURES.md).

Spark-first design: every query is one declarative DataFrame plan; Catalyst
chooses broadcast vs shuffle joins (dimension sides are hinted), pushes the
date/brand filters into the parquet scans, and plans two-phase hash
aggregation. Nothing here is hand-scheduled.

Scale notes (100 TB):
- q1: partial aggregation collapses the 6-billion-row scan to
  (4 groups × partitions) shuffle rows — the shuffle is O(partitions).
- q5/q7: join order matters at scale; the region/nation filters reduce
  customer/supplier to broadcastable sides, and AQE re-plans the
  lineitem⋈orders shuffle join with runtime stats.
- q10: Top-20 by revenue is TakeOrderedAndProject — per-partition heaps,
  never a global sort of the aggregate.
- q14/q19: single-row answers; all reduction happens map-side. q19's
  disjunctive predicate stays in the scan stage (row-group pruning on
  brand/size min-max at real scale once part is denormalized or the join
  is dynamic-filter-pruned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_realtime_spark.exprs import (
    bigint,
    davg,
    davg_sql,
    dsum,
    dsum_sql,
    nonfinite,
    nonfinite_sql,
)
from flink_realtime_spark.registry import query
from flink_realtime_spark.tables import Warehouse

_Q1_NF_CHARGE = (
    f"({nonfinite_sql('l_extendedprice')} OR {nonfinite_sql('l_discount')}"
    f" OR {nonfinite_sql('l_tax')})"
)
_Q1_CHARGE_SSUM = (
    f"SUM(CASE WHEN {_Q1_NF_CHARGE} "
    f"THEN l_extendedprice * (1 - l_discount) * (1 + l_tax) "
    f"ELSE 0.0 END)"
)
_Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {dsum_sql('l_quantity')} AS sum_qty,
  {dsum_sql('l_extendedprice')} AS sum_base_price,
  {dsum_sql('l_extendedprice * (1 - l_discount)', 12, 38)} AS sum_disc_price,
  CASE WHEN isnan({_Q1_CHARGE_SSUM}) OR {_Q1_CHARGE_SSUM} != 0.0
       THEN {_Q1_CHARGE_SSUM}
       ELSE CAST(CAST(SUM(CASE WHEN NOT {_Q1_NF_CHARGE} THEN
             CAST(l_extendedprice AS DECIMAL(24,4))
           * (1 - CAST(l_discount AS DECIMAL(8,4)))
           * (1 + CAST(l_tax AS DECIMAL(8,4))) END) AS STRING) AS DOUBLE)
  END AS sum_charge,
  {davg_sql('l_quantity')} AS avg_qty,
  {davg_sql('l_extendedprice')} AS avg_price,
  {davg_sql('l_discount')} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@query("tpch_q1_pricing", _Q1_ORACLE)
def tpch_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q1 shape (pricing summary): full-fact scan, eight aggregates
    over two low-cardinality flags. The shuffle after partial aggregation
    carries ~6 groups per partition regardless of fact size — the archetype
    of a map-side-combined DWS rollup.

    sum_charge is FACTOR-cast: the 3-factor double product's true decimal
    scale is 6, where the tie distance (5e-7) is SMALLER than the double's
    representation error at 1e5 magnitudes (~1e-6), so a post-product
    decimal cast hits genuine midpoints where Spark's shortest-string
    HALF_UP and DuckDB's binary rounding disagree — one row in ~1e5,
    invisible at sf0.1 (the delta hid inside the final double's ulp by
    luck) and caught by the ×10-facts hash sweep. Each FACTOR (4-decimal
    true scale since the r10 extremes injection; (18,4)/(8,4) also hold
    the 9.9e12 prices and the beyond-[0,1] rates) casts
    deterministically, and the
    decimal multiplication is then exact in both engines at any scale."""
    wh = Warehouse(spark, sf_dir)
    li = wh.lineitem.filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # charge carries dsum's two-channel specials form at the FACTOR level
    # (r10 tier): the exact decimal product needs every factor finite;
    # a NaN/±Inf factor routes the row's IEEE double product into the
    # specials side sum instead (order-independent, see exprs.dsum).
    nf_charge = (
        nonfinite(F.col("l_extendedprice"))
        | nonfinite(F.col("l_discount"))
        | nonfinite(F.col("l_tax"))
    )
    charge_exact = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1).cast("decimal(8,4)") - F.col("l_discount").cast("decimal(8,4)"))
        * (F.lit(1).cast("decimal(8,4)") + F.col("l_tax").cast("decimal(8,4)"))
    )
    charge_dbl = (
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax"))
    )
    charge_ssum = F.sum(F.when(nf_charge, charge_dbl).otherwise(F.lit(0.0)))
    charge = F.when(
        F.isnan(charge_ssum) | (charge_ssum != 0.0), charge_ssum
    ).otherwise(F.sum(F.when(~nf_charge, charge_exact)).cast("string").cast("double"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price, 12, 38).alias("sum_disc_price"),
            charge.alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_Q5_ORACLE = f"""
SELECT
  n.n_name,
  {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 12, 38)} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
"""


@query("tpch_q5_local_supplier", _Q5_ORACLE)
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q5 shape (local supplier volume): six-way join where the
    supplier must share the customer's nation — the composite join condition
    (l_suppkey equi + c_nationkey=s_nationkey residual) lands on one hash
    join. region filter prunes nation→supplier to a broadcastable side."""
    wh = Warehouse(spark, sf_dir)
    o = wh.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    asia_nations = (
        wh.nation.join(
            F.broadcast(wh.region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    s = wh.supplier.join(
        F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        wh.customer.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(wh.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 12, 38).alias(
                "revenue"
            )
        )
    )


_Q7_ORACLE = f"""
SELECT
  n1.n_name AS supp_nation,
  n2.n_name AS cust_nation,
  CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
  {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 12, 38)} AS volume
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY n1.n_name, n2.n_name, CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT)
"""


@query("tpch_q7_volume_shipping", _Q7_ORACLE)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q7 shape (volume shipping): the same dimension table joined
    twice under different roles (supplier's nation vs customer's nation)
    with a disjunctive cross-role predicate, grouped by ship year. Both
    nation sides broadcast; the year extraction is BIGINT-pinned."""
    wh = Warehouse(spark, sf_dir)
    n1 = wh.nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = wh.nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (
        F.col("cust_nation") == "NATION_2"
    ) | (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        wh.supplier.join(
            wh.lineitem, F.col("s_suppkey") == F.col("l_suppkey")
        )
        .join(wh.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(wh.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            bigint(F.year("l_shipdate")).alias("l_year"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 12, 38).alias(
                "volume"
            )
        )
    )


_Q10_ORACLE = f"""
SELECT c_custkey, c_name, revenue, c_acctbal, n_name
FROM (
  SELECT
    c.c_custkey,
    c.c_name,
    {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 12, 38)} AS revenue,
    c.c_acctbal,
    n.n_name
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
    AND o.o_orderdate < TIMESTAMP '1997-01-01'
    AND l.l_returnflag = 'R'
  GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
) t
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("tpch_q10_returns", _Q10_ORACLE)
def tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q10 shape (returned-item reporting): quarter of orders joined
    to returned lineitems, revenue per customer, Top-20 board. The limit
    lowers to TakeOrderedAndProject (per-partition heaps, no global sort);
    revenue is decimal-exact so the Top-20 cut is deterministic, with
    c_custkey as the unique tiebreak."""
    wh = Warehouse(spark, sf_dir)
    o = wh.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return (
        wh.customer.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(
            wh.lineitem.filter(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(wh.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 12, 38).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


_PROMO_CASE = (
    "CASE WHEN p_type LIKE 'PROMO%' "
    "THEN l_extendedprice * (1 - l_discount) ELSE 0 END"
)

_Q14_ORACLE = f"""
SELECT
  100.0 * {dsum_sql(_PROMO_CASE, 12, 38)}
        / {dsum_sql('l_extendedprice * (1 - l_discount)', 12, 38)} AS promo_revenue_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
  AND l.l_shipdate < TIMESTAMP '1997-04-01'
"""


@query("tpch_q14_promo", _Q14_ORACLE)
def tpch_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q14 shape (promotion effect): conditional aggregation — the
    CASE splits one scan's revenue into promo vs total, a single-row ratio.
    Both sums run the exact-decimal path, so the final double division is
    bit-identical across engines and parallelism levels."""
    wh = Warehouse(spark, sf_dir)
    li = wh.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(
        F.col("p_type").like("PROMO%"), disc_price
    ).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(wh.part), F.col("l_partkey") == F.col("p_partkey"))
        .agg((F.lit(100.0) * dsum(promo, 12, 38) / dsum(disc_price, 12, 38)).alias(
            "promo_revenue_pct"
        ))
    )


_Q19_ORACLE = f"""
SELECT
  {dsum_sql('l_extendedprice * (1 - l_discount)', 12, 38)} AS revenue,
  COUNT(*) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity BETWEEN 5 AND 35)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
       AND l.l_quantity BETWEEN 10 AND 50)
"""


@query("tpch_q19_disjunct", _Q19_ORACLE)
def tpch_q19_disjunct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q19 shape (discounted revenue, disjunctive predicates): three
    brand/size/quantity conjunction arms OR-ed across the join. Catalyst
    extracts the common join key and keeps the residual disjunction as a
    post-join filter; the per-table halves (brand∈…, quantity ranges) are
    pushed to the scans."""
    wh = Warehouse(spark, sf_dir)
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(5, 35)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(10, 50)
    )
    return (
        wh.lineitem.join(
            F.broadcast(wh.part), F.col("p_partkey") == F.col("l_partkey")
        )
        .filter(cond)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 12, 38).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def _sql(spark: SparkSession, sf_dir: str, tables: list[str], text: str) -> DataFrame:
    """Register the needed tables as temp views and run the dialect-shared
    SQL text — the same string the DuckDB oracle gets (engine entry point B,
    SURVEY.md §3.2), so Catalyst's own subquery decorrelation is what's
    under test, not a hand-rewritten join."""
    wh = Warehouse(spark, sf_dir)
    for t in tables:
        wh.table(t).createOrReplaceTempView(t)
    return spark.sql(text)


_CASE_N5 = "CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0.0 END"

_Q8_ORACLE = f"""
WITH all_nations AS (
  SELECT
    CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
    l.l_extendedprice * (1 - l.l_discount) AS volume,
    n2.n_name AS supp_nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n1.n_regionkey
  JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'AMERICA'
    AND p.p_type = 'ECONOMY'
    AND o.o_orderdate >= TIMESTAMP '1995-01-01'
    AND o.o_orderdate < TIMESTAMP '1997-01-01'
)
SELECT
  o_year,
  CAST({dsum_sql(_CASE_N5, 12, 38)} / {dsum_sql('volume', 12, 38)} AS DOUBLE) AS mkt_share
FROM all_nations
GROUP BY o_year
"""


@query("tpch_q8_market_share", _Q8_ORACLE)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q8 shape (national market share): a supplier nation's share of
    ECONOMY-part revenue sold into AMERICA, per order year. The nation dim
    appears in two roles (customer's, supplier's); both broadcast. The
    share is a ratio of two exact decimal sums — one deterministic double
    division per group."""
    wh = Warehouse(spark, sf_dir)
    n1 = wh.nation.select("n_nationkey", "n_regionkey")
    n2 = wh.nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    america = F.broadcast(
        n1.join(
            wh.region.filter(F.col("r_name") == "AMERICA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey")
    )
    o = wh.orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    n5_volume = F.when(
        F.col("supp_nation") == "NATION_5", volume
    ).otherwise(F.lit(0.0))
    return (
        wh.lineitem.join(
            F.broadcast(wh.part.filter(F.col("p_type") == "ECONOMY")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(wh.supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(wh.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(america, F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("s_nationkey"))
        .groupBy(bigint(F.year("o_orderdate")).alias("o_year"))
        .agg((dsum(n5_volume, 12, 38) / dsum(volume, 12, 38)).cast("double").alias("mkt_share"))
    )


_Q9_ORACLE = f"""
SELECT
  n.n_name AS nation,
  CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
  {dsum_sql(
      'l.l_extendedprice * (1 - l.l_discount)'
      ' - 0.6 * p.p_retailprice * l.l_quantity',
      12, 38,
  )} AS sum_profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%a%'
GROUP BY n.n_name, CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT)
"""


@query("tpch_q9_profit", _Q9_ORACLE)
def tpch_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q9 shape (product-type profit): per supplier-nation, per year.
    The fixture has no partsupp table (FIXTURES.md), so supply cost is
    modeled as 0.6 * p_retailprice — same join/agg shape, fixture-local
    cost basis. The profit expression is exact at 12 decimals / 17 integer
    digits (4-decimal prices and 9.9e12 quantities since the r10 extremes
    injection), hence the (38,12) per-row cast."""
    wh = Warehouse(spark, sf_dir)
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.6) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        wh.lineitem.join(
            F.broadcast(wh.part.filter(F.col("p_name").like("%a%"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(wh.supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(wh.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(wh.nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            bigint(F.year("o_orderdate")).alias("o_year"),
        )
        .agg(dsum(amount, 12, 38).alias("sum_profit"))
    )


_HIGH_PRIO = "o.o_orderpriority IN ('1-URGENT', '2-HIGH')"

_Q12_ORACLE = f"""
SELECT
  l.l_linestatus,
  CAST(SUM(CASE WHEN {_HIGH_PRIO} THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN {_HIGH_PRIO} THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l.l_linestatus
"""


@query("tpch_q12_late_lines", _Q12_ORACLE)
def tpch_q12_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q12 shape (priority class of late shipments): the fixture has
    no l_shipmode/commitdate/receiptdate, so "late" is ship > order + 60
    days and the grouping key is l_linestatus — identical two-level
    conditional-count shape. The non-equi lateness predicate rides the
    equi-join as a residual; counts are BIGINT-pinned on both sides."""
    wh = Warehouse(spark, sf_dir)
    li = wh.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        wh.orders.join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
            ),
        )
        .groupBy("l_linestatus")
        .agg(
            bigint(F.sum(F.when(high, 1).otherwise(0))).alias("high_line_count"),
            bigint(F.sum(F.when(high, 0).otherwise(1))).alias("low_line_count"),
        )
    )


_Q15_SQL = f"""
WITH revenue AS (
  SELECT
    l_suppkey AS supplier_no,
    {dsum_sql('l_extendedprice * (1 - l_discount)', 12, 38)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@query("tpch_q15_top_supplier", _Q15_SQL)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q15 shape (top supplier): quarterly revenue per supplier,
    keep the max. Dialect-shared SQL: the CTE is referenced twice (join
    side + scalar MAX), and the revenue totals are exact decimals so the
    max-equality filter selects identically in both engines."""
    return _sql(spark, sf_dir, ["lineitem", "supplier"], _Q15_SQL)


_Q16_SQL = """
SELECT
  p.p_brand,
  p.p_size,
  COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29, 33, 37)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
  )
GROUP BY p.p_brand, p.p_size
"""


@query("tpch_q16_supplier_cnt", _Q16_SQL)
def tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q16 shape (supplier count by part attrs): the fixture has no
    partsupp, so the part↔supplier relation comes from lineitem — same
    distinct-count-with-NOT-IN shape. NOT IN over the non-null key list
    plans as a null-aware anti join; the excluded set (negative-balance
    suppliers) broadcasts."""
    return _sql(spark, sf_dir, ["lineitem", "part", "supplier"], _Q16_SQL)


_Q21_SQL = """
SELECT s.s_name, n.n_name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s.s_name, n.n_name
ORDER BY numwait DESC, s.s_name
LIMIT 10
"""


@query("tpch_q21_waiting", _Q21_SQL)
def tpch_q21_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q21 shape (suppliers who kept orders waiting): the sole late
    supplier on a multi-supplier finished order. Top-10 with unique
    s_name tiebreak.

    Optimization (r11, guide §2.4 "remove shuffles outright"): the
    dialect-shared EXISTS/NOT-EXISTS form scans lineitem THREE times and
    shuffles it three ways (l1 join + decorrelated semi + anti, each
    keyed on l_orderkey) — at 100 TB that is 3 full fact scans. The
    subqueries only ask per-order set questions ("another supplier
    exists" / "no other supplier is late"), so they fold into ONE
    per-(order, supplier) aggregate over a single scan: a line
    qualifies iff its order has ≥ 2 distinct suppliers and exactly one
    distinct LATE supplier (that one is then necessarily l1's own —
    l1 itself is late). numwait = Σ late lines of that sole supplier.
    The per-order counts ride a window over the aggregate (same
    orderkey partitioning — no extra shuffle of a second relation), so
    the plan is 1 lineitem scan + 2 fact-sized exchanges instead of 3
    scans + 3 exchanges. Proven equivalent: the shared-SQL oracle text
    is unchanged and the driver hash-checks the rewritten plan against
    it (r11 window)."""
    from pyspark.sql import Window

    wh = Warehouse(spark, sf_dir)
    ord_f = wh.orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 60 DAY"
    )
    lines = (
        wh.lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(ord_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_suppkey", late.alias("late"))
    )
    per_sup = lines.groupBy("l_orderkey", "l_suppkey").agg(
        F.count(F.when(F.col("late"), 1)).alias("n_late")
    )
    w_ord = Window.partitionBy("l_orderkey")
    qualified = (
        per_sup.withColumn("n_supp", F.count(F.lit(1)).over(w_ord))
        .withColumn(
            "n_late_supp",
            F.count(F.when(F.col("n_late") > 0, 1)).over(w_ord),
        )
        .filter(
            (F.col("n_supp") >= 2)
            & (F.col("n_late_supp") == 1)
            & (F.col("n_late") > 0)
        )
        .groupBy("l_suppkey")
        .agg(F.sum("n_late").alias("numwait_sup"))
    )
    return (
        qualified.join(
            wh.supplier.select("s_suppkey", "s_name", "s_nationkey"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            wh.nation.select("n_nationkey", "n_name"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("s_name", "n_name")
        .agg(F.sum("numwait_sup").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


_Q2_SQL = """
SELECT p.p_partkey, p.p_brand, s.s_name, n.n_name, l.l_extendedprice AS min_price
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'EUROPE'
  AND p.p_size <= 10
  AND l.l_extendedprice = (
    SELECT MIN(l2.l_extendedprice)
    FROM lineitem l2
    JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
    JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
    JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
    WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
  )
"""


@query("tpch_q2_min_cost", _Q2_SQL)
def tpch_q2_min_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q2 shape (minimum-cost supplier): for each small part, the
    EUROPE supplier(s) whose lineitem hit the per-part regional minimum
    price — the fixture has no partsupp, so lineitem plays the
    part↔supplier cost relation. The correlated MIN over a four-table
    subquery decorrelates into one keyed aggregate joined back on
    l_partkey; prices compare exactly (parquet doubles, no arithmetic)."""
    return _sql(
        spark,
        sf_dir,
        ["part", "lineitem", "supplier", "nation", "region"],
        _Q2_SQL,
    )


_Q11_SQL = f"""
SELECT
  l_partkey,
  {dsum_sql('l_extendedprice * (1 - l_discount)', 12, 38)} AS part_value
FROM lineitem
GROUP BY l_partkey
HAVING {dsum_sql('l_extendedprice * (1 - l_discount)', 12, 38)} > (
  SELECT {dsum_sql('l_extendedprice * (1 - l_discount)', 12, 38)} * 0.0008
  FROM lineitem
)
"""


@query("tpch_q11_important_parts", _Q11_SQL)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q11 shape (important stock): parts whose revenue exceeds a
    fixed fraction of GLOBAL revenue — a HAVING over an uncorrelated scalar
    subquery (one-row broadcast against the grouped aggregate). Both sides
    of the comparison are exact decimal sums cast to double before the
    fraction multiply, so the cut is engine-invariant.

    Optimization (r11, guide §2.4): the shared SQL form scans lineitem
    TWICE (per-part aggregate + global-sum subquery). The global sum
    folds EXACTLY over the per-part aggregate instead: the decimal
    channel re-aggregates exactly (decimal addition is associative) and
    the specials channel sums only literal 0.0s and non-finite values
    (order-insensitive IEEE propagation, the dsum contract) — so ONE
    fact scan feeds both sides and the threshold rides a 1-row
    broadcast. The per-row double→decimal cast is Spark's native cast
    (repr-quantize, the same value the oracle's string route pins);
    equivalence driver-hash-checked incl. the extremes tier."""
    wh = Warehouse(spark, sf_dir)
    expr = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    nf = nonfinite(expr)
    per_part = wh.lineitem.groupBy("l_partkey").agg(
        F.sum(F.when(nf, expr).otherwise(F.lit(0.0))).alias("__ss"),
        F.sum(F.when(~nf, expr).cast("decimal(38,12)")).alias("__dec"),
    )

    def _val(ss: F.Column, dec: F.Column) -> F.Column:
        return F.when(F.isnan(ss) | (ss != 0.0), ss).otherwise(
            dec.cast("string").cast("double")
        )

    tot = per_part.agg(
        F.sum("__ss").alias("__gss"), F.sum("__dec").alias("__gdec")
    ).select(
        (_val(F.col("__gss"), F.col("__gdec")) * F.lit(0.0008)).alias(
            "__thr"
        )
    )
    return (
        per_part.crossJoin(F.broadcast(tot))
        .withColumn("part_value", _val(F.col("__ss"), F.col("__dec")))
        .filter(F.col("part_value") > F.col("__thr"))
        .select("l_partkey", "part_value")
    )


_Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""


@query("tpch_q4_priority_check", _Q4_ORACLE)
def tpch_q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q4 shape (order priority checking), fixture-adapted: the
    original's l_commitdate < l_receiptdate late-delivery predicate becomes
    l_shipdate > o_orderdate + 60 days (the fixture carries no
    commit/receipt dates — FIXTURES.md). Quarter-filtered orders LEFT SEMI
    join their late lines (hash join on l_orderkey with the date predicate
    as residual — never a per-order re-scan), then a two-phase count by
    priority."""
    wh = Warehouse(spark, sf_dir)
    o = wh.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = wh.lineitem.select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


_Q17_ORACLE = f"""
SELECT CAST({dsum_sql('l.l_extendedprice')} / 7.0 AS DOUBLE) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND l.l_quantity < (
    SELECT 0.2 * {davg_sql('l2.l_quantity')}
    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
  )
"""


@query("tpch_q17_small_qty", _Q17_ORACLE)
def tpch_q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q17 shape (small-quantity-order revenue): revenue/7 from
    orders of one brand whose quantity sits below 20% of that part's mean
    quantity. The Spark side decorrelates EXPLICITLY — per-part exact mean
    (decimal path) aggregated once, broadcast back — while the oracle keeps
    the correlated scalar subquery, so both the value AND Catalyst-free
    semantics are pinned. At 100 TB the per-part aggregate is tiny
    (|parts|) and broadcasts; the brand filter reaches the part scan."""
    wh = Warehouse(spark, sf_dir)
    li = wh.lineitem
    brand_parts = wh.part.filter(F.col("p_brand") == "Brand#1").select(
        "p_partkey"
    )
    per_part = li.groupBy("l_partkey").agg(
        davg(F.col("l_quantity")).alias("avg_qty")
    )
    rows = (
        li.join(F.broadcast(brand_parts), li["l_partkey"] == F.col("p_partkey"))
        .join(F.broadcast(per_part.withColumnRenamed("l_partkey", "ap_key")),
              F.col("l_partkey") == F.col("ap_key"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
    )
    return rows.agg(
        (dsum(F.col("l_extendedprice")) / 7.0).cast("double").alias("avg_yearly")
    )


_Q18_ORACLE = f"""
WITH big AS (
  SELECT l_orderkey, {dsum_sql('l_quantity')} AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING {dsum_sql('l_quantity')} > 150.0
)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
       o.o_totalprice, b.sum_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_totalprice DESC NULLS LAST, o.o_orderkey
LIMIT 100
"""


@query("tpch_q18_large_volume", _Q18_ORACLE)
def tpch_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q18 shape (large-volume customers): orders whose line
    quantities sum past a threshold, top-100 by order value. The quantity
    rollup HAVING-filters BEFORE joining orders/customer (the aggregate is
    the small side after filtering — broadcast), and the top-100 is
    TakeOrderedAndProject with the unique o_orderkey tiebreak, never a
    global sort."""
    wh = Warehouse(spark, sf_dir)
    big = (
        wh.lineitem.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 150.0)
    )
    return (
        F.broadcast(big)
        .join(wh.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(wh.customer, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
        .orderBy(
            F.col("o_totalprice").desc_nulls_last(), F.col("o_orderkey")
        )
        .limit(100)
    )


_Q20_SQL = f"""
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_type LIKE '%PROMO%'
    AND l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l.l_suppkey
  HAVING {dsum_sql('l.l_quantity')} > 500.0
)
"""


@query("tpch_q20_promo_suppliers", _Q20_SQL)
def tpch_q20_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q20 shape (potential part promotion), fixture-adapted: the
    original's partsupp availability chain becomes shipped-quantity — the
    fixture has no partsupp table (FIXTURES.md) — keeping the
    IN-(grouped-HAVING-subquery) nesting that must decorrelate to an
    aggregate + semi join. Dialect-shared SQL: Catalyst's own
    decorrelation is under test (engine entry point B)."""
    return _sql(spark, sf_dir, ["supplier", "lineitem", "part"], _Q20_SQL)


_Q22_SQL = f"""
SELECT
  CAST(c.c_nationkey AS BIGINT) AS cntrycode,
  COUNT(*) AS numcust,
  {dsum_sql('c.c_acctbal')} AS totacctbal
FROM customer c
WHERE c.c_acctbal > (
    SELECT {davg_sql('c2.c_acctbal')} FROM customer c2
    WHERE c2.c_acctbal > 0.0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '1999-01-01'
  )
GROUP BY c.c_nationkey
"""


@query("tpch_q22_dormant_rich", _Q22_SQL)
def tpch_q22_dormant_rich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q22 shape (global sales opportunity), fixture-adapted:
    cntrycode comes from c_nationkey (no c_phone in the fixture) and
    "never ordered" becomes "no order since 1999" (every fixture customer
    has SOME order, so the literal form returns empty — dormancy keeps the
    shape selective). Scalar-average subquery (one-row broadcast) + NOT
    EXISTS anti join on the filtered orders, grouped per country — the
    exact decorrelation pair q22 exists to exercise. Dialect-shared SQL."""
    return _sql(spark, sf_dir, ["customer", "orders"], _Q22_SQL)
