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

from flink_realtime_spark.exprs import bigint, davg, davg_sql, dsum, dsum_sql
from flink_realtime_spark.registry import query
from flink_realtime_spark.tables import Warehouse

_Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {dsum_sql('l_quantity')} AS sum_qty,
  {dsum_sql('l_extendedprice')} AS sum_base_price,
  {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
  {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', scale=6)} AS sum_charge,
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
    of a map-side-combined DWS rollup."""
    wh = Warehouse(spark, sf_dir)
    li = wh.lineitem.filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(disc_price * (1 + F.col("l_tax")), scale=6).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_Q5_ORACLE = f"""
SELECT
  n.n_name,
  {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
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
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


_Q7_ORACLE = f"""
SELECT
  n1.n_name AS supp_nation,
  n2.n_name AS cust_nation,
  CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
  {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS volume
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
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
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
    {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
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
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
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
  100.0 * {dsum_sql(_PROMO_CASE)}
        / {dsum_sql('l_extendedprice * (1 - l_discount)')} AS promo_revenue_pct
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
        .agg((F.lit(100.0) * dsum(promo) / dsum(disc_price)).alias(
            "promo_revenue_pct"
        ))
    )


_Q19_ORACLE = f"""
SELECT
  {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
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
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
