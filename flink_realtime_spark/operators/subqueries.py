"""Subquery operators — correlated/uncorrelated scalar, EXISTS, IN.

Reference capability: Flink SQL supports scalar subqueries and IN/EXISTS
predicates and rewrites them to joins via Calcite decorrelation (provenance
FLINK; the snapshot itself is README-only, /root/reference/README.md:1-2).
Spark-first design: these queries enter through the SQL-string frontend
(engine entry point B, SURVEY.md §3.2) so Catalyst's decorrelation rules do
the rewriting — RewriteCorrelatedScalarSubquery turns the correlated scalar
into an aggregate + left outer join, RewritePredicateSubquery turns
EXISTS/IN into left-semi and NOT EXISTS into left-anti joins. No manual
join rewrite in the engine: declaring the subquery IS the implementation.

Each query's SQL text is dialect-shared and handed VERBATIM to both Spark
and the DuckDB oracle — one string, two engines, three including the
DataFrame-built equivalents elsewhere in the registry.

Scale notes (100 TB):
- Decorrelation means no nested-loop re-execution per outer row, ever: the
  correlated aggregate becomes one keyed aggregation + equi-join, both
  shuffle-partitioned and AQE-planned like any other join.
- EXISTS/IN → semi/anti joins keep only the key column of the subquery side
  in the shuffle, and broadcast when the filtered subquery side is small.
- A correlated scalar subquery whose group (here l_partkey) is skewed falls
  to AQE skew-join splitting like a regular join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (parity with sibling modules)

from flink_realtime_spark.exprs import davg_sql, dsum_sql
from flink_realtime_spark.registry import query
from flink_realtime_spark.tables import Warehouse

# Tables each query needs registered as temp views (names match the DuckDB
# side, so the one SQL text parses identically in both engines).


def _sql(spark: SparkSession, sf_dir: str, tables: list[str], text: str) -> DataFrame:
    wh = Warehouse(spark, sf_dir)
    for t in tables:
        wh.table(t).createOrReplaceTempView(t)
    return spark.sql(text)


# TPC-H q17 shape: correlated SCALAR subquery — per-part average quantity
# threshold. AVG(l_quantity) is exact in double (integer-valued 1..50, sums
# far below 2^53), so the comparison is deterministic across engines; the
# money sum goes through the DECIMAL(18,4) path.
_SCALAR_CORR_SQL = f"""
SELECT
  {dsum_sql('l.l_extendedprice')} / 7.0 AS avg_yearly,
  COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand IN ('Brand#1', 'Brand#2')
  AND l.l_quantity < (
    SELECT 0.5 * AVG(l2.l_quantity)
    FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey
  )
"""


@query("subq_scalar_corr", _SCALAR_CORR_SQL)
def subq_scalar_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H q17 shape): lineitems below half
    their part's average quantity. Catalyst decorrelates to one aggregate
    over lineitem + equi-join on l_partkey — the plan never re-executes the
    subquery per row."""
    return _sql(spark, sf_dir, ["lineitem", "part"], _SCALAR_CORR_SQL)


# TPC-H q4 shape: correlated EXISTS with an equi component plus a non-equi
# time-offset residual. Midnight-timestamp dates make the interval
# arithmetic exact in both engines.
_EXISTS_SQL = """
SELECT
  o_orderpriority,
  COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
"""


@query("subq_exists_delayed", _EXISTS_SQL)
def subq_exists_delayed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (TPC-H q4 shape): orders in a half-year window with
    at least one lineitem shipped >90 days after the order date. Rewritten
    by RewritePredicateSubquery into a left-semi join on l_orderkey with the
    time predicate as a join residual — one pass over each table."""
    return _sql(spark, sf_dir, ["orders", "lineitem"], _EXISTS_SQL)


# TPC-H q22 shape: uncorrelated scalar subquery (global threshold) AND a
# correlated NOT EXISTS (anti join). The threshold average uses the exact
# decimal-sum/count division so both engines compute the identical double.
_NOT_EXISTS_SQL = f"""
SELECT
  c_nationkey,
  COUNT(*) AS numcust,
  {dsum_sql('c_acctbal')} AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT {davg_sql('c_acctbal')}
    FROM customer
    WHERE c_acctbal > 0.0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderpriority = '1-URGENT'
  )
GROUP BY c_nationkey
"""


@query("subq_not_exists_dormant", _NOT_EXISTS_SQL)
def subq_not_exists_dormant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar threshold + correlated NOT EXISTS (TPC-H q22
    shape): above-average-balance customers with no urgent orders. The
    scalar becomes a one-row broadcast; NOT EXISTS becomes a left-anti join
    on o_custkey carrying only the filtered key column through the
    shuffle."""
    return _sql(spark, sf_dir, ["customer", "orders"], _NOT_EXISTS_SQL)


# TPC-H q18 shape: IN over an aggregated-HAVING subquery. The HAVING
# comparison is exact (decimal sum of integer-valued quantities) with
# the dsum specials branch: a NaN/±Inf quantity makes the group sum
# non-finite, and BOTH engines order NaN/+Inf above 150 (r10 tier —
# the raw decimal cast threw on specials in both engines).
_IN_HAVING_SQL = f"""
SELECT
  o.o_orderkey,
  o.o_orderpriority,
  {dsum_sql('l.l_quantity')} AS total_qty
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey
    HAVING {dsum_sql('l_quantity')} > 150
  )
GROUP BY o.o_orderkey, o.o_orderpriority
"""


@query("subq_in_having", _IN_HAVING_SQL)
def subq_in_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN over an aggregating subquery (TPC-H q18 shape): large-quantity
    orders. The IN list is itself a grouped aggregate; Catalyst plans
    aggregate → left-semi join, and the second aggregation reuses the same
    l_orderkey hash partitioning — no extra shuffle between the semi join
    and the final group-by."""
    return _sql(spark, sf_dir, ["orders", "lineitem"], _IN_HAVING_SQL)


# LATERAL correlated derived table (Flink SQL LATERAL / Spark 4
# lateralJoin): per customer, the top-2 orders by (price, key). Catalyst
# plans the correlation as a window-ranked join rather than re-executing
# the inner query per outer row; DuckDB runs the identical text.
_LATERAL_SQL = """
SELECT
  c.c_custkey,
  t.o_orderkey,
  t.o_totalprice
FROM customer c,
LATERAL (
  SELECT o.o_orderkey, o.o_totalprice
  FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o.o_totalprice DESC NULLS LAST, o.o_orderkey
  LIMIT 2
) t
"""


@query("subq_lateral_topn", _LATERAL_SQL)
def subq_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL derived table with ORDER BY ... LIMIT — the
    SQL-standard per-row top-N shape (Flink SQL LATERAL). One shared text
    for both engines; the unique o_orderkey tiebreak keeps the per-group
    limit deterministic."""
    return _sql(spark, sf_dir, ["customer", "orders"], _LATERAL_SQL)
