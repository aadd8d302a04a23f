"""Property checks for the sketch-based metric operators (driver runs
rows-only on these; the bound against the exact computation lives here)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_realtime_spark import registry
from flink_realtime_spark.tables import load_table
from tests.conftest import SF_DIR
import pytest

# sketch-accuracy property runs — excluded from the fast gate (pytest.ini)
pytestmark = pytest.mark.slow


registry.load_all()


def test_approx_quantile_within_rank_tolerance(spark):
    """percentile_approx with accuracy A guarantees rank error <= n/A; at
    A=10000 and fixture group sizes the estimate must sit within a tight
    quantile band of the exact sort-based percentile."""
    # The key now emits the verdict columns itself; re-derive the raw
    # estimate here and keep the independent rank-band check, plus assert
    # every emitted p*_ok verdict holds.
    rows = registry.QUERIES["agg_approx_quantile"](spark, SF_DIR).collect()
    for r in rows:
        assert r["p50_ok"] and r["p95_ok"] and r["p99_ok"], r
    from flink_realtime_spark.tables import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    approx = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            *[
                F.percentile_approx(
                    F.col("l_extendedprice").cast("double"), F.lit(q), F.lit(10000)
                ).alias(col)
                for q, col in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99"))
            ]
        )
        .collect()
    }
    for q, col in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
        exact = {
            r["l_returnflag"]: (r["lo"], r["hi"])
            for r in li.groupBy("l_returnflag")
            .agg(
                F.expr(f"percentile(l_extendedprice, {q - 0.005})").alias("lo"),
                F.expr(f"percentile(l_extendedprice, {q + 0.005})").alias("hi"),
            )
            .collect()
        }
        for flag, row in approx.items():
            lo, hi = exact[flag]
            assert lo <= row[col] <= hi, (flag, col, row[col], lo, hi)


def test_freq_items_no_false_negatives(spark):
    """freqItems guarantees every item above the support threshold appears
    in the result (KSP algorithm); verify against exact frequencies."""
    # The key now emits the verdict (n_heavy, n_missed); assert n_missed=0
    # and recheck the raw sketch contents independently.
    for r in registry.QUERIES["agg_freq_items"](spark, SF_DIR).collect():
        assert r["n_missed"] == 0, r
    ev = load_table(spark, SF_DIR, "events")
    out = ev.select("event_type", "user_id").stat.freqItems(
        ["event_type", "user_id"], support=0.05
    ).collect()[0]
    got_types = set(out["event_type_freqItems"])
    got_users = set(out["user_id_freqItems"])
    n = ev.count()
    for col, got in (("event_type", got_types), ("user_id", got_users)):
        exact = {
            r[col]
            for r in ev.groupBy(col).agg(F.count(F.lit(1)).alias("c")).collect()
            if r["c"] > 0.05 * n
        }
        assert exact <= got, (col, exact - got)
