"""Spark-vs-DuckDB timing per headline key at a given SF — the local probe
for the driver's perf gate (BENCH within 2× of the DuckDB-proxy BASELINE,
SURVEY.md §6). Prints per-key seconds and the ratio; ratios >1 mean DuckDB
is faster on that key at this scale.

Usage: python tools/oracle_race.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bench import HEADLINE
from flink_realtime_spark import registry
from flink_realtime_spark.session import get_spark
from flink_realtime_spark.tables import TABLE_NAMES


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    registry.load_all()
    spark = get_spark("oracle-race")
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    # warm both engines
    registry.QUERIES["agg_star_flagship"](spark, sf_dir).count()
    con.execute("SELECT COUNT(*) FROM lineitem").fetchall()

    tot_s = tot_d = 0.0
    for key in HEADLINE:
        fn, sql = registry.QUERIES.get(key), registry.ORACLES.get(key)
        if fn is None or sql is None:
            continue
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        td = time.perf_counter() - t0
        tot_s, tot_d = tot_s + ts, tot_d + td
        print(f"{key:<22} spark {ts:6.2f}s  duckdb {td:6.2f}s  ratio {ts/td:5.2f}")
    print(f"{'TOTAL':<22} spark {tot_s:6.2f}s  duckdb {tot_d:6.2f}s  "
          f"ratio {tot_s/tot_d:5.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
