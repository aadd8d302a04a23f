"""Time every registered query key at a given sf_dir (default sf0.1).

Complements bench.py (headline set, driver-recorded) with a full sweep for
finding perf outliers among ALL keys. Prints one line per key sorted by
time desc, plus a total.

Usage: python tools/time_all.py [sf_dir] [--repeat N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_realtime_spark import registry
from flink_realtime_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:]]
    repeat = 1
    if "--repeat" in args:
        i = args.index("--repeat")
        repeat = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"

    registry.load_all()
    spark = get_spark("time-all")
    # warm footers + codegen path once
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()
    registry.QUERIES["agg_star_flagship"](spark, "/root/testdata/sf0.001").count()

    times: dict[str, float] = {}
    for key in sorted(registry.QUERIES):
        fn = registry.QUERIES[key]
        best = float("inf")
        try:
            for _ in range(repeat):
                t0 = time.time()
                fn(spark, sf_dir).count()
                best = min(best, time.time() - t0)
        except Exception as ex:  # noqa: BLE001
            print(f"{key:28s} ERROR {type(ex).__name__}: {str(ex)[:120]}")
            continue
        times[key] = best
        print(f"{key:28s} {best:8.3f}s", flush=True)

    print("\n=== slowest ===")
    for k, v in sorted(times.items(), key=lambda kv: -kv[1])[:12]:
        print(f"{k:28s} {v:8.3f}s")
    print(f"\ntotal {sum(times.values()):.1f}s over {len(times)} keys @ {sf_dir}")


if __name__ == "__main__":
    main()
