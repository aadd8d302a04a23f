"""Suggest the next driver-window rotation (CLAUDE.md "Driver sampling").

The driver's per-round CORRECTNESS check covers exactly the FIRST 50 keys
of registry.ordered_queries(). This tool reads every CORRECTNESS_r*.json
at the repo root and prints:

1. keys whose LATEST driver record is a failure (re-sample first),
2. a suggested 50-key window of never-sampled keys (current registry
   order preserved — it already runs cheap families first),
3. the leftover never-sampled keys (next round's pool),
4. the already-green keys.

Paste the window into registry._PRIORITY_HEAD, update the pinned record
tuple in tests/test_oracle_parity.py::test_driver_window_rotation, and
re-run that test.

Usage: python tools/plan_rotation.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_realtime_spark import registry


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    records = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    sampled: set[str] = set()
    last_status: dict[str, bool] = {}
    for path in records:
        with open(path) as f:
            data = json.load(f)
        for key, rec in data.items():
            sampled.add(key)
            ok = bool(
                rec.get("hash_match")
                or (rec.get("rows_match") and rec.get("err") is None
                    and "hash_match" not in rec)
            )
            last_status[key] = ok
    ordered = list(registry.ordered_queries())
    failed = [k for k in ordered if k in last_status and not last_status[k]]
    never = [k for k in ordered if k not in sampled]
    green = [k for k in ordered if last_status.get(k)]
    window = failed + [k for k in never if k not in failed]
    print(f"records: {[os.path.basename(p) for p in records]}")
    print(f"sampled {len(sampled)} / {len(ordered)} keys; "
          f"{len(failed)} latest-failed; {len(never)} never sampled\n")
    print("# suggested next _PRIORITY_HEAD window (first 50):")
    for k in window[:50]:
        tag = "RE-SAMPLE(failed)" if k in failed else "never-sampled"
        print(f"    {k!r},  # {tag}")
    rest = window[50:]
    print(f"\n# remaining pool for the round after ({len(rest)} keys):")
    for k in rest:
        print(f"    {k!r},")
    print(f"\n# already driver-green: {len(green)} keys")


if __name__ == "__main__":
    main()
