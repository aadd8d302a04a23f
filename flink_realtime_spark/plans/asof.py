"""As-of (temporal) join as a composed logical plan — SURVEY.md §2.3/§4.

Reference capability: Flink SQL ``FOR SYSTEM_TIME AS OF`` temporal join —
each fact row picks the dimension version valid at the fact's event time
(provenance FLINK; snapshot is README-only, /root/reference/README.md:1-2).

Spark has no dedicated as-of operator, and the naive formulation
(range join + per-fact row_number) explodes to N×M pairs before pruning.
This implementation is the scale-correct composition:

    union(facts tagged 1, versions tagged 0)
      → single hash-partition shuffle on the key
      → window last_value(version cols, ignoreNulls) ordered by (ts, tag)
      → filter back to fact rows

One shuffle, no pair blow-up, linear state per key — the same merge-style
algorithm DuckDB's ASOF JOIN (our oracle) uses, expressed as DataFrame ops
so Catalyst/Tungsten execute it fully JVM-side. At 100 TB both inputs
shuffle once on the join key; skewed keys fall to AQE.

Tie rules: a version with ts equal to the fact ts IS visible (tag orders
versions before facts within equal timestamps), matching DuckDB ASOF
``fact.ts >= version.ts``. Among VERSIONS sharing (key, ts), the one with
the smallest ``tiebreak`` column (default: the first version_col — the id
in every registered caller) wins, in every direction: without this the
window order is not total and each version column's last() could pick a
DIFFERENT same-ts row (mixing one row's id with another row's value,
nondeterministically under recomputation). The join_asof_nearest oracle's
``p.event_id ASC`` rank term encodes the same rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flink_realtime_spark.exprs import epoch_us

_TAG = "__asof_tag"


def asof_join(
    facts: DataFrame,
    versions: DataFrame,
    key: str,
    fact_ts: str,
    version_ts: str,
    version_cols: list[str],
    how: str = "inner",
    direction: str = "backward",
    tiebreak: str | None = None,
) -> DataFrame:
    """For every fact row, attach ``version_cols`` from the nearest version
    row of the same ``key``: with ``direction='backward'`` the latest one
    at-or-before the fact (``version_ts <= fact_ts``), with ``'forward'``
    the earliest one at-or-after it (``version_ts >= fact_ts``) — the
    next-event lookup (e.g. next price change after an order). Forward is
    the same one-shuffle merge with the window scanned in reverse time
    order; ties stay version-visible in both directions.

    ``how='left'`` keeps facts with no visible version (nulls); ``'inner'``
    drops them. ``tiebreak`` (default ``version_cols[0]``) makes the
    version order total: among same-(key, ts) versions the SMALLEST
    tiebreak value wins deterministically.
    """
    tiebreak = tiebreak or version_cols[0]
    fact_cols = facts.columns
    left = facts.withColumn(_TAG, F.lit(1)).withColumn(
        "__ts", F.col(fact_ts).cast("timestamp")
    )
    for c in version_cols:
        if c not in left.columns:
            left = left.withColumn(c, F.lit(None))
    right = versions.select(
        F.col(key),
        F.lit(0).alias(_TAG),
        F.col(version_ts).cast("timestamp").alias("__ts"),
        *[F.col(c) for c in version_cols],
    )
    for c in fact_cols:
        if c not in right.columns:
            right = right.withColumn(c, F.lit(None))

    merged = left.select(sorted(left.columns)).unionByName(
        right.select(sorted(right.columns))
    )

    def win(dirn: str) -> Window:
        ts_order = F.col("__ts").asc() if dirn == "backward" else F.col("__ts").desc()
        # Tiebreak DESC: within a same-(key, ts) run of versions the scan
        # sees larger tiebreaks first, so last() lands on the SMALLEST —
        # one consistent winning row for every version column. Fact rows
        # carry NULL tiebreaks, but the tag term already orders them
        # after the versions they can see.
        return (
            Window.partitionBy(key)
            .orderBy(ts_order, F.col(_TAG).asc(), F.col(tiebreak).desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    def fills(dirn: str, prefix: str):
        w = win(dirn)
        cols = [
            F.last(F.when(F.col(_TAG) == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"{prefix}{c}")
            for c in version_cols
        ]
        cols.append(
            F.last(F.when(F.col(_TAG) == 0, F.col("__ts")), ignorenulls=True)
            .over(w)
            .alias(f"{prefix}__ts")
        )
        return cols

    if direction in ("backward", "forward"):
        filled = merged.select(
            *fact_cols, F.col(_TAG), *fills(direction, "__v_")
        )
        out = filled.filter(F.col(_TAG) == 1).select(
            *fact_cols,
            *[F.col(f"__v_{c}").alias(c) for c in version_cols],
        )
    elif direction == "nearest":
        # Both windows share the partitionBy(key) exchange — Spark reuses
        # the shuffle and only adds the second sort. Per fact, keep the
        # time-closer match; exact-µs tie prefers the earlier (backward)
        # version, a deterministic rule the oracle mirrors.
        filled = merged.select(
            *fact_cols,
            F.col(_TAG),
            F.col("__ts"),
            *fills("backward", "__b_"),
            *fills("forward", "__f_"),
        )
        d_back = epoch_us(F.col("__ts")) - epoch_us(F.col("__b___ts"))
        d_fwd = epoch_us(F.col("__f___ts")) - epoch_us(F.col("__ts"))
        use_back = F.col("__f___ts").isNull() | (
            F.col("__b___ts").isNotNull() & (d_back <= d_fwd)
        )
        out = filled.filter(F.col(_TAG) == 1).select(
            *fact_cols,
            *[
                F.when(use_back, F.col(f"__b_{c}"))
                .otherwise(F.col(f"__f_{c}"))
                .alias(c)
                for c in version_cols
            ],
        )
    else:
        raise ValueError(f"unknown asof direction {direction!r}")
    if how == "inner":
        out = out.filter(F.col(version_cols[0]).isNotNull())
    return out
