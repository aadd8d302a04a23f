"""Two-phase global ordered ranks / prefix aggregates — no single-partition
windows, ever.

``row_number()/sum()/max() OVER (ORDER BY ...)`` with no PARTITION BY makes
Spark move the ENTIRE relation to one task (`WindowExec: No Partition
Defined` — the fatal scale anti-pattern; note that plain ``df.orderBy``
range-partitions, but a partition-less *window function* does not). The
equivalent distributed formulation is two-phase:

1. **Range-partition** the relation on the order keys
   (``repartitionByRange`` — Spark samples split points, so partition ids
   are monotone with the global order and data is spread evenly).
2. **Local pass**: within each range partition, compute the running
   aggregate / row number under ``Window.partitionBy(__pid)`` — a
   partition-SPEC'd window, parallel across partitions.
3. **Summary prefix**: aggregate one row per partition (map-side combined,
   so the shuffle moves only #partitions rows), compute the *exclusive*
   prefix totals over that metadata-sized summary under
   ``Window.partitionBy(__pid % 1)`` (explicitly single-bucket over ~100s
   of rows — #partitions, not #rows — which stays tiny at any data scale;
   the ``% 1`` keeps the partition spec non-foldable — a plain ``lit(0)``
   is constant-folded OUT of the spec by Catalyst, leaving an empty
   partitionSpec that triggers the ``WindowExec: No Partition Defined``
   warning even though the input is metadata-sized), and broadcast-join
   the offsets back on ``__pid``.
4. Global value = other-partitions prefix ⊕ local running value.

Cost at 100 TB: the range exchange (needed by ANY global order) plus one
hash exchange of the full relation for the local window, plus a
metadata-sized summary — versus the single-task formulation which simply
does not finish. Associative ops only (sum, max, count/row_number).

Branch consistency (the round-5 bug): the annotated and summary branches
both consume the range-partitioned relation, and ``spark_partition_id()``
is only meaningful if BOTH branches read the *same physical
materialization*. AQE's exchange reuse usually guarantees that (the AQE
final plan for sort_multi_key shows ReusedExchange) — but reuse is an
optimization, not a contract: under a driver-built session at sf0.1 the
two branches were observed to materialize the range exchange
INDEPENDENTLY, re-sampling different split points and coalescing to
different partition counts, which silently dropped every row whose
annotated-side pid had no offsets-side row (~half the relation, varying
run to run) and mis-assigned prefix offsets besides. The fix is to pin
the materialization, not hope for reuse: ``base`` is
``localCheckpoint(eager=False)``-ed, so the first action materializes the
range-partitioned rows (pid frozen as DATA) exactly once and both
branches read that snapshot — the same multi-consumer checkpoint pattern
as the minhash postings relation. Caught by ``tools/drive_driver.py
--sf /root/testdata/sf0.1`` (strict hash at 10× the driver's usual
check scale); sf0.01's smaller shuffle never tripped the divergence. At
100 TB swap localCheckpoint for a reliable checkpoint (SCALE.md
deployment delta #1) — the invariant is the single materialization, not
the storage tier.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__pid"


@dataclass
class Prefix:
    """A running aggregate to attach: ``out`` = name of the produced
    inclusive-prefix column, ``col`` = measure expression, ``agg`` =
    'sum' | 'max'."""

    out: str
    col: Column
    agg: str  # 'sum' | 'max'


def ordered_prefix(
    df: DataFrame,
    order_cols: list[Column],
    prefixes: list[Prefix] | None = None,
    pos_col: str | None = None,
) -> DataFrame:
    """Attach global-ordered prefix aggregates and/or a global row number
    without any partition-less window. ``order_cols`` MUST form a total
    order (unique tiebreak — the repo invariant) so every phase is
    deterministic under recomputation.

    Returns ``df`` plus ``pos_col`` (1-based global rank, if requested) and
    one inclusive running column per ``Prefix``. Internal ``__pid``/helper
    columns are dropped.
    """
    prefixes = prefixes or []

    # localCheckpoint pins ONE materialization of the range exchange so the
    # pid column is identical in every consumer — see module docstring
    # (without it the two branches can re-sample different range
    # boundaries and the __pid join silently drops rows).
    base = (
        df.repartitionByRange(*order_cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=False)
    )

    # Phase 2: per-partition running values (partition-spec'd window).
    w_loc = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    annotated = base
    for i, p in enumerate(prefixes):
        fn = F.sum if p.agg == "sum" else F.max
        annotated = annotated.withColumn(f"__loc_{i}", fn(p.col).over(w_loc))
    if pos_col is not None:
        annotated = annotated.withColumn(
            "__loc_pos",
            F.row_number().over(Window.partitionBy(_PID).orderBy(*order_cols)),
        )

    # Phase 3: one row per partition (map-side combine → tiny shuffle),
    # exclusive prefix over the summary, broadcast back.
    aggs = [F.count(F.lit(1)).alias("__cnt")]
    for i, p in enumerate(prefixes):
        fn = F.sum if p.agg == "sum" else F.max
        aggs.append(fn(p.col).alias(f"__tot_{i}"))
    summary = base.groupBy(_PID).agg(*aggs)
    # Single-bucket window over the #partitions-row summary. `__pid % 1`
    # (== 0 for every row) rather than `lit(0)`: Catalyst constant-folds a
    # literal out of the partition spec, leaving an EMPTY partitionSpec
    # that logs `WindowExec: No Partition Defined` on every execution; the
    # non-foldable derivation keeps the spec populated (hash exchange of
    # the metadata-sized summary to one bucket — the intended physique)
    # and the log clean for the fleet-wide warning grep.
    w_sum = (
        Window.partitionBy(F.col(_PID) % F.lit(1))
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off_cols = [F.col(_PID)]
    if pos_col is not None:
        off_cols.append(
            F.coalesce(F.sum("__cnt").over(w_sum), F.lit(0)).alias("__off_pos")
        )
    for i, p in enumerate(prefixes):
        fn = F.sum if p.agg == "sum" else F.max
        off_cols.append(fn(f"__tot_{i}").over(w_sum).alias(f"__off_{i}"))
    offsets = summary.select(*off_cols)

    out = annotated.join(F.broadcast(offsets), _PID)

    # Phase 4: combine. greatest() ignores nulls (first partition has no
    # predecessor); sums coalesce a typed zero.
    for i, p in enumerate(prefixes):
        loc, off = F.col(f"__loc_{i}"), F.col(f"__off_{i}")
        if p.agg == "sum":
            combined = loc + F.coalesce(off, F.lit(0).cast(_dtype(out, f"__loc_{i}")))
        else:
            combined = F.greatest(loc, off)
        out = out.withColumn(p.out, combined)
    if pos_col is not None:
        out = out.withColumn(
            pos_col, (F.col("__loc_pos") + F.col("__off_pos")).cast("long")
        )

    drop = [_PID] + [f"__loc_{i}" for i in range(len(prefixes))] + [
        f"__off_{i}" for i in range(len(prefixes))
    ]
    if pos_col is not None:
        drop += ["__loc_pos", "__off_pos"]
    return out.drop(*drop)


def _dtype(df: DataFrame, col: str):
    return df.schema[col].dataType


def single_bucket(c: Column) -> Column:
    """Non-foldable constant-zero partition key for a window whose input is
    provably metadata-sized (calendar-bounded aggregate, limit-derived
    re-rank). ``Window.partitionBy(lit(0))`` is constant-folded to an EMPTY
    partition spec — which both logs ``WindowExec: No Partition Defined``
    on every execution and reads as the single-task anti-pattern in plan
    audits — whereas ``xxhash64(c) % 1`` (zero for every row; xxhash64 is
    total, including nulls) survives optimization. The physical shape is
    identical — the tiny input hash-exchanges to one bucket — but the spec
    is populated, so the intent is declared in the plan itself."""
    return F.xxhash64(c) % F.lit(1)
