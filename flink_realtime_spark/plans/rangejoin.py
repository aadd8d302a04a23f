"""Binned range join — interval-containment predicates as hash equi-joins.

A pure range predicate (value BETWEEN lo AND hi, no equi component) gives
Catalyst nothing to hash on: the physical plan is a broadcast nested loop
over (rows × bands). Quantizing the value domain into bins no wider than
the narrowest band restores an equi key: each band explodes to the few
bins it overlaps, each row computes its bin, and the range predicate
remains only as a residual filter on hash-join matches. Cost falls from
O(rows × bands) to O(rows × bins-per-band) — at 100 TB, the difference
between a nested loop over the fact table and one ordinary broadcast/hash
join. Used by operators/joins.join_range_binned; property-tested against
the naive join in tests/test_plan_props.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def binned_range_join(
    values: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
) -> DataFrame:
    """Inner-join ``values`` rows to every ``bands`` row whose [lo, hi)
    interval contains the value, via a bin equi-join. ``bin_width`` must
    be <= the narrowest band width for candidate completeness (each band
    then overlaps <= ceil(width/bin_width)+1 bins). Inner only: the
    residual range filter runs after the join, which would discard an
    outer join's null-extended rows."""
    band_bins = bands.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bin_width),
                # hi is exclusive, so floor(hi/w) may claim one bin past the
                # band's true extent — harmless (the residual range filter
                # drops it). An epsilon-subtraction here would be WRONG: for
                # hi within eps above a bin boundary it under-claims the last
                # bin and silently drops matches. Completeness must never
                # depend on float epsilons.
                F.floor(F.col(hi_col) / bin_width),
            )
        ),
    )
    binned_vals = values.withColumn(
        "__bin", F.floor(F.col(value_col) / bin_width)
    )
    return (
        binned_vals.join(F.broadcast(band_bins), "__bin")
        .filter(
            (F.col(value_col) >= F.col(lo_col))
            & (F.col(value_col) < F.col(hi_col))
        )
        .drop("__bin")
    )
