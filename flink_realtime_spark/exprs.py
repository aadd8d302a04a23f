"""Shared expression builders for cross-engine determinism.

Double SUM/AVG results depend on accumulation order, which differs between
Spark (partial/final over shuffle partitions) and DuckDB. We make money-style
aggregates exact instead of hoping rounding hides the drift: cast each row to
DECIMAL(18,4) (a double that is not an exact decimal tie rounds identically
in both engines), SUM in exact decimal arithmetic, cast the result back to
DOUBLE. The pair (dsum, dsum_sql) / (davg, davg_sql) keep the Spark plan and
the oracle SQL in lock-step.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,4)"


def dsum(col: Column, scale: int = 4) -> Column:
    """Order-independent SUM of a double expression (exact decimal path).

    ``scale`` must be >= the true decimal scale of the expression: a double
    whose exact value fits in ``scale`` digits rounds identically in both
    engines (fp error ~1e-11 is far inside the tie boundary), but a cast
    BELOW the true scale hits genuine ties where Spark (shortest-string
    HALF_UP) and DuckDB (binary-value) disagree — e.g. a 6-decimal
    price*(1-disc)*(1+tax) product cast at scale 4."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


def davg(col: Column, scale: int = 4) -> Column:
    """Order-independent AVG: exact decimal sum divided by count, one final
    double division (deterministic)."""
    return (
        F.sum(col.cast(f"decimal(18,{scale})")).cast("double") / F.count(col)
    ).cast("double")


def dsum_sql(expr: str, scale: int = 4) -> str:
    # decimal→double goes VIA STRING: DuckDB's direct CAST(DECIMAL AS
    # DOUBLE) computes (double)int128 / (double)10^scale — TWO roundings,
    # observed 1 ulp off the correctly-rounded value once the sum reaches
    # ~16 significant digits (×10-facts hash sweep, round 5). String→double
    # parsing is correctly rounded in both engines, and Spark's
    # BigDecimal→double is already correct, so the string route makes the
    # conversion agree at every magnitude.
    return f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS STRING) AS DOUBLE)"


def davg_sql(expr: str, scale: int = 4) -> str:
    return (
        f"CAST(CAST(CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS STRING) AS DOUBLE)"
        f" / COUNT({expr}) AS DOUBLE)"
    )


def bigint(col: Column) -> Column:
    """Spark's year()/month()/... return int32; DuckDB's return int64.
    Normalize every computed integer column to BIGINT on both sides."""
    return col.cast("long")
