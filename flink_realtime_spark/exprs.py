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


# Portable text normalizer (uni-tier find, r09): whitespace collapse +
# lowercase, with the two cross-engine CASE-MAPPING mines canonicalized.
# Java (Spark) lowercases with FULL Unicode casing — İ (U+0130) becomes
# 'i' + combining-dot (1:2 expansion) and word-final Σ becomes ς
# (context-sensitive SpecialCasing) — while DuckDB's utf8proc applies
# SIMPLE 1:1 mappings (İ → i, Σ → σ always). The engine therefore defines
# its normalizer as the portable simple fold: pre-map İ → i BEFORE lower
# (so Java's special case never fires) and canonicalize ς → σ AFTER
# (both engines keep an input ς as ς through lower, and the substitution
# also erases Java's context-generated finals). These are the only two
# divergent LOWERCASE mappings under Locale.ROOT (the remaining
# SpecialCasing rules are locale-gated or upper-only); ASCII text is
# untouched, so every pre-r09 tier hash is unchanged.
NORM_TEXT_SPARK = (
    "replace(lower(trim(regexp_replace(replace(text, 'İ', 'i'), "
    "'\\\\s+', ' '))), 'ς', 'σ')"
)
NORM_TEXT_DUCK = (
    "replace(lower(trim(regexp_replace(replace(text, 'İ', 'i'), "
    "'\\s+', ' ', 'g'))), 'ς', 'σ')"
)


def norm_text(col: str = "text") -> Column:
    """Column form of NORM_TEXT_SPARK (same fold, same order)."""
    c = F.replace(F.col(col), F.lit("İ"), F.lit("i"))
    c = F.lower(F.trim(F.regexp_replace(c, "\\s+", " ")))
    return F.replace(c, F.lit("ς"), F.lit("σ"))


def bigint(col: Column) -> Column:
    """Spark's year()/month()/... return int32; DuckDB's return int64.
    Normalize every computed integer column to BIGINT on both sides."""
    return col.cast("long")
