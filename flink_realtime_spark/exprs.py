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

_INF = float("inf")
NAN = float("nan")


def nonfinite(col: Column) -> Column:
    """NaN or ±Inf (NULL input stays NULL — the CASE forms below treat
    that as 'not special', matching SUM's null-skipping)."""
    return F.isnan(col) | (F.abs(col) == F.lit(_INF))


def finite_or_null(col: Column) -> Column:
    """The column with NaN/±Inf nulled out — the per-row guard for
    operators whose contract treats non-finite measurements as missing
    (order statistics, bucket keys, decimal state). SQL mirror:
    ``CASE WHEN NOT {nonfinite_sql(x)} THEN x END``."""
    return F.when(~nonfinite(col), col)


_nonfinite = nonfinite  # internal alias used by dsum/davg below


def dsum(col: Column, scale: int = 4) -> Column:
    """Order-independent SUM of a double expression: exact decimal path
    for finite values, IEEE propagation for specials (specials tier, r10).

    ``scale`` must be >= the true decimal scale of the expression: a double
    whose exact value fits in ``scale`` digits rounds identically in both
    engines (fp error ~1e-11 is far inside the tie boundary), but a cast
    BELOW the true scale hits genuine ties where Spark (shortest-string
    HALF_UP) and DuckDB (binary-value) disagree — e.g. a 6-decimal
    price*(1-disc)*(1+tax) product cast at scale 4.

    SPECIALS (NaN/±Inf) can't enter the decimal cast (ANSI throws, and no
    decimal represents them), and silently skipping them would hide bad
    data in 100 TB of telemetry. IEEE semantics are order-INDEPENDENT
    here: any NaN in the group → NaN; else +Inf and -Inf together → NaN;
    else a lone infinity sign → ±Inf — so a side SUM over only-the-
    specials (finite rows contribute literal 0.0) yields exactly the IEEE
    answer when specials are present and 0.0 when not, and the result
    stays deterministic under any partitioning. dsum_sql mirrors this."""
    nf = _nonfinite(col)
    ssum = F.sum(F.when(nf, col).otherwise(F.lit(0.0)))
    exact = F.sum(F.when(~nf, col).cast(f"decimal(18,{scale})")).cast("double")
    return F.when(F.isnan(ssum) | (ssum != 0.0), ssum).otherwise(exact)


def davg(col: Column, scale: int = 4) -> Column:
    """Order-independent AVG: exact decimal sum divided by count, one final
    double division (deterministic); IEEE propagation when the group holds
    NaN/±Inf (see dsum — ±Inf/count keeps its sign, NaN stays NaN)."""
    nf = _nonfinite(col)
    ssum = F.sum(F.when(nf, col).otherwise(F.lit(0.0)))
    exact = (
        F.sum(F.when(~nf, col).cast(f"decimal(18,{scale})")).cast("double")
        / F.count(col)
    ).cast("double")
    return F.when(
        F.isnan(ssum) | (ssum != 0.0), (ssum / F.count(col)).cast("double")
    ).otherwise(exact)


def dsum_over(col: Column, w, scale: int = 4) -> Column:
    """Windowed dsum: the same finite-exact / IEEE-specials two-branch
    form over a window spec (running sums, moving averages, trailing
    frames). Deterministic for the same reason dsum is: the specials-only
    side sum is order-independent."""
    nf = _nonfinite(col)
    ssum = F.sum(F.when(nf, col).otherwise(F.lit(0.0))).over(w)
    exact = (
        F.sum(F.when(~nf, col).cast(f"decimal(18,{scale})"))
        .over(w)
        .cast("double")
    )
    return F.when(F.isnan(ssum) | (ssum != 0.0), ssum).otherwise(exact)


def dsum_over_sql(expr: str, over: str, scale: int = 4) -> str:
    """SQL mirror of dsum_over; ``over`` is the full window text
    (\"(PARTITION BY ... ORDER BY ... ROWS ...)\" or a named window)."""
    nf = nonfinite_sql(expr)
    ssum = f"SUM(CASE WHEN {nf} THEN {expr} ELSE 0.0 END) OVER {over}"
    exact = (
        f"CAST(CAST(SUM(CASE WHEN NOT {nf} "
        f"THEN CAST(CAST({expr} AS STRING) AS DECIMAL(18,{scale})) END) "
        f"OVER {over} AS STRING) AS DOUBLE)"
    )
    return (
        f"CASE WHEN isnan({ssum}) OR {ssum} != 0.0 THEN {ssum} "
        f"ELSE {exact} END"
    )


def nonfinite_sql(expr: str) -> str:
    # Dialect-shared (several oracles are ALSO executed by Spark's parser):
    # isnan() exists in both engines; isinf() only in DuckDB, so spell it
    # abs(x) = 'Infinity' — both parsers accept the cast literal.
    return f"(isnan({expr}) OR abs({expr}) = CAST('Infinity' AS DOUBLE))"


def finite_sql(expr: str) -> str:
    """SQL mirror of finite_or_null: the expression with non-finite
    values nulled out."""
    return f"(CASE WHEN NOT {nonfinite_sql(expr)} THEN {expr} END)"


_nonfinite_sql = nonfinite_sql  # internal alias used by dsum_sql below


def dsum_sql(expr: str, scale: int = 4) -> str:
    # decimal→double goes VIA STRING: DuckDB's direct CAST(DECIMAL AS
    # DOUBLE) computes (double)int128 / (double)10^scale — TWO roundings,
    # observed 1 ulp off the correctly-rounded value once the sum reaches
    # ~16 significant digits (×10-facts hash sweep, round 5). String→double
    # parsing is correctly rounded in both engines, and Spark's
    # BigDecimal→double is already correct, so the string route makes the
    # conversion agree at every magnitude. The specials branch mirrors
    # dsum: IEEE propagation when the group holds NaN/±Inf.
    #
    # The PER-ROW double→decimal cast goes via STRING for the mirror
    # reason (extremes tier, r10): Spark quantizes the SHORTEST REPR
    # (BigDecimal.valueOf) while DuckDB's direct cast rounds the BINARY
    # value — once the summed expression is a COMPUTED double carrying
    # ~17 significant digits (a per-day gmv of 9.9e12 + cents), the two
    # land on different scale-4 decimals (…281.2200 repr vs …281.2208
    # binary). Both engines render the shortest repr in their
    # double→string cast, so the string route pins quantize-the-repr on
    # both sides; raw parquet values (true scale <= cast scale) are
    # unchanged, so every pre-r10 tier hash holds.
    nf = _nonfinite_sql(expr)
    ssum = f"SUM(CASE WHEN {nf} THEN {expr} ELSE 0.0 END)"
    exact = (
        f"CAST(CAST(SUM(CASE WHEN NOT {nf} "
        f"THEN CAST(CAST({expr} AS STRING) AS DECIMAL(18,{scale})) END) "
        f"AS STRING) AS DOUBLE)"
    )
    return (
        f"CASE WHEN isnan({ssum}) OR {ssum} != 0.0 THEN {ssum} "
        f"ELSE {exact} END"
    )


def davg_sql(expr: str, scale: int = 4) -> str:
    nf = _nonfinite_sql(expr)
    ssum = f"SUM(CASE WHEN {nf} THEN {expr} ELSE 0.0 END)"
    exact = (
        f"CAST(CAST(CAST(SUM(CASE WHEN NOT {nf} "
        f"THEN CAST(CAST({expr} AS STRING) AS DECIMAL(18,{scale})) END) "
        f"AS STRING) AS DOUBLE) / COUNT({expr}) AS DOUBLE)"
    )
    return (
        f"CASE WHEN isnan({ssum}) OR {ssum} != 0.0 "
        f"THEN CAST({ssum} / COUNT({expr}) AS DOUBLE) "
        f"ELSE {exact} END"
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
#
# WHITESPACE is pinned to Java's \s set [ \t\n\x0B\f\r] (extremes tier,
# r10): RE2's \s is the POSIX [ \t\n\f\r] — it EXCLUDES vertical tab —
# so a doc carrying \x0B normalized differently in the two engines
# (Spark collapsed it, DuckDB kept it, diverging every downstream
# shingle/hash). The Spark form keeps \s (it IS that 6-char set in
# Java); the DuckDB mirror spells the class out. Consistent with the
# uni-tier contract that NBSP/ZWSP are NOT whitespace.
NORM_TEXT_SPARK = (
    "replace(lower(trim(regexp_replace(replace(text, 'İ', 'i'), "
    "'\\\\s+', ' '))), 'ς', 'σ')"
)
NORM_TEXT_DUCK = (
    "replace(lower(trim(regexp_replace(replace(text, 'İ', 'i'), "
    "'[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))), 'ς', 'σ')"
)


def norm_text(col: str = "text") -> Column:
    """Column form of NORM_TEXT_SPARK (same fold, same order)."""
    c = F.replace(F.col(col), F.lit("İ"), F.lit("i"))
    c = F.lower(F.trim(F.regexp_replace(c, "\\s+", " ")))
    return F.replace(c, F.lit("ς"), F.lit("σ"))


def dtrunc(fmt: str, col: Column | str) -> Column:
    """date_trunc that PRESERVES wall-clock typing: Spark's date_trunc
    returns instant TIMESTAMP even for TIMESTAMP_NTZ input, and an LTZ
    output column shifts at the driver's collect() boundary on a
    non-UTC host (r10 non-UTC sweep — 22 keys, every date_trunc-derived
    day/week/month column). The NTZ cast back is exact under the
    session.prepare UTC pin."""
    return F.date_trunc(fmt, col).cast("timestamp_ntz")


def epoch_us(col: Column) -> Column:
    """Exact integer µs-since-epoch from a (NTZ) timestamp. unix_micros
    rejects TIMESTAMP_NTZ outright, so route through an LTZ cast — exact
    under the session.prepare UTC pin, and the LTZ value never reaches
    the driver (only durations / ordering keys do). SQL mirror: DuckDB's
    epoch_us()."""
    return F.unix_micros(col.cast("timestamp"))


def bigint(col: Column) -> Column:
    """Spark's year()/month()/... return int32; DuckDB's return int64.
    Normalize every computed integer column to BIGINT on both sides."""
    return col.cast("long")
