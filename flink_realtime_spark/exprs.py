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


def dsum(col: Column, scale: int = 4, prec: int = 18) -> Column:
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
    # decimal→double via STRING on the SPARK side too (nulls-tier
    # re-run, r10): BigDecimal.doubleValue goes 1 ulp off the
    # correctly-rounded value once the decimal carries ~22
    # significant digits (a (38,12) product sum at 1e9); the
    # string parse (Double.parseDouble) is correct at any length.
    exact = (
        F.sum(F.when(~nf, col).cast(f"decimal({prec},{scale})"))
        .cast("string")
        .cast("double")
    )
    return F.when(F.isnan(ssum) | (ssum != 0.0), ssum).otherwise(exact)


def davg(col: Column, scale: int = 4, prec: int = 18) -> Column:
    """Order-independent AVG: exact decimal sum divided by count, one final
    double division (deterministic); IEEE propagation when the group holds
    NaN/±Inf (see dsum — ±Inf/count keeps its sign, NaN stays NaN)."""
    nf = _nonfinite(col)
    ssum = F.sum(F.when(nf, col).otherwise(F.lit(0.0)))
    exact = (
        F.sum(F.when(~nf, col).cast(f"decimal({prec},{scale})"))
        .cast("string")
        .cast("double")
        / F.count(col)
    ).cast("double")
    return F.when(
        F.isnan(ssum) | (ssum != 0.0), (ssum / F.count(col)).cast("double")
    ).otherwise(exact)


def dsum_over(col: Column, w, scale: int = 4, prec: int = 18) -> Column:
    """Windowed dsum: the same finite-exact / IEEE-specials two-branch
    form over a window spec (running sums, moving averages, trailing
    frames). Deterministic for the same reason dsum is: the specials-only
    side sum is order-independent."""
    nf = _nonfinite(col)
    ssum = F.sum(F.when(nf, col).otherwise(F.lit(0.0))).over(w)
    exact = (
        F.sum(F.when(~nf, col).cast(f"decimal({prec},{scale})"))
        .over(w)
        .cast("string")
        .cast("double")
    )
    return F.when(F.isnan(ssum) | (ssum != 0.0), ssum).otherwise(exact)


def dsum_over_sql(expr: str, over: str, scale: int = 4, prec: int = 18) -> str:
    """SQL mirror of dsum_over; ``over`` is the full window text
    (\"(PARTITION BY ... ORDER BY ... ROWS ...)\" or a named window)."""
    nf = nonfinite_sql(expr)
    ssum = f"SUM(CASE WHEN {nf} THEN {expr} ELSE 0.0 END) OVER {over}"
    exact = (
        f"CAST(CAST(SUM(CASE WHEN NOT {nf} "
        f"THEN {row_dec_sql(expr, scale, prec)} END) "
        f"OVER {over} AS STRING) AS DOUBLE)"
    )
    return (
        f"CASE WHEN isnan({ssum}) OR {ssum} != 0.0 THEN {ssum} "
        f"ELSE {exact} END"
    )



def row_dec_sql(expr: str, scale: int, prec: int) -> str:
    """The per-row double→DECIMAL cast of the *_sql forms: STRING-routed
    (repr-quantize, matching Spark's BigDecimal.valueOf) with a
    HALF-QUANTUM FLUSH — DuckDB's VARCHAR→DECIMAL parser rounds any
    tiny '5e-N' string AWAY from zero to the smallest quantum
    ('5e-324' → 0.0001 at scale 4; specials-tier re-run, r10), so
    values strictly below half a quantum (whose correct rounding is
    exactly 0 at this scale) are flushed before the parse. Spark's
    native cast needs no guard; the flush is value-preserving."""
    thr = f"5e-{scale + 1}"
    guarded = f"(CASE WHEN abs({expr}) < {thr} THEN 0.0 ELSE {expr} END)"
    return f"CAST(CAST({guarded} AS STRING) AS DECIMAL({prec},{scale}))"


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


def dsum_sql(expr: str, scale: int = 4, prec: int = 18) -> str:
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
        f"THEN {row_dec_sql(expr, scale, prec)} END) "
        f"AS STRING) AS DOUBLE)"
    )
    return (
        f"CASE WHEN isnan({ssum}) OR {ssum} != 0.0 THEN {ssum} "
        f"ELSE {exact} END"
    )


def davg_sql(expr: str, scale: int = 4, prec: int = 18) -> str:
    nf = _nonfinite_sql(expr)
    ssum = f"SUM(CASE WHEN {nf} THEN {expr} ELSE 0.0 END)"
    exact = (
        f"CAST(CAST(CAST(SUM(CASE WHEN NOT {nf} "
        f"THEN {row_dec_sql(expr, scale, prec)} END) "
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


# ---- Portable JSON k-extraction contracts (extremes tier, r10).
# Adversarial payloads (int64/double overflow, duplicate keys, type
# switches, fractional numbers, malformed fragments) expose that the
# three extraction routes have genuinely different semantics, and that
# the naive oracle mirror (CAST(json_extract_string(...) AS BIGINT))
# matches NONE of them — DuckDB's yyjson re-stringifies >uint64 integers
# through double, its TRY_CAST rounds fractional STRINGS to integers
# where Spark's integral parse NULLs, it keeps the FIRST duplicate key
# where Jackson's DOM parse keeps the LAST, and raw extraction ERRORS on
# malformed input where Spark yields NULL. Each route below is one
# pinned cross-engine contract: the Spark expression and the DuckDB SQL
# are generated together.

_JSON_INT_RE = "^-?[0-9]+$"


def json_k_path_sql(col: str, path: str = "$.k") -> str:
    """DuckDB mirror of ``get_json_object(col, path).try_cast('long')``:
    lenient path extraction (first duplicate wins in both engines),
    integral-string-only cast (Spark's long parse rejects fractions —
    the regexp guard stops DuckDB's TRY_CAST from rounding '0.3' to 0,
    and rejects yyjson's doubleized '1.8e19...0' re-stringification the
    same way Spark's overflow check NULLs the raw literal), NULL on
    malformed documents."""
    s = f"json_extract_string({col}, '{path}')"
    return (
        f"(CASE WHEN json_valid({col}) THEN "
        f"(CASE WHEN regexp_matches({s}, '{_JSON_INT_RE}') "
        f"THEN TRY_CAST({s} AS BIGINT) END) END)"
    )


def json_strict_unique_sql(col: str) -> str:
    """DuckDB predicate for Spark's VARIANT strict validity
    (``try_parse_json(col) IS NOT NULL``): well-formed JSON with UNIQUE
    object keys — Spark's variant builder rejects duplicate keys.
    NESTED CASE, not AND: DuckDB's vectorized AND does not short-circuit
    and json_keys() ERRORS on malformed input, so the uniqueness check
    must be conditionally evaluated behind json_valid. A NULL document
    stays NULL (not FALSE): Spark's try_parse_json(NULL) IS NULL is
    three-valued too, and dwd_clean_route's neither-clean-nor-dirty
    contract for missing payloads depends on it (nulls-tier re-run
    caught the ELSE FALSE collapsing ~1k NULL-props rows into dirty)."""
    return (
        f"(CASE WHEN {col} IS NULL THEN NULL "
        f"WHEN json_valid({col}) "
        f"THEN len(json_keys({col})) = len(list_distinct(json_keys({col}))) "
        f"ELSE FALSE END)"
    )


def json_k_struct_sql(col: str, path: str = "$.k") -> str:
    """DuckDB mirror of the STRICT schema parse
    ``when(try_parse_json(col).isNotNull(),
    from_json(col, 'k LONG').getField('k'))``: NULL unless the document
    is strictly valid (unique keys) AND the value is an integral JSON
    number in int64 range (type switches and fractional numbers yield
    NULL, never a coercion). json_type stays behind the strict CASE —
    it errors on malformed input (no AND short-circuit in DuckDB)."""
    s = f"json_extract_string({col}, '{path}')"
    return (
        f"(CASE WHEN {json_strict_unique_sql(col)} THEN "
        f"(CASE WHEN json_type({col}, '{path}') IN ('BIGINT', 'UBIGINT') "
        f"THEN TRY_CAST({s} AS BIGINT) END) END)"
    )


def json_k_variant_sql(col: str, path: str = "$.k") -> str:
    """DuckDB mirror of
    ``try_variant_get(try_parse_json(col), path, 'long')``: strict parse
    (unique keys), then the variant NUMERIC COERCION — integral numbers
    cast, doubles TRUNCATE TOWARD ZERO (out-of-range → NULL; Spark's
    variant long-coercion truncates 3.5→3 and -2.5→-2 where DuckDB's
    bare TRY_CAST(DOUBLE AS BIGINT) would round half-even — ADVICE r10;
    trunc() keeps the out-of-range → NULL behavior), integral strings
    coerce, arrays/objects/fractional strings → NULL."""
    s = f"json_extract_string({col}, '{path}')"
    t = f"json_type({col}, '{path}')"
    return (
        f"(CASE WHEN {json_strict_unique_sql(col)} THEN "
        f"(CASE WHEN {t} IN ('BIGINT', 'UBIGINT') "
        f"THEN TRY_CAST({s} AS BIGINT) "
        f"WHEN {t} = 'DOUBLE' "
        f"THEN TRY_CAST(trunc(TRY_CAST({s} AS DOUBLE)) AS BIGINT) "
        f"WHEN {t} = 'VARCHAR' AND regexp_matches({s}, '{_JSON_INT_RE}') "
        f"THEN TRY_CAST({s} AS BIGINT) END) END)"
    )


def sum_bigint_safe(col: Column) -> Column:
    """Overflow-safe BIGINT sum with a DETERMINISTIC NULL contract: sum
    in DECIMAL(38,0) (cannot overflow at any feasible row count), NULL
    iff the FINAL value leaves int64 range. Spark's own try_sum is NOT
    usable here: it NULLs on intermediate partial-sum overflow, which
    depends on partitioning order when +int64max and -int64max coexist
    in one group — nondeterministic under the driver's hash."""
    s = F.sum(col.cast("decimal(38,0)"))
    return F.when(
        s.between(
            F.lit(-9223372036854775808), F.lit(9223372036854775807)
        ),
        s.cast("long"),
    )


def try_sum_bigint_sql(expr: str) -> str:
    """DuckDB mirror of sum_bigint_safe: DuckDB's SUM(BIGINT) is HUGEINT
    and never overflows, so the final-value int64 range check is the
    whole contract."""
    return (
        f"(CASE WHEN SUM({expr}) BETWEEN -9223372036854775808 "
        f"AND 9223372036854775807 THEN CAST(SUM({expr}) AS BIGINT) END)"
    )
