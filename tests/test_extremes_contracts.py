"""Direct pins for the r10 extremes-tier (domain-boundary) contracts.
The tier itself (drive_driver --sf .../extremes, verify SKILL.md) is the
end-to-end net; these run in the fast gate so a regression in the
portable whitespace class, the string-routed per-row decimal quantize,
or the linear chunk fan-out fails in seconds, not at round close.
"""

from __future__ import annotations

import duckdb

from flink_realtime_spark.exprs import (
    NORM_TEXT_DUCK,
    dsum_over_sql,
    dsum_sql,
)
from flink_realtime_spark.llm.text import _TOKEN_RE


def test_norm_text_duck_whitespace_class_is_java_s():
    """RE2's \\s is POSIX [ \\t\\n\\f\\r]; the normalizer must collapse
    Java's 6-char set — \\x0B (vertical tab) included — or a VT-bearing
    doc diverges in every downstream shingle/hash (extremes tier)."""
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {NORM_TEXT_DUCK} FROM (SELECT "
        "'A' || chr(9) || 'b' || chr(11) || 'c' || chr(12) || 'd' "
        "|| chr(13) || chr(10) || 'e' AS text)"
    ).fetchone()[0]
    assert got == "a b c d e"
    # NBSP stays a NON-space (uni-tier contract): U+00A0 glues tokens.
    glued = con.execute(
        f"SELECT {NORM_TEXT_DUCK} FROM (SELECT 'a' || chr(160) || 'b' AS text)"
    ).fetchone()[0]
    assert glued == "a b"


def test_token_re_excludes_vertical_tab_symbols():
    """The shared BPE-ish token regex spells the whitespace class out:
    RE2 must not count \\x0B as a symbol token (it is whitespace on the
    Java side)."""
    con = duckdb.connect()
    n = con.execute(
        f"SELECT len(regexp_extract_all('ab' || chr(11) || '12, x', "
        f"'{_TOKEN_RE}'))"
    ).fetchone()[0]
    # tokens: 'ab', '12', ',', 'x' — and NOT the VT
    assert n == 4


def test_dsum_sql_requantize_uses_repr_not_binary():
    """Per-row double->DECIMAL inside the *_sql forms routes via STRING:
    a computed double at 17 significant digits must quantize its
    shortest repr (Spark's BigDecimal.valueOf semantics), not the
    binary expansion — 9900016868281.22 re-quantizes to .2200, not the
    binary .2208 (extremes tier, ads_gmv_dashboard/ads_pareto_share)."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT 9900016868281.22 AS v")
    got = con.execute(f"SELECT {dsum_sql('v')} FROM t").fetchone()[0]
    assert got == 9900016868281.22
    got = con.execute(
        f"SELECT {dsum_over_sql('v', '()')} FROM t"
    ).fetchone()[0]
    assert got == 9900016868281.22


def test_row_dec_flush_subnormals():
    """DuckDB's VARCHAR->DECIMAL rounds tiny '5e-N' strings AWAY from
    zero ('5e-324' -> 0.0001 at scale 4); the per-row cast's
    half-quantum flush must yield exactly 0 for sub-half-quantum values
    and leave legitimate roundings alone."""
    from flink_realtime_spark.exprs import row_dec_sql

    con = duckdb.connect()
    got = con.execute(
        f"SELECT {row_dec_sql('v', 4, 18)} FROM (SELECT 5e-324 AS v)"
    ).fetchone()[0]
    assert str(got) == "0.0000"
    got = con.execute(
        f"SELECT {row_dec_sql('v', 4, 18)} FROM (SELECT 7e-5 AS v)"
    ).fetchone()[0]
    assert str(got) == "0.0001"  # above half-quantum: normal HALF_UP
    got = con.execute(
        f"SELECT {row_dec_sql('v', 4, 18)} FROM (SELECT -5e-300 AS v)"
    ).fetchone()[0]
    assert str(got) == "0.0000"


def test_dsum_sql_decimal_to_double_22_digits():
    """The final decimal->double leg must be correctly rounded at 22
    significant digits: 2114356965.320999971774 parses to the
    .3209999-double (Spark's BigDecimal.doubleValue lands on .3210 —
    the reason the Spark side routes via STRING too)."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT 2114356965.320999971774 AS d"
    )
    got = con.execute(
        "SELECT CAST(CAST(CAST(d AS DECIMAL(38,12)) AS STRING) AS DOUBLE)"
        " FROM t"
    ).fetchone()[0]
    assert repr(got) == "2114356965.3209999"
    assert float("2114356965.320999971774") == got


def test_json_k_variant_double_truncates_toward_zero():
    """Spark's try_variant_get(..., 'long') coerces a JSON double by
    TRUNCATION toward zero (3.5→3, -2.5→-2 — verified in Spark, ADVICE
    r10), while DuckDB's bare TRY_CAST(DOUBLE AS BIGINT) rounds
    half-even (3.5→4). The oracle form must route through trunc() to
    mirror truncation and keep out-of-range → NULL."""
    from flink_realtime_spark.exprs import json_k_variant_sql

    con = duckdb.connect()
    expr = json_k_variant_sql("p")
    cases = {
        '{"k": 3.7}': 3,
        '{"k": 3.5}': 3,
        '{"k": -2.5}': -2,
        '{"k": -3.7}': -3,
        '{"k": 0.30000000000000004}': 0,
        '{"k": 1.7976931348623157e308}': None,  # out of int64 range
        '{"k": 1e309}': None,  # Infinity
        '{"k": 42}': 42,  # integral path untouched
    }
    for doc, want in cases.items():
        got = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS p)", [doc]
        ).fetchone()[0]
        assert got == want, (doc, got, want)


def test_chunk_oracle_linear_and_exact():
    """The positional fan-out chunk oracle: same chunks as a direct
    slice reference, including the clamped final partial chunk and the
    single-word document."""
    from flink_realtime_spark.llm.text import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
        _CHUNK_ORACLE,
    )

    con = duckdb.connect()
    words = " ".join(f"w{i}" for i in range(1, 76))  # 75 words
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        f"(1, '{words}'), (2, 'solo'), (3, '')) AS t(doc_id, text)"
    )
    rows = con.execute(
        _CHUNK_ORACLE + " ORDER BY doc_id, chunk_start"
    ).fetchall()
    ref = con.execute(
        f"""
        WITH ws AS MATERIALIZED (
          SELECT doc_id, str_split(text, ' ') AS w FROM documents
        )
        SELECT doc_id, CAST(s AS BIGINT),
               CAST(len(list_slice(w, s, s + {CHUNK_SIZE - 1})) AS BIGINT),
               array_to_string(list_slice(w, s, s + {CHUNK_SIZE - 1}), ' ')
        FROM (SELECT doc_id, w,
                     unnest(generate_series(1, len(w), {CHUNK_STRIDE})) AS s
              FROM ws)
        ORDER BY doc_id, 2
        """
    ).fetchall()
    assert rows == ref
    # 75 words, stride 30: starts 1/31/61 -> sizes 40/40/15
    assert [r[2] for r in rows if r[0] == 1] == [40, 40, 15]
    # '' splits to one empty token: one chunk of one token
    assert [r for r in rows if r[0] == 3] == [(3, 1, 1, "")]
