"""Direct pins for the r09 uni-tier contracts. The tier itself
(drive_driver --tier uni, verify SKILL.md step 13) is the end-to-end
net; these run in the fast gate so a regression in the portable case
fold or the byte-level edit-distance definition fails in seconds, not
at round close. Spark-side pins live at the end (need the shared
session); the DuckDB pins are engine-direct.
"""

from __future__ import annotations

import duckdb
import pytest

from flink_realtime_spark.exprs import NORM_TEXT_DUCK, NORM_TEXT_SPARK

# The two lowercase mappings where Java (Spark) FULL casing and utf8proc
# (DuckDB) SIMPLE casing disagree under Locale.ROOT, plus agreement
# cases that must NOT be touched by the canonicalization.
CASES = [
    # (raw, portable-fold expectation)
    ("İstanbul", "istanbul"),          # dotted İ: pre-mapped to plain i
    ("ΤΈΛΟΣ", "τέλοσ"),                # final sigma: canonicalized to σ
    ("ΣΊΓΜΑ ς", "σίγμα σ"),            # input ς also canonicalized
    ("Straße", "straße"),              # sharp s: lower is 1:1 both sides
    ("Ǆǅǆ", "ǆǆǆ"),                    # tri-case digraph agrees
    ("A B c", "a b c"),      # NBSP is NOT \s — stays glued
    ("  x \t y  ", "x y"),             # whitespace collapse + trim
]


@pytest.mark.parametrize("raw,want", CASES)
def test_portable_fold_duckdb(raw, want):
    got = duckdb.connect().execute(
        f"SELECT {NORM_TEXT_DUCK.replace('text', '?')}", [raw]
    ).fetchone()[0]
    assert got == want, (raw, got, want)


def test_duckdb_levenshtein_counts_bytes():
    """The premise of the byte-level edit-distance contract: DuckDB's
    levenshtein is byte-based (if an engine upgrade makes it code-point
    based, llm_dedup_editdist's oracle must drop the strlen mirror)."""
    con = duckdb.connect()
    assert con.execute("SELECT levenshtein('é', 'a')").fetchone()[0] == 2
    assert con.execute("SELECT levenshtein('流', 'x')").fetchone()[0] == 3


def test_portable_fold_spark_matches_duckdb(spark):
    """Bit-identical fold on both engines over every divergence mine."""
    from pyspark.sql import functions as F

    raws = [r for r, _ in CASES]
    df = spark.createDataFrame([(t,) for t in raws], "text STRING")
    got = [
        r[0]
        for r in df.select(F.expr(NORM_TEXT_SPARK)).collect()
    ]
    want = [w for _, w in CASES]
    assert got == want, list(zip(raws, got, want))


def test_byte_levenshtein_latin1_roundtrip(spark):
    """The ISO-8859-1 round-trip makes Spark's code-point DP run over
    UTF-8 bytes: levenshtein('é','a') must be 2 (bytes), not 1."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("é", "a"), ("流", "x")], "a STRING, b STRING")
    b = lambda c: F.decode(F.encode(c, "UTF-8"), "ISO-8859-1")  # noqa: E731
    got = [
        (r[0], r[1])
        for r in df.select(
            F.levenshtein(b("a"), b("b")), F.levenshtein("a", "b")
        ).collect()
    ]
    assert got == [(2, 1), (3, 1)]  # (byte-level, code-point-level)
