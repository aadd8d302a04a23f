"""Direct pins for the r10 specials-tier (NaN/±Inf/-0.0/subnormal)
contracts. The tier itself (drive_driver --sf .../specials, verify
SKILL.md) is the end-to-end net; these run in the fast gate so a
regression in dsum's two-channel IEEE form, the cogroup kernel's
special sum, or the IVF geometry derivation fails in seconds, not at
round close. DuckDB pins are engine-direct; the cross-engine dsum pin
needs the shared session (parquet round-trip — a pandas/duckdb register
would collapse NaN to NULL and mask everything).
"""

from __future__ import annotations

import math

import duckdb
import pyarrow as pa
import pytest

from flink_realtime_spark.exprs import davg_sql, dsum_sql

NAN = float("nan")
INF = float("inf")


def test_cogroup_kernel_ieee_specials():
    """math.fsum raises on -inf + inf; the kernel's specials branch must
    instead propagate IEEE-style (dsum's contract): NaN wins, mixed
    infinities are NaN, a lone signed infinity keeps its sign, and the
    finite branch stays the exact rounded fsum."""
    from flink_realtime_spark.operators.joins import _cogroup_profile

    def run(vals):
        ev = pa.table(
            {
                "user_id": pa.array([1] * len(vals), type=pa.int64()),
                "value": pa.array(vals, type=pa.float64()),
            }
        )
        od = pa.table({"o_custkey": pa.array([1], type=pa.int64())})
        return _cogroup_profile(ev, od).column("sum_value").to_pylist()[0]

    assert math.isnan(run([1.0, NAN]))
    assert math.isnan(run([INF, -INF]))
    assert run([INF, 1.0]) == INF
    assert run([-INF, 1.0, None]) == -INF
    assert run([1.25, 2.5]) == 3.75


def test_dsum_sql_specials_duckdb():
    """dsum_sql/davg_sql two-channel form, engine-direct: IEEE when the
    group holds specials, exact decimal otherwise, NULL-skipping
    preserved."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        "('a', 1.5), ('a', 2.25), ('a', CAST('NaN' AS DOUBLE)), "
        "('b', 1.5), ('b', CAST('Infinity' AS DOUBLE)), "
        "('c', CAST('Infinity' AS DOUBLE)), ('c', CAST('-Infinity' AS DOUBLE)), "
        "('d', 1.5), ('d', 2.5), ('d', NULL), "
        "('e', CAST(NULL AS DOUBLE))"
        ") v(k, x)"
    )
    rows = dict(
        (r[0], (r[1], r[2]))
        for r in con.execute(
            f"SELECT k, {dsum_sql('x')} AS s, {davg_sql('x')} AS a "
            "FROM t GROUP BY k"
        ).fetchall()
    )
    assert math.isnan(rows["a"][0]) and math.isnan(rows["a"][1])
    assert rows["b"] == (INF, INF)
    assert math.isnan(rows["c"][0])
    assert rows["d"] == (4.0, 2.0)
    assert rows["e"] == (None, None)


def test_ivf_geometry_derivation():
    """Corpus-adaptive IVF geometry: 16-cell floor through every fixture
    decade (hash stability), linear growth past 200k vectors with the
    base scan fraction held, 4096-cell cap — and the llm_knn_ivf_hash
    oracle's SQL mirror computes the identical pair."""
    from flink_realtime_spark.llm.similarity import ivf_geometry

    assert ivf_geometry(0, 6) == (16, 6)
    assert ivf_geometry(2_000, 6) == (16, 6)
    assert ivf_geometry(200_000, 6) == (16, 6)  # vec100 stays 16
    cells, nprobe = ivf_geometry(2_000_000, 4)
    assert cells == 160 and nprobe == 40  # scan fraction 0.25 held
    assert ivf_geometry(10**9, 6) == (4096, 1536)  # cap
    con = duckdb.connect()
    for n in (0, 1, 2_000, 200_000, 200_001, 2_000_000, 10**9):
        sql_cells, sql_nprobe = con.execute(
            "SELECT GREATEST(16, LEAST(4096, "
            f"CAST(CEIL({n} / 12500.0) AS BIGINT))) AS ncells, "
            "CAST(CEIL(GREATEST(16, LEAST(4096, "
            f"CAST(CEIL({n} / 12500.0) AS BIGINT))) * 6 / 16.0) AS BIGINT)"
        ).fetchone()
        assert (sql_cells, sql_nprobe) == ivf_geometry(n, 6), n


@pytest.mark.parametrize(
    "vals,want",
    [
        ([1.5, 2.25, NAN], NAN),
        ([1.5, INF], INF),
        ([INF, -INF, 1.0], NAN),
        ([1.5, 2.5], 4.0),
        ([None], None),
        ([-0.0, 5e-324], 0.0),
    ],
)
def test_dsum_spark_matches_ieee(spark, tmp_path, vals, want):
    """Spark-side dsum over a parquet round-trip (real special bits, not
    pandas-collapsed ones) matches the IEEE/exact contract."""
    from pyspark.sql import functions as F

    from flink_realtime_spark.exprs import dsum

    df = spark.createDataFrame([(v,) for v in vals], "x DOUBLE")
    p = str(tmp_path / "t.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(p)
    got = (
        spark.read.parquet(p).agg(dsum(F.col("x")).alias("s")).collect()[0]["s"]
    )
    if want is None:
        assert got is None
    elif isinstance(want, float) and math.isnan(want):
        assert math.isnan(got)
    else:
        assert got == want
