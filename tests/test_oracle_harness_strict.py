"""The local harness must be at least as strict as the driver's
exact hash. Round 4 shipped two hash-fails (pack_sequences_greedy,
pipeline_curation_end2end) because DuckDB widens ``SUM(BIGINT)`` to
HUGEINT and the old harness normalized every numeric to float —
numerically equal, representationally different, invisible locally.
These tests pin the failure modes the strict harness must catch.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.oracle_harness import (canon_duck_type, canon_spark_type,
                                  compare)


@pytest.fixture()
def con():
    c = duckdb.connect()
    c.sql("CREATE VIEW t AS SELECT * FROM (VALUES (1, 10),"
          " (1, 20), (2, 30)) v(k, x)")
    yield c
    c.close()


def test_uncast_sum_bigint_fails_locally(spark, con):
    """SUM(BIGINT) -> HUGEINT in DuckDB; Spark SUM(long) -> long.
    Equal values, different representation: the harness must flag
    the column type even though every value matches."""
    df = spark.createDataFrame([(1, 30), (2, 30)], "k int, s bigint")
    # x in the view is INTEGER; SUM(INTEGER) is already BIGINT — widen
    # once more so the oracle column is HUGEINT like SUM over a
    # BIGINT expression (len(tk), COUNT(*) arithmetic, ...) would be.
    problems = compare(
        df, con,
        "SELECT k, SUM(CAST(x AS BIGINT)) AS s FROM t GROUP BY k")
    assert any("type differs" in p and "int128" in p for p in problems), \
        problems


def test_cast_sum_passes(spark, con):
    df = spark.createDataFrame([(1, 30), (2, 30)], "k int, s bigint")
    problems = compare(
        df, con,
        "SELECT k, CAST(SUM(x) AS BIGINT) AS s FROM t GROUP BY k")
    assert problems == []


def test_int_vs_float_representation_fails(spark, con):
    """The old harness coerced int and float to one numeric tag;
    the driver does not. 1 (int) vs 1.0 (double) must mismatch."""
    df = spark.createDataFrame([(1, 1)], "k int, v bigint")
    problems = compare(df, con, "SELECT 1 AS k, 1.0::DOUBLE AS v")
    assert problems, "int64 vs float64 must not compare equal"


def test_decimal_tagged_distinctly(spark, con):
    """DECIMAL stays DECIMAL — no silent float coercion. Matching
    (p,s) on both sides passes; a double on one side fails."""
    df = spark.createDataFrame([("1.50",)], "v string") \
              .selectExpr("CAST(v AS DECIMAL(18,2)) AS v")
    assert compare(df, con,
                   "SELECT CAST(1.50 AS DECIMAL(18,2)) AS v") == []
    assert compare(df, con, "SELECT 1.5::DOUBLE AS v")


def test_approx_opt_in_restores_tolerance(spark, con):
    df = spark.createDataFrame([(1.0,)], "v double")
    sql = "SELECT (1.0 + 1e-13)::DOUBLE AS v"
    assert compare(df, con, sql), "exact mode must flag the drift"
    assert compare(df, con, sql, approx=True) == []


def test_canonical_type_mapping():
    assert canon_spark_type("bigint") == canon_duck_type("BIGINT") == "int64"
    assert canon_duck_type("HUGEINT") == "int128"
    assert canon_spark_type("decimal(18,6)") == \
        canon_duck_type("DECIMAL(18,6)") == "decimal(18,6)"
    assert canon_spark_type("array<double>") == \
        canon_duck_type("DOUBLE[]") == "array<float64>"
    assert canon_spark_type("int") == canon_duck_type("INTEGER") == "int32"
