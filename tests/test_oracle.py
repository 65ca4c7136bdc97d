"""The correctness gate, locally: every registered query with an
oracle must match DuckDB at sf0.001 (driver re-runs this at sf0.01);
oracle-less queries must at least produce a stable, non-erroring
DataFrame.
"""

from __future__ import annotations

import pytest

from galaxy_spark.registry import all_oracles, all_queries
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare, duckdb_con

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_ORACLE)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, con, name):
    df = QUERIES[name](spark, SF_ORACLE)
    problems = compare(df, con, ORACLES[name])
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_ORACLE)
    assert df.columns, f"{name} returned no columns"
    df.limit(5).collect()  # must execute without error


def test_entry_smoke(spark):
    import __spark_entry__ as e
    rows = e.entry(spark).collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_approx_distinct_within_rsd(spark):
    """The HLL estimate must land within the asserted bound on every
    group — the query itself carries the comparison (its oracle
    expects hll_within_bound=TRUE on every row)."""
    rows = QUERIES["agg_approx_distinct"](spark, SF_ORACLE).collect()
    assert rows and all(r.hll_within_bound for r in rows)
