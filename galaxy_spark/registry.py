"""Query registry backing ``__spark_entry__.py``.

Every operator from SURVEY.md §2 registers a named query
(callable ``(spark, sf_dir) -> DataFrame``) plus, when the semantics
are SQL-expressible, a DuckDB oracle SQL string over the same
parquet tables. The driver hash-compares the two at sf=0.01.

Convention (driver contract): every computed column is aliased to
the SAME name in both the Spark query and the oracle SQL; float
aggregates are rounded identically on both sides so parallel
(Spark) vs sequential (DuckDB) summation order can't flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn
    return deco


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


_LOADED = False


def _load_all() -> None:
    """Import every query-defining module exactly once."""
    global _LOADED
    if _LOADED:
        return
    import galaxy_spark.queries.cdc  # noqa: F401
    import galaxy_spark.queries.relational  # noqa: F401
    import galaxy_spark.queries.events  # noqa: F401
    import galaxy_spark.queries.llm  # noqa: F401
    import galaxy_spark.queries.multimodal  # noqa: F401
    _LOADED = True
