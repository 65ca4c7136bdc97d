"""Local replica of the driver's Spark-vs-DuckDB comparison.

Mirrors the documented contract: row count + column-name set +
order-insensitive value comparison (columns sorted by name, rows
sorted). Floats compare with a tiny relative tolerance locally —
queries are expected to round identically on both sides, so any
drift here is a bug to fix before the driver's exact hash sees it.
"""

from __future__ import annotations

import datetime as dt
import math
import os
from typing import Any

import duckdb

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{os.path.join(sf_dir, t + '.parquet')}'"
        )
    return con


def _norm(v: Any) -> Any:
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return ("ts", v.isoformat())
    if isinstance(v, dt.date):
        return ("date", v.isoformat())
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("n", float(v))
    if isinstance(v, float):
        return ("n", v)
    if v is None:
        return ("null",)
    return ("s", str(v))


def _sort_key(row: tuple) -> tuple:
    return tuple((t[0], str(t[1:])) for t in row)


def _values_close(a: Any, b: Any) -> bool:
    if a == b:
        return True
    if isinstance(a, tuple) and isinstance(b, tuple) and a[0] == b[0] == "n":
        return math.isclose(a[1], b[1], rel_tol=1e-9, abs_tol=1e-9)
    return False


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    spark_cols = sorted(spark_df.columns)
    spark_rows = [
        tuple(_norm(r[c]) for c in spark_cols) for r in spark_df.collect()
    ]
    rel = con.sql(sql)
    duck_cols = sorted(rel.columns)
    idx = [rel.columns.index(c) for c in duck_cols]
    duck_rows = [tuple(_norm(row[i]) for i in idx) for row in rel.fetchall()]

    if spark_cols != duck_cols:
        problems.append(f"columns differ: spark={spark_cols} duck={duck_cols}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}")
    s_sorted = sorted(spark_rows, key=_sort_key)
    d_sorted = sorted(duck_rows, key=_sort_key)
    n_bad = 0
    for i, (sr, dr) in enumerate(zip(s_sorted, d_sorted)):
        for c, sv, dv in zip(spark_cols, sr, dr):
            if not _values_close(sv, dv):
                n_bad += 1
                if n_bad <= 5:
                    problems.append(f"row {i} col {c}: spark={sv} duck={dv}")
    if n_bad > 5:
        problems.append(f"... {n_bad} mismatched values total")
    return problems
