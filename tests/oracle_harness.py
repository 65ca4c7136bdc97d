"""Local replica of the driver's Spark-vs-DuckDB comparison.

Mirrors the documented contract: row count + column-name set +
order-insensitive value comparison (columns sorted by name, rows
sorted). The driver hashes EXACT serialized values, so this harness
is deliberately at least as strict:

- Declared column types are compared, both sides mapped to one
  canonical class (``int64``, ``int128``, ``float64``,
  ``decimal(p,s)``, ...). This is what catches the DuckDB
  ``SUM(BIGINT) -> HUGEINT`` widening: the values are numerically
  identical but an int128 column serializes differently from
  Spark's int64, so the driver's hash fails while a value-only
  compare stays green. (Shipped exactly that way in round 4 —
  see VERDICT r4 "What's wrong" #1-#3.)
- Values are tagged by kind — int ``("i",)``, float ``("f",)``,
  decimal ``("dec",)`` — and compared EXACTLY. An int-vs-float or
  int64-vs-int128 representation difference is a failure here even
  when the numbers are equal.
- Tolerance is an explicit opt-in (``approx=True``) for the rare
  assertion that genuinely wants numeric closeness; no registered
  oracle uses it.
"""

from __future__ import annotations

import datetime as dt
import decimal
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


# --- canonical column-type classes ---------------------------------

_SPARK_CANON = {
    "tinyint": "int8", "smallint": "int16", "int": "int32",
    "bigint": "int64", "float": "float32", "double": "float64",
    "string": "str", "boolean": "bool", "date": "date",
    "timestamp": "ts", "timestamp_ntz": "ts", "binary": "binary",
}

_DUCK_CANON = {
    "TINYINT": "int8", "SMALLINT": "int16", "INTEGER": "int32",
    "BIGINT": "int64", "HUGEINT": "int128",
    "UTINYINT": "uint8", "USMALLINT": "uint16",
    "UINTEGER": "uint32", "UBIGINT": "uint64", "UHUGEINT": "uint128",
    "FLOAT": "float32", "DOUBLE": "float64",
    "VARCHAR": "str", "BOOLEAN": "bool", "DATE": "date",
    "TIMESTAMP": "ts", "TIMESTAMP WITH TIME ZONE": "ts",
    "TIMESTAMP_NS": "ts", "TIMESTAMP_MS": "ts", "TIMESTAMP_S": "ts",
    "BLOB": "binary",
}


def canon_spark_type(s: str) -> str:
    s = s.lower()
    if s in _SPARK_CANON:
        return _SPARK_CANON[s]
    if s.startswith("decimal"):
        return s.replace(" ", "")
    if s.startswith("array<") and s.endswith(">"):
        return f"array<{canon_spark_type(s[6:-1])}>"
    return s


def canon_duck_type(t: Any) -> str:
    s = str(t).upper()
    if s in _DUCK_CANON:
        return _DUCK_CANON[s]
    if s.startswith("DECIMAL"):
        return s.lower().replace(" ", "")
    if s.endswith("[]"):
        return f"array<{canon_duck_type(s[:-2])}>"
    return s.lower()


# --- value normalization -------------------------------------------

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
        return ("i", v)
    if isinstance(v, float):
        return ("f", "nan") if math.isnan(v) else ("f", v)
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, (list, tuple)):
        return ("l",) + tuple(_norm(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return ("bytes", bytes(v))
    if v is None:
        return ("null",)
    return ("s", str(v))


def _sort_key(row: tuple) -> tuple:
    return tuple((t[0], str(t[1:])) for t in row)


_NUMERIC_TAGS = {"i", "f", "dec"}


def _as_float(t: tuple) -> float:
    return float(decimal.Decimal(t[1])) if t[0] == "dec" else float(t[1])


def _values_close(a: Any, b: Any, approx: bool) -> bool:
    if a == b:
        return True
    if (approx and isinstance(a, tuple) and isinstance(b, tuple)
            and a[0] in _NUMERIC_TAGS and b[0] in _NUMERIC_TAGS
            and a[1] != "nan" and b[1] != "nan"):
        return math.isclose(_as_float(a), _as_float(b),
                            rel_tol=1e-9, abs_tol=1e-9)
    return False


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str,
            approx: bool = False, record: dict | None = None) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass).

    When ``record`` is passed, it is filled with the Spark side's
    row count, canonical schema, and order-insensitive value hash —
    the same three facts the driver's CORRECTNESS artifact records,
    so local certification runs can emit a diffable trail
    (CERTIFY_LOCAL_r*.json) without re-collecting the result."""
    problems: list[str] = []
    spark_cols = sorted(spark_df.columns)
    spark_types = {f.name: canon_spark_type(f.dataType.simpleString())
                   for f in spark_df.schema.fields}
    spark_rows = [
        tuple(_norm(r[c]) for c in spark_cols) for r in spark_df.collect()
    ]
    if record is not None:
        import hashlib
        record.update(
            rows=len(spark_rows),
            schema={c: spark_types[c] for c in spark_cols},
            value_hash=hashlib.md5(
                repr(sorted(spark_rows, key=_sort_key)).encode()
            ).hexdigest())
    rel = con.sql(sql)
    duck_cols = sorted(rel.columns)
    idx = [rel.columns.index(c) for c in duck_cols]
    duck_types = {c: canon_duck_type(t)
                  for c, t in zip(rel.columns, rel.types)}
    duck_rows = [tuple(_norm(row[i]) for i in idx) for row in rel.fetchall()]

    if spark_cols != duck_cols:
        problems.append(f"columns differ: spark={spark_cols} duck={duck_cols}")
        return problems
    for c in spark_cols:
        if spark_types[c] != duck_types[c]:
            problems.append(
                f"column {c} type differs: spark={spark_types[c]} "
                f"duck={duck_types[c]} (values may still be equal — "
                f"the driver hashes the representation, cast one side)")
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}")
    s_sorted = sorted(spark_rows, key=_sort_key)
    d_sorted = sorted(duck_rows, key=_sort_key)
    n_bad = 0
    for i, (sr, dr) in enumerate(zip(s_sorted, d_sorted)):
        for c, sv, dv in zip(spark_cols, sr, dr):
            if not _values_close(sv, dv, approx):
                n_bad += 1
                if n_bad <= 5:
                    problems.append(f"row {i} col {c}: spark={sv} duck={dv}")
    if n_bad > 5:
        problems.append(f"... {n_bad} mismatched values total")
    return problems
