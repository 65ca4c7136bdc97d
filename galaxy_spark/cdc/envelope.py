"""The change-event envelope (MQEvent) and test-envelope synthesis.

The reference's wire tuple is MQEvent
(``pkg/mq_config.go:23-36`` in /root/reference):

    {database, table, action: insert|update|delete,
     before: map, after: map, org_row: [][]interface{},
     event_header: {timestamp, log_pos}}

Spark-side this is a fixed StructType. ``before``/``after`` are
``map<string,string>`` for schema-fluid transport (values keep their
exact decimal/string rendering — the reference's ``UseDecimal``
guarantee, ``internal/sync_server/sync.go:52``); ``org_row``
preserves the raw positional rows exactly like the reference's
``OrgRow`` passthrough.

``envelope_from_events`` synthesizes a deterministic MQEvent-shaped
stream from the driver's ``events`` table so every CDC operator can
be oracle-checked in batch (FIXTURES.md §B1). The mapping is pure
column arithmetic so the DuckDB oracle can mirror it 1:1:

    database = 'db' || (user_id % 3)
    table    = event_type
    action   = event_id % 10 -> 0..5 insert, 6..8 update, 9 delete
    log_pos  = event_id, timestamp = epoch seconds of ts

org_row rows are the positional rendering of
(event_id, user_id, value) as strings; updates carry
[before_row, after_row] in canonical (before, after) order — NOTE
the reference pairs them inverted (after=Rows[i], before=Rows[i+1],
``internal/sync_server/process.go:138-141``); we follow Debezium
canonical order and document the divergence here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MQ_EVENT_SCHEMA = T.StructType([
    T.StructField("database", T.StringType(), False),
    T.StructField("table", T.StringType(), False),
    T.StructField("action", T.StringType(), False),
    T.StructField("before", T.MapType(T.StringType(), T.StringType()), True),
    T.StructField("after", T.MapType(T.StringType(), T.StringType()), True),
    T.StructField("org_row", T.ArrayType(T.ArrayType(T.StringType())), True),
    T.StructField("event_header", T.StructType([
        T.StructField("timestamp", T.LongType(), False),
        T.StructField("log_pos", T.LongType(), False),
    ]), False),
])

#: column order of the synthesized source table (the "schema" the
#: projection zips against, standing in for the reference's cached
#: SHOW FULL COLUMNS list, ``internal/sync_server/baseinfo.go:15-36``)
EVENT_SOURCE_COLUMNS = ("event_id", "user_id", "value")


def envelope_from_events(events: DataFrame) -> DataFrame:
    """events table -> MQEvent-shaped DataFrame (deterministic)."""
    ev = events.select(
        F.concat(F.lit("db"), (F.col("user_id") % 3).cast("string")).alias("database"),
        F.col("event_type").alias("table"),
        F.when(F.col("event_id") % 10 <= 5, F.lit("insert"))
         .when(F.col("event_id") % 10 <= 8, F.lit("update"))
         .otherwise(F.lit("delete")).alias("action"),
        F.col("event_id"),
        F.col("user_id"),
        F.col("value"),
        F.col("ts"),
    )
    row_now = F.array(
        F.col("event_id").cast("string"),
        F.col("user_id").cast("string"),
        F.col("value").cast("string"),
    )
    # the "previous image" for updates/deletes: value shifted by a
    # deterministic delta so before != after
    row_prev = F.array(
        F.col("event_id").cast("string"),
        F.col("user_id").cast("string"),
        (F.col("value") - F.lit(1.0)).cast("string"),
    )
    return ev.select(
        "database", "table", "action",
        F.struct(
            F.unix_timestamp("ts").alias("timestamp"),
            F.col("event_id").alias("log_pos"),
        ).alias("event_header"),
        F.when(F.col("action") == "insert", F.array(row_now))
         .when(F.col("action") == "delete", F.array(row_prev))
         .otherwise(F.array(row_prev, row_now)).alias("org_row"),
    )
