"""Streaming sources for the CDC pipeline.

The reference's source is a single-threaded binlog tail
(``internal/sync_server/sync.go:44-118``: connect as replica, start
from a saved ``(file, pos)`` or ``SHOW MASTER STATUS`` latest —
``baseinfo.go:254-262``). Spark-native equivalents:

- ``kafka_cdc_stream``: production path — a Debezium/Canal
  connector publishes binlog rows to Kafka; Spark consumes with
  ``startingOffsets`` playing the role of the saved position
  ("latest" ≈ S2's master-status probe, an offsets JSON ≈ the saved
  ``(file, pos)``). Per-partition ordering matches the per-binlog
  ordering guarantee.
- ``file_envelope_stream``: deterministic test path (parquet dir in,
  envelope out) — used by tests/test_streaming.py.
- ``rate_envelope_stream``: unbounded synthetic envelope stream off
  the rate source, for throughput/soak testing without any broker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from galaxy_spark.cdc.envelope import envelope_from_events


def kafka_cdc_stream(spark: SparkSession, brokers: str, topics: str,
                     starting_offsets: str = "latest") -> DataFrame:
    """Kafka source configured for CDC consumption (builder only in
    this harness — no broker in the container; option wiring is
    unit-tested, execution happens on a real deployment).

    ``failOnDataLoss=false`` mirrors the reference's
    log-and-continue loop (``sync.go:106-111``).
    """
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
        .load()
    )


def file_envelope_stream(spark: SparkSession, path: str,
                         schema=None) -> DataFrame:
    """Parquet-dir stream -> MQEvent envelope (deterministic
    micro-batches; the test-harness stand-in for the binlog tail)."""
    if schema is None:
        schema = spark.read.parquet(path).schema
    raw = spark.readStream.schema(schema).parquet(path)
    return envelope_from_events(raw)


def rate_envelope_stream(spark: SparkSession,
                         rows_per_second: int = 1000) -> DataFrame:
    """Unbounded synthetic MQEvent stream from the rate source.

    Maps the rate source's (timestamp, value) onto the same
    deterministic envelope arithmetic as the batch fixture
    (envelope_from_events), so downstream plans are identical to the
    tested ones. Intended for throughput/soak runs: the source
    scales by partition count, no external dependency.
    """
    raw = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
        .select(
            F.col("value").alias("event_id"),
            (F.col("value") % 150).alias("user_id"),
            F.element_at(
                F.array(F.lit("click"), F.lit("view"), F.lit("purchase")),
                (F.col("value") % 3 + 1).cast("int")).alias("event_type"),
            (F.col("value") % 1000 / 10.0).alias("value"),
            F.col("timestamp").alias("ts"),
        )
    )
    return envelope_from_events(raw)
