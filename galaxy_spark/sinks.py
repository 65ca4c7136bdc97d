"""Batch sinks: partitioned/keyed data layout at rest.

The reference's sink is topic-per-table Kafka routing
(``internal/mq_manager/kafka/kafka.go:117-118``). The at-rest
analog — and the layout a 100 TB lakehouse actually queries — is
hive-style partitioning by the routing key: one directory per
``(database, table)`` so downstream readers prune to exactly the
tables they ask for, no file listing of the rest.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str,
                      partition_cols: Sequence[str] = ("database", "table"),
                      mode: str = "overwrite",
                      max_records_per_file: int = 5_000_000) -> None:
    """Write hive-partitioned parquet keyed like the Kafka sink.

    ``maxRecordsPerFile`` bounds single-file size under hot keys
    (one giant ``db.table`` partition otherwise writes one giant
    file); partition discovery on read gives free pruning for any
    predicate on the partition columns.
    """
    (df.write.mode(mode)
       .option("maxRecordsPerFile", str(max_records_per_file))
       .partitionBy(*partition_cols)
       .parquet(path))


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned layout back; predicates on the partition
    columns become PartitionFilters (pruned before any file I/O)."""
    return spark.read.parquet(path)


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int, path: str, sort_col: str | None = None,
                   mode: str = "overwrite") -> None:
    """Write a bucketed (hash-clustered) table: rows are pre-hashed
    into ``n_buckets`` files per partition by ``bucket_col``.

    THE co-location tool for repeated fact-fact joins at 100 TB:
    two tables bucketed on the same key with the same bucket count
    join with NO exchange on either side (Spark trusts the on-disk
    hash layout), turning the biggest shuffle in a star-schema
    pipeline into a local merge. Sorting within buckets
    additionally removes the join's sort step.
    """
    writer = (df.write.mode(mode)
              .option("path", path)
              .bucketBy(n_buckets, bucket_col))
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)
