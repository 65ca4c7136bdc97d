"""Source builders: batch readers and streaming sources.

The reference's only source is the MySQL binlog tail
(``internal/sync_server/sync.go:44-118``); here the same role is
played by standard Spark sources plus envelope mapping — see
``galaxy_spark.sources.streams`` (streaming) and
``galaxy_spark.sources.readers`` (batch/bootstrap).
"""

from galaxy_spark.sources.readers import (
    jdbc_table_reader,
    read_csv_table,
    read_json_table,
    read_parquet_table,
)
from galaxy_spark.sources.streams import (
    file_envelope_stream,
    kafka_cdc_stream,
    rate_envelope_stream,
)

__all__ = [
    "file_envelope_stream",
    "jdbc_table_reader",
    "kafka_cdc_stream",
    "rate_envelope_stream",
    "read_csv_table",
    "read_json_table",
    "read_parquet_table",
]
