"""Source builders: batch readers and streaming sources.

The reference's only source is the MySQL binlog tail
(``internal/sync_server/sync.go:44-118``); here the same role is
played by standard Spark sources plus envelope mapping — see
``galaxy_spark.sources.streams`` (streaming),
``galaxy_spark.sources.readers`` (batch/bootstrap), and — the
direct, connector-less tier — ``galaxy_spark.sources.binlog_source``
(the ``galaxy_binlog`` Spark 4 Python streaming DataSource tailing
binlog segment files through the cdc.binlog wire decoder).
"""

from galaxy_spark.sources.readers import (
    jdbc_table_reader,
    read_csv_table,
    read_json_table,
    read_parquet_table,
)
from galaxy_spark.sources.binlog_source import BinlogDataSource
from galaxy_spark.sources.streams import (
    file_envelope_stream,
    kafka_cdc_stream,
    rate_envelope_stream,
)

__all__ = [
    "BinlogDataSource",
    "file_envelope_stream",
    "jdbc_table_reader",
    "kafka_cdc_stream",
    "rate_envelope_stream",
    "read_csv_table",
    "read_json_table",
    "read_parquet_table",
]
