"""K1 as a genuine Spark SINK: a Python streaming DataSource writer
routing messages to per-topic directories.

The reference's sink publishes one JSON message per row change to a
Kafka topic named ``<task>.<db>.<table>`` with key ``<db>.<table>``
(``internal/mq_manager/kafka/kafka.go:88-127``). The engine's
production path is Spark's Kafka sink with a ``topic`` column
(streaming/pipeline.py); THIS module is the broker-less twin built
on the Spark 4 Python DataSource WRITER API — the write-side
complement of sources/binlog_source.py — so the full custom-source
surface (reader + writer) is exercised end to end in-sandbox:

    df.writeStream.format("galaxy_topic_files")
      .option("path", out_dir) ...

Layout: ``<path>/<topic>/batch-<id>-part-<uuid>.jsonl`` — one JSON
line per message ({key, value}), grouped by the row's ``topic``
column exactly like Kafka routing. Files land under ``.tmp-`` names
during ``write`` and are PUBLISHED by rename in ``commit`` (which
Spark calls only when every partition succeeded), so readers never
observe a torn batch and an aborted epoch leaves only ``.tmp-``
litter that the next commit sweeps — the same claim discipline as
streaming/state_store.py. Spark's checkpoint gives at-least-once
sink delivery; a replayed batch re-publishes under its batchId, and
because file names carry the batchId a downstream consumer can
dedup on it (the reference's guarantee level: at-least-once +
replay dedup, ``pkg/shared.go:21``).
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql import Row
from pyspark.sql.datasource import (DataSource, DataSourceStreamWriter,
                                    WriterCommitMessage)
from pyspark.sql.types import StructType


@dataclass
class _Staged(WriterCommitMessage):
    """One partition's staged files: [(tmp_path, final_path)]."""

    renames: list


class TopicFilesStreamWriter(DataSourceStreamWriter):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("galaxy_topic_files requires option 'path'")

    def write(self, iterator: Iterator[Row]) -> _Staged:
        """Executor-side: group this partition's rows by topic and
        stage one jsonl file per topic. Rows must carry ``topic``,
        ``key``, ``value`` (the routed_messages contract)."""
        handles: dict[str, tuple] = {}
        part = uuid.uuid4().hex[:8]
        for row in iterator:
            topic = row["topic"]
            if topic not in handles:
                d = os.path.join(self.path, topic)
                os.makedirs(d, exist_ok=True)
                base = os.path.join(d, f"part-{part}.jsonl")
                handles[topic] = (open(f"{base}.tmp-{part}", "w"), base)
            handles[topic][0].write(json.dumps(
                {"key": row["key"], "value": row["value"]},
                sort_keys=True) + "\n")
        renames = []
        for fh, base in handles.values():
            fh.flush()
            os.fsync(fh.fileno())
            fh.close()
            renames.append((fh.name, base))
        return _Staged(renames=renames)

    def commit(self, messages, batchId: int) -> None:
        """Driver-side, called once ALL partitions succeeded:
        publish every staged file with its batch id (rename is the
        atomic claim; a replayed batch overwrites its own files,
        never a different batch's)."""
        for m in messages:
            if m is None:
                continue
            for tmp, base in m.renames:
                d, name = os.path.split(base)
                final = os.path.join(d, f"batch-{batchId}-{name}")
                os.replace(tmp, final)

    def abort(self, messages, batchId: int) -> None:
        for m in messages or []:
            if m is None:
                continue
            for tmp, _base in m.renames:
                try:
                    os.remove(tmp)
                except OSError:
                    pass


class TopicFilesDataSource(DataSource):
    """``spark.dataSource.register(TopicFilesDataSource)`` then
    ``.writeStream.format("galaxy_topic_files").option("path", d)``."""

    @classmethod
    def name(cls) -> str:
        return "galaxy_topic_files"

    def schema(self) -> str:
        return "topic string, key string, value string"

    def streamWriter(self, schema: StructType,
                     overwrite: bool) -> TopicFilesStreamWriter:
        return TopicFilesStreamWriter(self.options)
