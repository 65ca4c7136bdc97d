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

Layout: ``<path>/<topic>/batch-[<lineage>.]<id>-part-<pid>.jsonl``
— one JSON line per message ({key, value}), grouped by the row's
``topic`` column exactly like Kafka routing. The optional
``lineage`` option (TaskManager passes its checkpoint epoch)
scopes batch names to the checkpoint generation: batchIds restart
at 0 after a checkpoint reset, and without the scope a post-
recovery_v2 query's batch 0 would overwrite and sweep the previous
generation's already-delivered batch-0 files.

Delivery contract (one streaming query per output path — the same
ownership rule as a Kafka topic set):

- ``write`` stages each partition's files under unique ``.tmp-``
  names (unique so a speculative duplicate attempt can never
  interleave with the winner's bytes); ``commit`` — which Spark
  calls only when every partition succeeded — PUBLISHES them by
  ``os.replace`` to the DETERMINISTIC name
  ``batch-<batchId>-part-<partitionId>.jsonl``, so a replayed batch
  overwrites its own prior files instead of publishing a second
  copy under the same batchId.
- After publishing, ``commit`` sweeps the path: stale ``.tmp-``
  litter from crashed/aborted earlier attempts, and any
  ``batch-<batchId>-*`` files NOT republished by this attempt
  (a replay that repartitioned differently supersedes the previous
  attempt's file set wholesale). ``abort`` removes its own staged
  files and sweeps ``.tmp-`` litter too.
- Net guarantee: at-least-once across DIFFERENT batchIds (Spark's
  checkpoint replays an uncommitted batch), exactly-once WITHIN a
  batchId — a downstream consumer dedups on the batchId in the file
  name, the reference's guarantee level (at-least-once + replay
  dedup, ``pkg/shared.go:21``).
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
    """One partition's staged files: [(tmp_path, final_base_name)]
    where final_base_name is ``part-<pid>.jsonl`` — the batchId
    prefix is known only at commit time."""

    renames: list


class TopicFilesStreamWriter(DataSourceStreamWriter):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("galaxy_topic_files requires option 'path'")
        # batchIds restart at 0 per CHECKPOINT: after a checkpoint
        # reset (recovery_v2 bumps the task's checkpoint epoch but
        # keeps the output path), the new query's batch 0 would
        # os.replace / sweep the PREVIOUS epoch's already-delivered
        # batch-0 files. The lineage option scopes every published
        # name (and the sweep) to the checkpoint generation —
        # TaskManager passes its checkpoint epoch; downstream
        # replay-dedup keys on (lineage, batchId).
        self.lineage = options.get("lineage", "")

    def _batch_prefix(self, batchId: int) -> str:
        return (f"batch-{self.lineage}.{batchId}-" if self.lineage
                else f"batch-{batchId}-")

    def write(self, iterator: Iterator[Row]) -> _Staged:
        """Executor-side: group this partition's rows by topic and
        stage one jsonl file per topic. Rows must carry ``topic``,
        ``key``, ``value`` (the routed_messages contract). The
        FINAL name is deterministic per partitionId; the staged
        name keeps a unique suffix so concurrent speculative
        attempts never write the same file."""
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = (f"{ctx.partitionId():05d}" if ctx is not None
               else f"u{uuid.uuid4().hex[:8]}")  # direct (non-Spark) call
        attempt = uuid.uuid4().hex[:8]
        handles: dict[str, tuple] = {}
        for row in iterator:
            topic = row["topic"]
            if topic not in handles:
                d = os.path.join(self.path, topic)
                os.makedirs(d, exist_ok=True)
                base = f"part-{pid}.jsonl"
                tmp = os.path.join(d, f"{base}.tmp-{attempt}")
                handles[topic] = (open(tmp, "w"), base)
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

    def _sweep(self, batch_prefix: str | None = None,
               keep: set | None = None) -> None:
        """Remove ``.tmp-`` litter (crashed/aborted attempts) and,
        when publishing, any ``<batch_prefix>*`` files this attempt
        did not republish (a replay supersedes the prior attempt's
        file set). Driver-side, bounded by topic count."""
        if not os.path.isdir(self.path):
            return
        for topic in os.listdir(self.path):
            d = os.path.join(self.path, topic)
            if not os.path.isdir(d):
                continue
            for name in os.listdir(d):
                full = os.path.join(d, name)
                stale_tmp = ".tmp-" in name and full not in (keep or ())
                superseded = (batch_prefix is not None
                              and name.startswith(batch_prefix)
                              and full not in (keep or ()))
                if stale_tmp or superseded:
                    try:
                        os.remove(full)
                    except OSError:
                        pass

    def commit(self, messages, batchId: int) -> None:
        """Driver-side, called once ALL partitions succeeded:
        publish every staged file under its deterministic
        ``batch-<batchId>-part-<pid>.jsonl`` name (``os.replace``
        overwrites a crashed prior attempt's file of the same
        batch), then sweep litter and superseded same-batch files."""
        published = set()
        prefix = self._batch_prefix(batchId)
        for m in messages:
            if m is None:
                continue
            for tmp, base in m.renames:
                d = os.path.dirname(tmp)
                final = os.path.join(d, f"{prefix}{base}")
                os.replace(tmp, final)
                published.add(final)
        self._sweep(batch_prefix=prefix, keep=published)

    def abort(self, messages, batchId: int) -> None:
        for m in messages or []:
            if m is None:
                continue
            for tmp, _base in m.renames:
                try:
                    os.remove(tmp)
                except OSError:
                    pass
        self._sweep()


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
