"""Exactly-once foreachBatch sink: an epoch-keyed partial store.

Structured Streaming's foreachBatch is AT-LEAST-once: after a crash
between sink write and checkpoint commit, the restarted query
REPLAYS the last epoch with the SAME ``epoch_id``. The reference
gets exactly-once by skipping already-applied positions on replay
(``internal/scheduler/concurrently_manager/
concurrently_task_manager.go:97-120`` — tasks behind the saved
position are dropped). The Spark-side equivalent: key the sink
write by ``epoch_id`` and make applying an epoch idempotent.

``EpochKeyedRollupStore`` persists each micro-batch's PARTIAL
aggregate as one parquet directory ``epoch=<id>`` claimed with an
atomic rename — a replayed epoch finds its directory already
present and is dropped, so merged totals never double-count. The
same pattern backs any idempotent keyed sink (Delta MERGE keyed on
(epoch, key), Kafka transactional producer with the epoch in the
transaction id); parquet-on-POSIX keeps it dependency-free here.

Scale shape: the distributed plan aggregates the batch down to
O(#buckets) partial rows BEFORE the store sees it; the store itself
only ever handles pre-aggregated partials, so a 100 TB stream costs
the store the same bytes as a toy one (buckets, not events).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from galaxy_spark.streaming.rollup import GRAINS, _partial_rollup


class EpochKeyedRollupStore:
    """(grain, bucket_start, event_type) -> [n_events, total_value],
    durably, exactly once per epoch."""

    def __init__(self, path: str) -> None:
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _epoch_dir(self, epoch_id: int) -> str:
        return os.path.join(self.path, f"epoch={epoch_id}")

    def merge(self, pdf, epoch_id: int) -> bool:
        """Apply one epoch's partial aggregate; returns False when
        the epoch was already applied (replay after restart).

        The claim is an atomic directory rename: concurrent/replayed
        writers race on ``os.rename`` and exactly one wins; losers
        (and any later replay) see the directory present and drop
        the batch — the foreachBatch twin of the reference's
        position replay-skip."""
        dest = self._epoch_dir(epoch_id)
        if os.path.exists(dest):
            return False
        import pyarrow as pa
        import pyarrow.parquet as pq

        tmp = f"{dest}.tmp-{uuid.uuid4().hex[:8]}"
        os.makedirs(tmp)
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                       os.path.join(tmp, "part-0.parquet"))
        try:
            os.rename(tmp, dest)
        except OSError:  # lost the race: epoch already claimed
            import shutil
            shutil.rmtree(tmp, ignore_errors=True)
            return False
        return True

    def epochs(self) -> list[int]:
        return sorted(int(d.split("=", 1)[1]) for d in os.listdir(self.path)
                      if d.startswith("epoch=") and ".tmp-" not in d)

    def snapshot(self) -> list[tuple]:
        """Merged totals across all applied epochs (same shape as
        rollup.RollupStore.snapshot)."""
        import pyarrow.parquet as pq

        rows: dict[tuple, list] = {}
        for e in self.epochs():
            t = pq.read_table(os.path.join(self._epoch_dir(e),
                                           "part-0.parquet"))
            for r in t.to_pylist():
                key = (r["grain"], r["bucket_start"], r["event_type"])
                cur = rows.setdefault(key, [0, 0.0])
                cur[0] += int(r["n_events"])
                cur[1] += float(r["total_value"])
        return sorted((g, b, t, n, round(v, 2))
                      for (g, b, t), (n, v) in rows.items())


def start_exactly_once_rollup(stream: DataFrame,
                              store: EpochKeyedRollupStore,
                              checkpoint_dir: str) -> StreamingQuery:
    """Multi-grain rollup (GRAINS per rollup.py) maintained with
    exactly-once semantics: per-batch distributed partial agg ->
    epoch-keyed idempotent merge."""
    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        store.merge(_partial_rollup(batch_df).toPandas(), epoch_id)

    return (stream.writeStream
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(handle).start())
