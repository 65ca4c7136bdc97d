"""Custom stateful streaming operators (applyInPandasWithState).

The reference's only per-key state is the task's binlog position
window (``internal/scheduler/concurrently_manager/
concurrently_task_manager.go:33-120``: record in-flight positions,
mark complete, survive restarts). Structured Streaming subsumes that
with checkpointed offsets; what it does NOT give for free is
*user-defined* per-key running state — this module provides that
surface, the Spark-4 way: Arrow-batched pandas state handlers.

``running_change_totals`` keeps one tiny state row per
(database, table): cumulative change count + last seen log_pos —
i.e., the same bookkeeping the reference's position manager does,
but keyed per table and scaling horizontally (state lives in the
executors' state store, checkpoint-backed, not on one driver
goroutine).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "database string, table string, n_changes bigint, last_pos bigint"
)
STATE_SCHEMA = "n bigint, last_pos bigint"


def _update_totals(key: tuple, pdfs: Iterable[pd.DataFrame],
                   state: GroupState):
    n, last_pos = state.get if state.exists else (0, -1)
    for pdf in pdfs:
        if pdf.empty:
            continue
        n += len(pdf)
        last_pos = max(last_pos, int(pdf["log_pos"].max()))
    state.update((n, last_pos))
    yield pd.DataFrame({
        "database": [key[0]], "table": [key[1]],
        "n_changes": [n], "last_pos": [last_pos],
    })


def running_change_totals(envelope: DataFrame) -> DataFrame:
    """Streaming per-(db, table) cumulative change counts + position
    high-water mark, via applyInPandasWithState.

    Output mode: update (one refreshed row per key per batch).
    State is O(#tables) — constant per key — so the state store
    stays tiny at any event volume; the shuffle is the groupBy key
    only.
    """
    keyed = envelope.select(
        "database", "table",
        F.col("event_header.log_pos").alias("log_pos"),
    ).groupBy("database", "table")
    return keyed.applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 arbitrary-state API)
# ------------------------------------------------------------------

SNAPSHOT_OUTPUT_SCHEMA = (
    "database string, table string, pk bigint, last_pos bigint, "
    "last_value double, is_deleted boolean, n_changes bigint"
)


def snapshot_maintenance(changes: DataFrame) -> DataFrame:
    """Streaming twin of the batch ``cdc_apply_snapshot`` fold:
    maintain the latest-wins row image per (database, table, pk)
    across ALL micro-batches, on the Spark-4 arbitrary-state API
    (``transformWithStateInPandas`` + ValueState) rather than the
    legacy ``applyInPandasWithState`` above — the engine exercises
    both stateful surfaces.

    ``changes`` must carry ``database, table, pk, action, v, pos``
    (the projected-envelope columns ``cdc_apply_snapshot`` derives).
    Emits one refreshed snapshot row per touched key per batch
    (update mode); delete tombstones surface as ``is_deleted`` so a
    downstream sink can drop or retract them. State is ONE tiny
    tuple per live key, partitioned by the group key — the same
    shape, distribution and skew story as the batch fold's exchange,
    but resident in the checkpointed state store.

    Requires ``google.protobuf`` (the transformWithState protocol's
    driver worker) and the RocksDB state store provider; raises a
    clear ImportError up front where the sandbox lacks protobuf
    instead of crashing the streaming query mid-start.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas needs google.protobuf for its "
            "driver worker; install protobuf (absent in this sandbox — "
            "the applyInPandasWithState surface above covers the same "
            "semantics there)") from e
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    class LatestWins(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._latest = handle.getValueState(
                "latest", "pos long, action string, v double, n long")

        def handleInputRows(self, key, rows, timer_values):
            cur = self._latest.get()
            pos, action, v, n = (cur if cur is not None
                                 else (-1, "", 0.0, 0))
            for pdf in rows:
                if pdf.empty:
                    continue
                n += len(pdf)
                i = pdf["pos"].idxmax()
                if int(pdf.at[i, "pos"]) > pos:
                    pos = int(pdf.at[i, "pos"])
                    action = str(pdf.at[i, "action"])
                    v = float(pdf.at[i, "v"])
            self._latest.update((pos, action, v, n))
            yield pd.DataFrame({
                "database": [key[0]], "table": [key[1]], "pk": [key[2]],
                "last_pos": [pos], "last_value": [v],
                "is_deleted": [action == "delete"], "n_changes": [n],
            })

        def close(self) -> None:
            pass

    return (changes.groupBy("database", "table", "pk")
            .transformWithStateInPandas(
                statefulProcessor=LatestWins(),
                outputStructType=SNAPSHOT_OUTPUT_SCHEMA,
                outputMode="Update",
                timeMode="None"))
