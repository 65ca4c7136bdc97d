"""Streaming assembly tests: file-source -> envelope -> filters ->
projections -> memory sink, task lifecycle (stop/recover_v1/
recover_v2/update_filters/boot recovery), windows + watermark dedup.

File sources + ``processAllAvailable()`` drive deterministic
micro-batches without external brokers (the Kafka path differs only
in ``format(...)`` + routing options, which are unit-checked on the
batch plan).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from galaxy_spark.cdc.envelope import EVENT_SOURCE_COLUMNS, envelope_from_events
from galaxy_spark.control.metrics import MetricsListener
from galaxy_spark.control.tasks import TaskManager, TaskSpec
from galaxy_spark.streaming import windows as W
from galaxy_spark.streaming.pipeline import (
    SinkConfig,
    ddl_apply_batch,
    routed_messages,
)
from galaxy_spark.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def events_dir(spark, tmp_path):
    """Materialize sf0.001 events as a streamable parquet dir."""
    out = str(tmp_path / "events_src")
    load_table(spark, SF, "events").write.mode("overwrite").parquet(out)
    return out


def _stream_events(spark, path):
    static = spark.read.parquet(path)
    return spark.readStream.schema(static.schema).parquet(path)


def _source_factory(path):
    def factory(spark, spec):
        return envelope_from_events(_stream_events(spark, path))
    return factory


def _batch_expected(spark, flt):
    env = envelope_from_events(load_table(spark, SF, "events"))
    return flt.apply(env).count()


def test_cdc_pipeline_end_to_end(spark, events_dir, tmp_path):
    """Streaming result == batch result for the same envelope plan."""
    spec = TaskSpec(
        task_id="t_e2e",
        databases=("db0", "db1"),
        tables=("db0.*", "db1.click"),
        columns=EVENT_SOURCE_COLUMNS,
        sink_kind="memory",
    )
    mgr = TaskManager(spark, str(tmp_path / "state"), _source_factory(events_dir))
    mgr.create_task(spec)
    mgr.await_all()

    got = spark.sql("SELECT * FROM t_e2e")
    n_stream = got.count()
    n_batch = _batch_expected(spark, spec.task_filter())
    assert n_stream == n_batch > 0

    # K1 routing: topic <task>.<db>.<table>, key <db>.<table>
    row = got.limit(1).collect()[0]
    assert row["topic"].startswith("t_e2e.db")
    db, table = row["key"].split(".")
    assert row["topic"] == f"t_e2e.{db}.{table}"
    payload = json.loads(row["value"])
    assert payload["action"] in ("insert", "update", "delete")
    if payload["action"] == "insert":
        assert set(payload["after"]) == set(EVENT_SOURCE_COLUMNS)
        assert "before" not in payload or payload["before"] is None
    mgr.stop_task("t_e2e")


def test_task_lifecycle_stop_recover(spark, events_dir, tmp_path):
    # parquet sink: supports checkpoint recovery (memory sink doesn't,
    # matching production where the sink is Kafka)
    state = str(tmp_path / "state")
    mgr = TaskManager(spark, state, _source_factory(events_dir))
    spec = TaskSpec(task_id="t_lc", columns=EVENT_SOURCE_COLUMNS,
                    sink_kind="parquet",
                    sink_options={"path": str(tmp_path / "out_lc")})
    mgr.create_task(spec)
    mgr.await_all()
    assert mgr.status()["t_lc"]["active"]

    mgr.stop_task("t_lc")
    assert not mgr.status()["t_lc"]["active"]
    assert mgr.tasks["t_lc"].stopped

    # recovery_v1: same checkpoint -> no reprocessing of seen files
    ckpt_before = mgr.checkpoint_dir(mgr.tasks["t_lc"])
    mgr.recover_v1("t_lc")
    assert mgr.checkpoint_dir(mgr.tasks["t_lc"]) == ckpt_before
    mgr.await_all()
    assert mgr.status()["t_lc"]["active"]

    # recovery_v2: fresh checkpoint epoch
    mgr.recover_v2("t_lc")
    assert mgr.checkpoint_dir(mgr.tasks["t_lc"]) != ckpt_before
    mgr.await_all()
    mgr.stop_task("t_lc")


def test_boot_recovery_restarts_only_non_stopped(spark, events_dir, tmp_path):
    state = str(tmp_path / "state")
    mgr = TaskManager(spark, state, _source_factory(events_dir))
    mgr.create_task(TaskSpec(task_id="t_run", columns=EVENT_SOURCE_COLUMNS,
                             sink_kind="parquet",
                             sink_options={"path": str(tmp_path / "out_run")}))
    mgr.create_task(TaskSpec(task_id="t_stopped", columns=EVENT_SOURCE_COLUMNS,
                             sink_kind="parquet",
                             sink_options={"path": str(tmp_path / "out_stop")}))
    mgr.await_all()
    mgr.stop_task("t_stopped")
    mgr.stop_task("t_run")
    mgr.tasks["t_run"].stopped = False   # simulate crash while running
    mgr._persist()

    mgr2 = TaskManager(spark, state, _source_factory(events_dir))
    started = mgr2.recover_all()
    assert started == ["t_run"]
    mgr2.await_all()
    mgr2.stop_task("t_run")


def test_update_filters_restarts_with_new_predicate(spark, events_dir, tmp_path):
    mgr = TaskManager(spark, str(tmp_path / "state"), _source_factory(events_dir))
    spec = TaskSpec(task_id="t_upd", columns=EVENT_SOURCE_COLUMNS,
                    sink_kind="parquet",
                    sink_options={"path": str(tmp_path / "out_upd")},
                    databases=("db0",))
    mgr.create_task(spec)
    mgr.await_all()
    mgr.update_filters("t_upd", databases=("db0", "db1", "db2"))
    assert mgr.tasks["t_upd"].databases == ("db0", "db1", "db2")
    mgr.await_all()
    assert mgr.status()["t_upd"]["active"]
    mgr.stop_task("t_upd")


def test_streaming_tumbling_window_matches_batch(spark, events_dir):
    stream = _stream_events(spark, events_dir)
    agg = W.tumbling(stream, "ts", "1 hour", "event_type", watermark="1 hour")
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName("win_out").start())
    q.processAllAvailable()
    q.stop()
    got = spark.sql(
        "SELECT window.start AS ws, event_type, n_events FROM win_out")
    exp = (load_table(spark, SF, "events")
           .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
           .agg(F.count("*").alias("n_events"))
           .select(F.col("w.start").alias("ws"), "event_type", "n_events"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_streaming_session_window_runs(spark, events_dir):
    stream = _stream_events(spark, events_dir)
    agg = W.session(stream, "ts", "30 minutes", "user_id", watermark="1 hour")
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName("sess_out").start())
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT user_id, n_events FROM sess_out")
    # session count must match the batch gaps-and-islands twin
    from galaxy_spark.registry import all_queries
    exp_sessions = all_queries()["events_sessionization"](spark, SF).count()
    assert got.count() == exp_sessions


def test_streaming_dedup_within_watermark(spark, tmp_path):
    src_dir = str(tmp_path / "dup_src")
    ev = load_table(spark, SF, "events").limit(200)
    dup = ev.unionAll(ev)  # every event twice
    dup.write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(dup.schema).parquet(src_dir)
    deduped = W.dedup_within_watermark(stream, ["event_id"], "ts", "1 hour")
    q = (deduped.writeStream.outputMode("append").format("memory")
         .queryName("dedup_out").start())
    q.processAllAvailable()
    q.stop()
    assert spark.sql("SELECT count(*) c FROM dedup_out").collect()[0]["c"] == 200


def test_ddl_foreach_batch_applies_to_registry(spark):
    from galaxy_spark.cdc.schema_registry import ColumnDef, SchemaRegistry
    reg = SchemaRegistry()
    reg.put("db0", "click", [ColumnDef("event_id", "bigint"),
                             ColumnDef("value", "double")])
    handler = ddl_apply_batch(reg, "db0")
    batch = spark.createDataFrame(
        [("db0", "alter table click add user_id bigint null after event_id"),
         ("db0", "BEGIN"),
         ("db0", "alter table click drop column value")],
        "database string, query string")
    handler(batch, epoch_id=0)
    assert reg.column_names("db0", "click") == ["event_id", "user_id"]


def test_metrics_listener(spark, events_dir):
    listener = MetricsListener()
    spark.streams.addListener(listener)
    try:
        from galaxy_spark.cdc.filters import TaskFilter
        from galaxy_spark.streaming.pipeline import transform_envelope
        env = envelope_from_events(_stream_events(spark, events_dir))
        projected = transform_envelope(env, TaskFilter(), EVENT_SOURCE_COLUMNS)
        msgs = routed_messages(projected, "t_metrics")
        q = (msgs.writeStream.outputMode("append").format("memory")
             .queryName("metrics_out").start())
        q.processAllAvailable()
        q.stop()
        # listener events arrive on an async bus; poll briefly
        import time
        text = ""
        for _ in range(40):
            text = listener.render_prometheus()
            if 'query="metrics_out"' in text:
                break
            time.sleep(0.25)
        assert "galaxy_stream_batches_total" in text
        assert 'query="metrics_out"' in text
    finally:
        spark.streams.removeListener(listener)


def test_sink_mux_unimplemented_kinds_raise(spark):
    from galaxy_spark.streaming.pipeline import SinkConfig
    with pytest.raises(NotImplementedError):
        SinkConfig("nsq").apply(None, "x")
    with pytest.raises(NotImplementedError):
        SinkConfig("es").apply(None, "x")
    with pytest.raises(NotImplementedError):
        SinkConfig("mongodb").apply(None, "x")


def test_stateful_running_totals(spark, events_dir):
    """applyInPandasWithState cumulative per-(db,table) counts must
    equal the batch groupBy at end of stream."""
    from galaxy_spark.streaming.stateful import running_change_totals

    env = envelope_from_events(_stream_events(spark, events_dir))
    q = (running_change_totals(env)
         .writeStream.outputMode("update").format("memory")
         .queryName("state_out").start())
    q.processAllAvailable()
    q.stop()
    # update mode emits one row per key per batch; last row per key wins
    got = spark.sql("""
        SELECT database, table, n_changes, last_pos FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY database, table
                                         ORDER BY n_changes DESC) rk
            FROM state_out) WHERE rk = 1
    """)
    exp = (envelope_from_events(load_table(spark, SF, "events"))
           .groupBy("database", "table")
           .agg(F.count("*").alias("n_changes"),
                F.max("event_header.log_pos").alias("last_pos")))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_stream_stream_join_within_interval(spark, events_dir, tmp_path):
    """Watermarked stream-stream inner join: click events joined to
    the same user's purchase events within 1 hour — state on both
    sides is bounded by the watermark + time-range condition."""
    schema = spark.read.parquet(events_dir).schema
    clicks = (spark.readStream.schema(schema).parquet(events_dir)
              .filter(F.col("event_type") == "click")
              .selectExpr("user_id", "ts AS click_ts",
                          "event_id AS click_id")
              .withWatermark("click_ts", "1 hour"))
    buys = (spark.readStream.schema(schema).parquet(events_dir)
            .filter(F.col("event_type") == "purchase")
            .selectExpr("user_id AS b_user_id", "ts AS buy_ts",
                        "event_id AS buy_id")
            .withWatermark("buy_ts", "1 hour"))
    joined = clicks.join(
        buys,
        F.expr("""user_id = b_user_id AND
                  buy_ts BETWEEN click_ts AND click_ts + INTERVAL 1 HOUR"""),
    ).select("user_id", "click_id", "buy_id")
    q = (joined.writeStream.outputMode("append").format("memory")
         .queryName("ssj_out").start())
    q.processAllAvailable()
    q.stop()

    ev = load_table(spark, SF, "events")
    c = ev.filter(F.col("event_type") == "click") \
          .selectExpr("user_id", "ts AS click_ts", "event_id AS click_id")
    b = ev.filter(F.col("event_type") == "purchase") \
          .selectExpr("user_id AS b_user_id", "ts AS buy_ts",
                      "event_id AS buy_id")
    exp = c.join(b, F.expr(
        """user_id = b_user_id AND
           buy_ts BETWEEN click_ts AND click_ts + INTERVAL 1 HOUR"""
    )).select("user_id", "click_id", "buy_id")
    got = spark.sql("SELECT user_id, click_id, buy_id FROM ssj_out")
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, exp.collect()))
    assert got.count() > 0


def test_quarantine_malformed_rows(spark):
    """Arity-mismatched rows are flagged, not fatal (divergence from
    the reference, which errors out: process.go:120-122,190-192 —
    documented in galaxy_spark.cdc.projections)."""
    from galaxy_spark.cdc.projections import project_changes

    rows = [
        # good insert: 3 values for 3 columns
        ("db0", "click", "insert", [["1", "10", "0.5"]]),
        # bad insert: arity 2 != 3
        ("db0", "click", "insert", [["2", "11"]]),
        # bad update: only one row in the pair
        ("db0", "click", "update", [["3", "12", "0.7"]]),
        # good update
        ("db0", "click", "update", [["4", "13", "0.1"], ["4", "13", "0.9"]]),
    ]
    df = spark.createDataFrame(
        rows, "database string, table string, action string, "
              "org_row array<array<string>>")
    out = project_changes(df, ("event_id", "user_id", "value"))
    got = {r.org_row[0][0]: r for r in out.collect()}
    assert not got["1"].quarantined and got["1"].after["value"] == "0.5"
    assert got["2"].quarantined and got["2"].after is None
    assert got["3"].quarantined
    assert not got["4"].quarantined
    assert got["4"].before["value"] == "0.1" and got["4"].after["value"] == "0.9"
    # the stream survives: quarantined rows are routable, not thrown
    assert out.count() == 4


def test_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode windowed agg with watermark: rows arriving after
    the watermark passed their window are DROPPED (late-data
    semantics), not silently merged."""
    import datetime as dt
    src = str(tmp_path / "late_src")
    schema = "event_id long, ts timestamp, value double"

    def write_batch(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("append").parquet(src)

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    # batch 1: events in hour 0 and hour 6 -> watermark advances to
    # max_ts - 1h = 05:00, far past hour 0's window end (01:00)
    write_batch([(1, t0, 1.0),
                 (2, t0 + dt.timedelta(hours=6), 1.0)], "b1")

    stream = spark.readStream.schema(schema).parquet(src)
    agg = (stream.withWatermark("ts", "1 hour")
           .groupBy(F.window("ts", "1 hour").alias("w"))
           .agg(F.count("*").alias("n")))
    q = (agg.writeStream.outputMode("append").format("memory")
         .queryName("late_out").start())
    q.processAllAvailable()
    # batch 2: a LATE row for hour 0 (watermark is already 05:00)
    write_batch([(3, t0 + dt.timedelta(minutes=30), 1.0)], "b2")
    q.processAllAvailable()
    # batch 3: advance watermark past hour 6 so its window emits too
    write_batch([(4, t0 + dt.timedelta(hours=12), 1.0)], "b3")
    q.processAllAvailable()
    q.stop()

    got = {r.ws: r.n for r in spark.sql(
        "SELECT w.start AS ws, n FROM late_out").collect()}
    # hour-0 window emitted with ONLY the on-time row; the late row
    # (event 3) was dropped, not added
    assert got[t0] == 1
    assert got[t0 + dt.timedelta(hours=6)] == 1


def test_incremental_rollup_matches_batch(spark, events_dir, tmp_path):
    """foreachBatch-maintained continuous aggregate == one-shot
    batch aggregation over the same data."""
    from galaxy_spark.streaming.rollup import (
        RollupStore,
        start_incremental_rollup,
    )

    stream = _stream_events(spark, events_dir)
    store = RollupStore()
    q = start_incremental_rollup(stream, store,
                                 str(tmp_path / "rollup_ckpt"))
    q.processAllAvailable()
    q.stop()

    ev = load_table(spark, SF, "events")
    exp = sorted(
        (r.grain, r.bucket_start, r.event_type, r.n_events,
         round(r.total_value, 2))
        for g in ("hour", "day")
        for r in (ev.groupBy(F.lit(g).alias("grain"),
                             F.date_trunc(g, "ts").alias("bucket_start"),
                             "event_type")
                  .agg(F.count("*").alias("n_events"),
                       F.sum("value").alias("total_value"))).collect())
    assert store.snapshot() == exp


def test_exactly_once_rollup_survives_epoch_replay(spark, events_dir,
                                                   tmp_path):
    """foreachBatch is at-least-once: force Spark to REPLAY the last
    epoch (drop its commit marker, restart from the same checkpoint)
    and prove the epoch-keyed store does not double-count — the
    replay-skip guarantee the reference gets from its saved-position
    check (concurrently_task_manager.go:97-120)."""
    import os

    from galaxy_spark.streaming.exactly_once import (
        EpochKeyedRollupStore,
        start_exactly_once_rollup,
    )

    ckpt = str(tmp_path / "eo_ckpt")
    store = EpochKeyedRollupStore(str(tmp_path / "eo_store"))
    q = start_exactly_once_rollup(_stream_events(spark, events_dir),
                                  store, ckpt)
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    first = store.snapshot()
    epochs = store.epochs()
    assert first and epochs

    # simulate the crash window: sink write landed, checkpoint commit
    # didn't -> on restart Spark re-runs the batch with the SAME epoch.
    # Hadoop's local FS keeps a .<name>.crc checksum sidecar next to
    # each commit marker; a real crash loses both, and leaving the
    # sidecar makes the replayed commit's rename die with
    # FileAlreadyExistsException — so remove the pair.
    commits_dir = os.path.join(ckpt, "commits")
    last = [c for c in sorted(os.listdir(commits_dir))
            if not c.startswith(".")][-1]
    os.remove(os.path.join(commits_dir, last))
    crc = os.path.join(commits_dir, f".{last}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    q2 = start_exactly_once_rollup(_stream_events(spark, events_dir),
                                   store, ckpt)
    q2.processAllAvailable()
    q2.stop()
    q2.awaitTermination(30)

    assert store.epochs() == epochs, "replay must not mint new epochs"
    assert store.snapshot() == first, "replayed epoch double-counted"

    # direct idempotence: merging the same epoch twice is a no-op
    import pandas as pd
    pdf = pd.DataFrame({"grain": ["hour"], "bucket_start": [None],
                        "event_type": ["x"], "n_events": [1],
                        "total_value": [1.0]})
    fresh = EpochKeyedRollupStore(str(tmp_path / "eo_store2"))
    assert fresh.merge(pdf, 0) is True
    assert fresh.merge(pdf, 0) is False
    assert fresh.snapshot()[0][3] == 1


def test_exactly_once_store_rejects_foreign_lineage(spark, events_dir,
                                                    tmp_path):
    """Spark epoch ids restart at 0 per checkpoint, so pointing a
    FRESH checkpoint at a used store would silently drop live
    batches as 'replays'. The sink must fail loudly instead."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from galaxy_spark.streaming.exactly_once import (
        EpochKeyedRollupStore,
        start_exactly_once_rollup,
    )

    store = EpochKeyedRollupStore(str(tmp_path / "eo_store"))
    q = start_exactly_once_rollup(_stream_events(spark, events_dir),
                                  store, str(tmp_path / "ckpt_a"))
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    assert store.epochs()

    q2 = start_exactly_once_rollup(_stream_events(spark, events_dir),
                                   store, str(tmp_path / "ckpt_b"))
    with pytest.raises(StreamingQueryException, match="lineage"):
        q2.processAllAvailable()
        q2.awaitTermination(30)
    q2.stop()


def test_exactly_once_store_sweeps_orphan_tmp_dirs(tmp_path):
    """A crash between the tmp write and the claiming rename leaves
    an unclaimed *.tmp-* dir; construction (= restart) sweeps it and
    the epoch stays claimable."""
    import os

    import pandas as pd

    from galaxy_spark.streaming.exactly_once import EpochKeyedRollupStore

    path = str(tmp_path / "eo_store")
    orphan = os.path.join(path, "epoch=0.tmp-deadbeef")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-0.parquet"), "wb") as f:
        f.write(b"torn")

    store = EpochKeyedRollupStore(path)
    assert not os.path.exists(orphan)
    assert store.epochs() == []

    pdf = pd.DataFrame({"grain": ["hour"], "bucket_start": [None],
                        "event_type": ["x"], "n_events": [1],
                        "total_value": [1.0]})
    assert store.merge(pdf, 0, lineage="aaaa0000") is True
    assert store.merge(pdf, 0, lineage="aaaa0000") is False
    assert store.lineages() == {"aaaa0000"}


def test_live_filter_update_no_restart(spark, tmp_path):
    """VERDICT r4 #8 / reference ``update_task.go:150-197``: flip an
    include list MID-STREAM and the change applies on the next
    micro-batch with NO query restart — same query id, same runId,
    offsets/state untouched. Batch 1 flows under databases=('db0',);
    after the swap to ('db1',) batch 2's db0 rows are dropped and
    its db1 rows pass — both proving the swap took effect live."""
    from galaxy_spark.streaming.pipeline import live_memory_rows

    src = str(tmp_path / "live_src")
    ev = load_table(spark, SF, "events")
    # batch 1: the first 100 events
    ev.filter(F.col("event_id") < 100).write.mode("overwrite").parquet(src)
    mgr = TaskManager(spark, str(tmp_path / "state"),
                      _source_factory(src))
    spec = TaskSpec(task_id="t_live", columns=EVENT_SOURCE_COLUMNS,
                    sink_kind="memory", databases=("db0",), live=True)
    mgr.create_task(spec)
    q = mgr.queries["t_live"]
    q.processAllAvailable()
    qid, run_id = q.id, q.runId

    rows1 = live_memory_rows("t_live")
    assert rows1 and all(r.topic.startswith("t_live.db0.") for r in rows1)
    n1 = len(rows1)

    # live swap: db0 -> db1 (no restart anywhere in this path)
    mgr.update_filters("t_live", databases=("db1",))
    # batch 2: the next 100 events land as a new file
    ev.filter(F.col("event_id").between(100, 199)) \
        .write.mode("append").parquet(src)
    q.processAllAvailable()

    assert mgr.queries["t_live"] is q          # same query object
    assert (q.id, q.runId) == (qid, run_id)    # never restarted
    assert q.isActive
    rows2 = live_memory_rows("t_live")[n1:]
    assert rows2, "batch 2 produced no rows"
    assert all(r.topic.startswith("t_live.db1.") for r in rows2)
    # db0 events exist in batch 2's id range but were filtered live
    env = envelope_from_events(ev.filter(F.col("event_id").between(100, 199)))
    assert env.filter(F.col("database") == "db0").count() > 0
    n_db1 = env.filter(F.col("database") == "db1").count()
    assert len(rows2) == n_db1                 # exactly the db1 rows
    mgr.stop_task("t_live")


def test_live_task_survives_filter_identity_update(spark, tmp_path):
    """Updating a live task's filter to the SAME value is a no-op
    that must not disturb the stream (regression guard for the
    restart-path fallthrough)."""
    src = str(tmp_path / "live_src2")
    load_table(spark, SF, "events").limit(50) \
        .write.mode("overwrite").parquet(src)
    mgr = TaskManager(spark, str(tmp_path / "state2"),
                      _source_factory(src))
    mgr.create_task(TaskSpec(task_id="t_live2",
                             columns=EVENT_SOURCE_COLUMNS,
                             sink_kind="memory", live=True))
    q = mgr.queries["t_live2"]
    q.processAllAvailable()
    run_id = q.runId
    mgr.update_filters("t_live2", databases=())
    q.processAllAvailable()
    assert q.runId == run_id and q.isActive
    mgr.stop_task("t_live2")


def test_incremental_dedup_suppresses_cross_batch_duplicates(spark, tmp_path):
    """Streaming exact dedup must remember history ACROSS
    micro-batches: batch 2 re-sends half of batch 1's documents plus
    new ones; only the new ones may come out."""
    src_dir = tmp_path / "docs_src"
    src_dir.mkdir()
    docs = load_table(spark, SF, "documents").limit(60).cache()
    b1 = docs.filter("doc_id < 40")
    b1.write.parquet(str(src_dir / "b1"))

    stream = spark.readStream.schema(docs.schema).parquet(
        str(src_dir) + "/*")
    out = W.incremental_exact_dedup(stream)
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("inc_dedup").start())
    try:
        q.processAllAvailable()
        n1 = spark.sql("SELECT count(DISTINCT digest) c FROM inc_dedup") \
            .collect()[0]["c"]
        # batch 2: doc_ids 20-59 — 20 repeats of batch 1 + 20 new
        docs.filter("doc_id >= 20").write.parquet(str(src_dir / "b2"))
        q.processAllAvailable()
        rows = spark.sql("SELECT digest, count(*) n FROM inc_dedup "
                         "GROUP BY digest").collect()
    finally:
        q.stop()
    # every digest exactly once, even though 20 docs were re-sent
    assert all(r.n == 1 for r in rows)
    exact = b1.unionAll(docs.filter("doc_id >= 20")) \
        .selectExpr("sha2(cast(text AS string), 256) d").distinct().count()
    assert len(rows) == exact
    assert n1 <= len(rows)
    docs.unpersist()


def test_transform_with_state_snapshot_matches_batch_fold(spark, tmp_path):
    """Spark-4 arbitrary-state surface (transformWithStateInPandas):
    the streaming latest-wins snapshot over two micro-batches must
    agree key-for-key with the batch cdc_apply_snapshot fold over
    the same events (deletes tombstoned, positions/values/counts
    equal).

    SKIPS in this sandbox: the transformWithState protocol runs a
    protobuf-based driver worker and ``google.protobuf`` is not
    installed here (pip is unavailable). The operator is still the
    committed cluster path; the same latest-wins semantics are
    exercised end-to-end through the legacy applyInPandasWithState
    surface (test_stateful_running_totals) and the batch fold's
    oracle row (cdc_apply_snapshot)."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState driver worker needs protobuf; "
               "absent in this container")
    from galaxy_spark.cdc.envelope import (EVENT_SOURCE_COLUMNS,
                                           envelope_from_events)
    from galaxy_spark.cdc.projections import project_changes
    from galaxy_spark.streaming.stateful import snapshot_maintenance

    def project(env):
        proj = project_changes(env, EVENT_SOURCE_COLUMNS)
        img = F.coalesce(F.col("after"), F.col("before"))
        return proj.select(
            "database", "table", "action",
            F.element_at(img, "user_id").cast("long").alias("pk"),
            F.element_at(img, "value").cast("double").alias("v"),
            F.col("event_header.log_pos").alias("pos"))

    src = tmp_path / "env_src"
    src.mkdir()
    ev = load_table(spark, SF, "events").limit(300).cache()
    ev.filter("event_id % 2 = 0").write.parquet(str(src / "b1"))

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass",
                          None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    try:
        raw = spark.readStream.schema(ev.schema).parquet(str(src) + "/*")
        out = snapshot_maintenance(project(envelope_from_events(raw)))
        q = (out.writeStream.outputMode("update").format("memory")
             .queryName("tws_snap")
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .start())
        try:
            q.processAllAvailable()
            ev.filter("event_id % 2 = 1").write.parquet(str(src / "b2"))
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev)

    # latest emitted row per key = the one with the max n_changes
    # (monotone per key); drop tombstoned keys
    stream_rows = spark.sql("""
        SELECT database, table, pk, last_pos, last_value, n_changes
        FROM (SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY database, table, pk
                  ORDER BY n_changes DESC) rn
              FROM tws_snap) WHERE rn = 1 AND NOT is_deleted
    """).collect()

    batch = (project(envelope_from_events(ev))
             .groupBy("database", "table", "pk")
             .agg(F.max_by("action", "pos").alias("last_action"),
                  F.max_by("v", "pos").alias("last_value"),
                  F.max("pos").alias("last_pos"),
                  F.count("*").alias("n_changes"))
             .filter(F.col("last_action") != "delete")).collect()

    key = lambda r: (r.database, r["table"], r.pk)
    s = {key(r): (r.last_pos, r.last_value, r.n_changes)
         for r in stream_rows}
    b = {key(r): (r.last_pos, r.last_value, r.n_changes) for r in batch}
    assert s == b
    ev.unpersist()


def test_snapshot_maintenance_gate_raises_cleanly_without_protobuf(spark):
    """Where protobuf is absent the operator must fail fast with an
    actionable message, not crash the query mid-start."""
    try:
        from google.protobuf import descriptor  # noqa: F401
        pytest.skip("protobuf present; gate not exercised")
    except ImportError:
        pass
    from galaxy_spark.streaming.stateful import snapshot_maintenance
    df = spark.createDataFrame(
        [("db0", "click", 1, "insert", 1.0, 1)],
        "database string, table string, pk long, action string, "
        "v double, pos long")
    with pytest.raises(ImportError, match="protobuf"):
        snapshot_maintenance(df)


def test_stream_static_bloom_gate_matches_batch(spark, tmp_path):
    """Stream-static join: a document stream probes the STATIC
    Bloom position set built from the reference sources — the
    streaming twin of dedup_bloom_reference (same positions, same
    all-k fold), and the missing stream⋈static member next to the
    stream-stream join test. The static side re-resolves per
    micro-batch, so on a cluster a refreshed filter table is picked
    up without restarting the query."""
    from galaxy_spark.queries.indexing import (_BLOOM_K, _bloom_positions,
                                               dedup_bloom_reference)

    src_dir = str(tmp_path / "docs_src")
    docs = load_table(spark, SF, "documents")
    docs.write.mode("overwrite").parquet(src_dir)

    is_ref = F.col("source").isin("src0", "src1", "src2", "src3", "src4")
    ref_bits = (docs.filter(is_ref)
                .select(F.explode(_bloom_positions(F.col("text")))
                        .alias("pos"))
                .distinct().withColumn("hit", F.lit(1)))

    stream = spark.readStream.schema(docs.schema).parquet(src_dir)
    flags = (stream
             .select("doc_id",
                     F.explode(_bloom_positions(F.col("text"))).alias("pos"))
             .join(F.broadcast(ref_bits), "pos", "left")
             .groupBy("doc_id")
             .agg((F.count("hit") == _BLOOM_K).alias("bloom_hit")))
    q = (flags.writeStream.outputMode("complete").format("memory")
         .queryName("bloom_stream").start())
    q.processAllAvailable()
    q.stop()

    got = {(r.doc_id, r.bloom_hit)
           for r in spark.sql("SELECT * FROM bloom_stream").collect()}
    want = {(r.doc_id, r.bloom_hit)
            for r in dedup_bloom_reference(spark, SF).collect()}
    assert got == want and any(h for _, h in want)


def test_incremental_snapshot_matches_batch(spark, events_dir, tmp_path):
    """Streaming latest-wins snapshot fold (foreachBatch, per-batch
    partials merged into a keyed store) must end at EXACTLY the
    rows the batch cdc_apply_snapshot query computes over the same
    changelog — the continuous-aggregate guarantee, applied to the
    reference's canonical downstream consumer."""
    from galaxy_spark.queries.cdc import (cdc_apply_snapshot,
                                          snapshot_change_frame)
    from galaxy_spark.streaming.snapshot import (SnapshotStore,
                                                 start_incremental_snapshot)

    changes = snapshot_change_frame(
        envelope_from_events(_stream_events(spark, events_dir)))
    store = SnapshotStore()
    q = start_incremental_snapshot(
        changes, store, str(tmp_path / "snap_ckpt"))
    q.processAllAvailable()
    q.stop()

    got = store.snapshot()
    want = sorted(
        (r.database, r["table"], r.pk, r.last_value, r.last_pos,
         r.n_changes)
        for r in cdc_apply_snapshot(spark, SF).collect())
    assert got == want
    assert len(want) > 50


def test_parquet_snapshot_store_matches_batch_and_stays_off_driver(
        spark, events_dir, tmp_path):
    """The DEFAULT durable snapshot backend (bucketed parquet MERGE,
    state_store.ParquetSnapshotStore) must end at exactly the batch
    cdc_apply_snapshot rows — and the accumulated state must live in
    FILES, not in any driver-side Python container: the store object
    holds only session/path/config metadata, while every state row
    is readable from the bucket dirs with plain pyarrow."""
    import glob

    import pyarrow.parquet as pq

    from galaxy_spark.queries.cdc import (cdc_apply_snapshot,
                                          snapshot_change_frame)
    from galaxy_spark.streaming.state_store import (
        ParquetSnapshotStore, start_incremental_snapshot_parquet)

    changes = snapshot_change_frame(
        envelope_from_events(_stream_events(spark, events_dir)))
    store = ParquetSnapshotStore(spark, str(tmp_path / "snap_store"))
    q = start_incremental_snapshot_parquet(
        changes, store, str(tmp_path / "snap_ckpt"))
    q.processAllAvailable()
    q.stop()

    want = sorted(
        (r.database, r["table"], r.pk, r.last_value, r.last_pos,
         r.n_changes)
        for r in cdc_apply_snapshot(spark, SF).collect())
    assert store.snapshot() == want
    assert len(want) > 50

    # off-driver: no attribute of the store scales with key count
    for name, val in vars(store).items():
        assert not isinstance(val, dict), name
        if isinstance(val, (list, set, tuple)):
            assert len(val) <= 8, (name, len(val))  # key_cols/aggs
    # ...and the full state is in parquet files (incl. tombstones)
    files = glob.glob(f"{store.path}/bucket-*/v-*/part-*.parquet")
    n_file_rows = sum(pq.read_table(f).num_rows for f in files)
    n_all_keys = (cdc_apply_snapshot.__globals__["snapshot_change_frame"](
        envelope_from_events(load_table(spark, SF, "events")))
        .select("database", "table", "pk").distinct().count())
    assert n_file_rows == n_all_keys > len(want)


def test_parquet_store_epoch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-applying the SAME epoch key
    must be a no-op (the per-bucket _COMMITTED claim), while a new
    epoch key folds in — so the non-idempotent n_changes counter
    never double-counts on replay."""
    from galaxy_spark.streaming.state_store import ParquetSnapshotStore

    store = ParquetSnapshotStore(spark, str(tmp_path / "st"),
                                 n_buckets=4)

    def partial(rows):
        return spark.createDataFrame(
            rows, "database string, `table` string, pk long, "
                  "last_action string, last_value double, "
                  "last_pos long, n_changes long")

    p0 = partial([("d", "t", 1, "insert", 1.0, 10, 1),
                  ("d", "t", 2, "insert", 2.0, 11, 1)])
    store.merge(p0, "lin.000000000000")
    store.merge(p0, "lin.000000000000")  # replayed epoch: dropped
    assert store.snapshot() == [("d", "t", 1, 1.0, 10, 1),
                                ("d", "t", 2, 2.0, 11, 1)]

    p1 = partial([("d", "t", 1, "update", 5.0, 20, 2)])
    store.merge(p1, "lin.000000000001")
    assert store.snapshot() == [("d", "t", 1, 5.0, 20, 3),
                                ("d", "t", 2, 2.0, 11, 1)]
    # stale-position partial arriving later: count folds, value wins
    # by position, not arrival order (latest-wins monoid)
    p2 = partial([("d", "t", 1, "update", 9.0, 15, 1)])
    store.merge(p2, "lin.000000000002")
    assert store.snapshot() == [("d", "t", 1, 5.0, 20, 4),
                                ("d", "t", 2, 2.0, 11, 1)]


def test_parquet_store_merge_rewrites_only_touched_buckets(
        spark, tmp_path):
    """Copy-on-write MERGE shape: an epoch touching one key rewrites
    ONLY that key's bucket; every other bucket keeps its prior
    version dir untouched — the property that keeps per-batch cost
    proportional to the batch at 100 TB state."""
    from galaxy_spark.streaming.state_store import ParquetSnapshotStore

    store = ParquetSnapshotStore(spark, str(tmp_path / "st"),
                                 n_buckets=4)
    wide = spark.createDataFrame(
        [("d", "t", pk, "insert", float(pk), pk, 1)
         for pk in range(40)],
        "database string, `table` string, pk long, last_action string,"
        " last_value double, last_pos long, n_changes long")
    store.merge(wide, "lin.000000000000")
    before = {b: store._versions(int(b.split("-")[1]))
              for b in os.listdir(store.path) if b.startswith("bucket-")}
    assert len(before) == 4  # 40 keys cover all 4 buckets

    one = wide.filter(F.col("pk") == 7) \
        .withColumn("last_pos", F.lit(100).cast("long"))
    store.merge(one, "lin.000000000001")
    after = {b: store._versions(int(b.split("-")[1]))
             for b in os.listdir(store.path) if b.startswith("bucket-")}
    changed = [b for b in before if after[b] != before[b]]
    assert len(changed) == 1  # pk=7's bucket, vacuumed + new version
    assert after[changed[0]] == ["v-lin.000000000001"]
    for b in before:
        if b != changed[0]:
            assert after[b] == before[b] == ["v-lin.000000000000"]


def test_parquet_rollup_store_matches_batch(spark, events_dir, tmp_path):
    """Durable continuous-aggregate backend == one-shot batch
    aggregation (the same pin as the dict-store twin, now with the
    accumulated buckets in executor-written parquet)."""
    from galaxy_spark.streaming.state_store import (
        ParquetRollupStore, start_incremental_rollup_parquet)

    stream = _stream_events(spark, events_dir)
    store = ParquetRollupStore(spark, str(tmp_path / "roll_store"))
    q = start_incremental_rollup_parquet(
        stream, store, str(tmp_path / "roll_ckpt"))
    q.processAllAvailable()
    q.stop()

    ev = load_table(spark, SF, "events")
    exp = sorted(
        (r.grain, r.bucket_start, r.event_type, r.n_events,
         round(r.total_value, 2))
        for g in ("hour", "day")
        for r in (ev.groupBy(F.lit(g).alias("grain"),
                             F.date_trunc(g, "ts").alias("bucket_start"),
                             "event_type")
                  .agg(F.count("*").alias("n_events"),
                       F.sum("value").alias("total_value"))).collect())
    assert store.snapshot() == exp


def test_watermarked_dedup_state_bounded_vs_unbounded(spark, tmp_path):
    """Certify the state-eviction behavior the two streaming dedup
    tiers advertise: under an advancing watermark,
    dropDuplicatesWithinWatermark EVICTS expired keys (state stays
    bounded at ~the lateness horizon; a duplicate arriving after
    eviction re-emits — the documented at-least-once-outside-horizon
    contract, the reference's own guarantee level), while the
    unbounded incremental_exact_dedup twin retains EVERY key ever
    seen. Pinned on the state-operator metrics Spark reports per
    batch (numRowsTotal) plus the semantic re-emission."""
    import datetime as dt

    src_dir = str(tmp_path / "dd_src")
    os.makedirs(src_dir)
    schema = "event_id long, ts timestamp, text string"
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)

    def write_batch(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("overwrite").parquet(f"{src_dir}/{name}")

    def stream():
        return (spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(f"{src_dir}/*"))

    def rows_at(hours, lo, hi):
        t = t0 + dt.timedelta(hours=hours)
        return [(k, t, f"doc-{k}") for k in range(lo, hi)]

    # four time-ordered files; maxFilesPerTrigger=1 => one batch each
    write_batch("b0", rows_at(0, 0, 100))
    write_batch("b1", rows_at(2, 100, 200) + [(0, t0, "doc-0")])
    write_batch("b2", rows_at(4, 200, 300))
    write_batch("b3", [(0, t0 + dt.timedelta(hours=4, minutes=30),
                        "doc-0")])

    bounded = W.dedup_within_watermark(stream(), ["event_id"], "ts",
                                       "1 hour")
    qb = (bounded.writeStream.outputMode("append").format("memory")
          .queryName("dd_bounded")
          .option("checkpointLocation", str(tmp_path / "ck_b")).start())
    qb.processAllAvailable()
    bounded_state = qb.lastProgress["stateOperators"][0]["numRowsTotal"]
    qb.stop()

    unbounded = W.incremental_exact_dedup(stream(), "text", "event_id")
    qu = (unbounded.writeStream.outputMode("append").format("memory")
          .queryName("dd_unbounded")
          .option("checkpointLocation", str(tmp_path / "ck_u")).start())
    qu.processAllAvailable()
    unbounded_state = qu.lastProgress["stateOperators"][0]["numRowsTotal"]
    qu.stop()

    # unbounded: every distinct key ever seen is live state forever
    assert unbounded_state == 300
    # bounded: batches 0-1 (keys 0..199) expired once the watermark
    # passed their ts+delay; only the recent horizon remains
    assert bounded_state <= 101, bounded_state
    # semantics: within-horizon duplicate suppressed (b1's key 0),
    # post-eviction duplicate re-emitted (b3's key 0)
    n_b = spark.sql("SELECT count(*) c FROM dd_bounded").collect()[0]["c"]
    n_u = spark.sql("SELECT count(*) c FROM dd_unbounded") \
        .collect()[0]["c"]
    assert n_u == 300   # history never forgotten, b3 dup suppressed
    assert n_b == 301   # 300 firsts + the re-emitted evicted key


def test_live_memory_sink_hard_caps_driver_buffer(spark, events_dir,
                                                  tmp_path):
    """The live pipeline's memory sink is a test surface: it must
    REFUSE to buffer past maxRows (killing the query with a clear
    error) rather than silently accumulate a 100 TB stream on the
    driver. The kafka/parquet paths write distributed and have no
    cap."""
    from galaxy_spark.cdc.filters import TaskFilter
    from galaxy_spark.streaming.pipeline import (LiveFilterRef,
                                                 start_pipeline_live)

    env = envelope_from_events(_stream_events(spark, events_dir))
    q = start_pipeline_live(
        env, "t_cap", LiveFilterRef(TaskFilter()),
        EVENT_SOURCE_COLUMNS,
        SinkConfig(kind="memory", options={"maxRows": "50"}),
        str(tmp_path / "cap_ckpt"))
    with pytest.raises(Exception, match="maxRows=50"):
        q.processAllAvailable()
    q.stop()


def test_parquet_rollup_store_survives_spark_epoch_replay(
        spark, events_dir, tmp_path):
    """Spark-driven epoch replay against the DURABLE parquet store:
    drop the last checkpoint commit marker, restart, and the
    bucketed MERGE must recognize its committed (bucket, epoch)
    versions and skip the replayed batch — totals unchanged, no new
    version dirs minted (the state_store twin of the
    EpochKeyedRollupStore replay test)."""
    from galaxy_spark.streaming.state_store import (
        ParquetRollupStore, start_incremental_rollup_parquet)

    ckpt = str(tmp_path / "pr_ckpt")
    store = ParquetRollupStore(spark, str(tmp_path / "pr_store"))
    q = start_incremental_rollup_parquet(
        _stream_events(spark, events_dir), store, ckpt)
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    first = store.snapshot()
    versions = {d: sorted(os.listdir(os.path.join(store.path, d)))
                for d in os.listdir(store.path)
                if d.startswith("bucket-")}
    assert first and versions

    commits_dir = os.path.join(ckpt, "commits")
    last = [c for c in sorted(os.listdir(commits_dir))
            if not c.startswith(".")][-1]
    os.remove(os.path.join(commits_dir, last))
    crc = os.path.join(commits_dir, f".{last}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    q2 = start_incremental_rollup_parquet(
        _stream_events(spark, events_dir), store, ckpt)
    q2.processAllAvailable()
    q2.stop()
    q2.awaitTermination(30)

    assert store.snapshot() == first, "replayed epoch double-counted"
    after = {d: sorted(os.listdir(os.path.join(store.path, d)))
             for d in os.listdir(store.path)
             if d.startswith("bucket-")}
    assert after == versions, "replay minted new version dirs"


def test_stream_static_minhash_gate_matches_batch(spark, tmp_path):
    """Stream-static NEAR-DUP gate: incoming documents probe a
    precomputed static MinHash band index of the reference corpus —
    the incremental crawl-dedup shape ("is this document a near-dup
    of anything we already hold?"), completing the stream-static
    family next to the Bloom (exact-membership) gate. Candidates
    per micro-batch must equal the batch equi-join over the same
    data."""
    from galaxy_spark.operators.dedup import minhash_band_buckets

    docs = load_table(spark, SF, "documents")
    ref = docs.filter(F.col("source").isin("src0", "src1", "src2"))
    probe = docs.filter(~F.col("source").isin("src0", "src1", "src2"))

    idx_path = str(tmp_path / "ref_idx")
    minhash_band_buckets(ref).write.parquet(idx_path)  # static index

    probe_path = str(tmp_path / "probe_src")
    probe.write.parquet(probe_path)
    stream = _stream_events(spark, probe_path)

    got: set = set()

    def handle(batch_df, epoch_id):
        bb = minhash_band_buckets(batch_df)
        static = spark.read.parquet(idx_path)  # re-resolved per batch
        cands = (bb.alias("p")
                 .join(static.alias("r"),
                       (F.col("p.band") == F.col("r.band"))
                       & (F.col("p.bucket") == F.col("r.bucket")))
                 .select(F.col("p.id").alias("probe_id"),
                         F.col("r.id").alias("ref_id"))
                 .distinct())
        got.update((r.probe_id, r.ref_id) for r in cands.collect())

    q = (stream.writeStream
         .option("checkpointLocation", str(tmp_path / "mh_ckpt"))
         .foreachBatch(handle).start())
    q.processAllAvailable()
    q.stop()

    bb_p = minhash_band_buckets(probe)
    static = spark.read.parquet(idx_path)
    want = {(r.probe_id, r.ref_id) for r in
            (bb_p.alias("p")
             .join(static.alias("r"),
                   (F.col("p.band") == F.col("r.band"))
                   & (F.col("p.bucket") == F.col("r.bucket")))
             .select(F.col("p.id").alias("probe_id"),
                     F.col("r.id").alias("ref_id"))
             .distinct()).collect()}
    assert got == want and want


def test_parquet_scd2_store_matches_batch_window(spark, events_dir,
                                                 tmp_path):
    """Incrementally-maintained SCD2 history (version arrays in the
    durable parquet store, intervals derived at read) must equal
    the batch single-window build over the same changelog — the
    continuous-aggregate guarantee extended from latest-wins state
    to FULL dimension history."""
    from galaxy_spark.queries.cdc import (scd2_change_frame,
                                          scd2_history_frame)
    from galaxy_spark.streaming.state_store import (
        ParquetScd2Store, start_incremental_scd2_parquet)

    changes = scd2_change_frame(
        envelope_from_events(_stream_events(spark, events_dir)))
    store = ParquetScd2Store(spark, str(tmp_path / "scd2_store"))
    q = start_incremental_scd2_parquet(
        changes, store, str(tmp_path / "scd2_ckpt"))
    q.processAllAvailable()
    q.stop()

    got = {(r.database, r["table"], r.pk, r.value, r.pos, r.valid_to)
           for r in store.history().collect()}
    want = {(r.database, r["table"], r.pk, r.value, r.pos, r.valid_to)
            for r in scd2_history_frame(
                envelope_from_events(load_table(spark, SF, "events")))
            .collect()}
    assert got == want and len(want) > 100
    # multi-version keys exist, so the array merge is exercised
    assert len(want) > len({(d, t, p) for d, t, p, *_ in want})


def test_streaming_histogram_quantile_on_durable_store(spark, events_dir,
                                                       tmp_path):
    """Streaming quantiles on the durable store (VERDICT r6 #8):
    the fixed-bin histogram is a SUM-mergeable (bin -> count) map,
    so per-batch partial counts fold into the generic
    KeyedParquetStore exactly like the rollup — and the
    incrementally-maintained histogram must equal the batch build
    bin-for-bin, with the quantile read off the store honoring the
    one-bin-width value bound against the exact order statistic.
    (A t-digest would bound tails tighter but its float centroids
    are merge-order-dependent — unreproducible across replays; the
    fixed-bin sketch is the determinism-correct choice, see
    agg_histogram_quantile_value_bound.)"""
    import math

    from galaxy_spark.streaming.state_store import KeyedParquetStore

    ev = load_table(spark, SF, "events").filter(F.col("value").isNotNull())
    B = 128
    mm = ev.agg(
        (F.min("value") * 100).cast("long").alias("mn"),
        (F.max("value") * 100).cast("long").alias("mx")).collect()[0]
    mn, span = mm["mn"], mm["mx"] - mm["mn"]

    def binned_counts(df):
        vi = (F.col("value") * 100).cast("long")
        return (df.filter(F.col("value").isNotNull())
                .select(F.least(
                    F.floor(((vi - F.lit(mn)) * B).cast("double")
                            / F.lit(span)).cast("int"),
                    F.lit(B - 1)).alias("bin"))
                .groupBy("bin")
                .agg(F.count("*").cast("long").alias("cnt")))

    store = KeyedParquetStore(
        spark, str(tmp_path / "hist_store"), ["bin"],
        [F.sum("cnt").cast("long").alias("cnt")], n_buckets=2)
    q = (_stream_events(spark, events_dir).writeStream
         .option("checkpointLocation", str(tmp_path / "hist_ck"))
         .foreachBatch(lambda b, e: store.merge(
             binned_counts(b), f"lin.{e:012d}"))
         .start())
    q.processAllAvailable()
    q.stop()

    got = {r.bin: r.cnt for r in store.state().collect()}
    want = {r.bin: r.cnt for r in binned_counts(ev).collect()}
    assert got == want and sum(got.values()) == ev.count()

    # median off the STORE: crossing bin's upper edge within one
    # bin width of the exact order statistic
    n = sum(got.values())
    target = math.ceil(0.5 * n)
    cum, k = 0, None
    for b in sorted(got):
        cum += got[b]
        if cum >= target:
            k = b
            break
    est = mn + math.floor((k + 1) * span / B)
    exact = (ev.select((F.col("value") * 100).cast("long").alias("vi"))
             .orderBy("vi").limit(target).agg(F.max("vi"))
             .collect()[0][0])
    assert -1 <= est - exact <= span // B + 2


def test_streaming_hll_registers_on_durable_store(spark, events_dir,
                                                  tmp_path):
    """Streaming cardinality on the durable store: HLL registers
    are a bucket-wise MAX monoid, so per-batch register partials
    fold into the generic KeyedParquetStore with a max-merge — and
    the incrementally-accumulated registers equal the batch build
    cell-for-cell (the same continuous-aggregate guarantee as the
    histogram sketch, for the COUNT DISTINCT axis)."""
    from galaxy_spark.queries.indexing import hll_registers
    from galaxy_spark.streaming.state_store import KeyedParquetStore

    store = KeyedParquetStore(
        spark, str(tmp_path / "hll_store"), ["bucket"],
        [F.max("register").alias("register")], n_buckets=2)
    q = (_stream_events(spark, events_dir).writeStream
         .option("checkpointLocation", str(tmp_path / "hll_ck"))
         .foreachBatch(lambda b, e: store.merge(
             hll_registers(b, F.col("event_id")), f"lin.{e:012d}"))
         .start())
    q.processAllAvailable()
    q.stop()

    got = {(r.bucket, r.register) for r in store.state().collect()}
    ev = load_table(spark, SF, "events")
    want = {(r.bucket, r.register)
            for r in hll_registers(ev, F.col("event_id")).collect()}
    assert got == want and len(want) > 100


def test_scd2_store_hot_key_stays_row_per_version(spark, tmp_path):
    """A CDC hot key (one pk updated 100k times) must spread across
    the store as O(1) rows — never concentrate as one giant
    collect_list array cell in a single bucket (the r6 design that
    recreated the hot-key hazard the snapshot fold was hardened
    against). Pins: row-per-version schema (no array column), every
    bucket holds a share of the hot key, history intervals still
    chain, and replaying version rows dedups instead of
    duplicating."""
    import glob

    import pyarrow.parquet as pq

    from galaxy_spark.streaming.state_store import (ParquetScd2Store,
                                                    partial_scd2)

    store = ParquetScd2Store(spark, str(tmp_path / "scd2_hot"),
                             n_buckets=4)
    n = 100_000
    changes = spark.range(n).select(
        F.lit("d").alias("database"), F.lit("t").alias("table"),
        F.lit(7).alias("pk"), F.col("id").alias("pos"),
        (F.col("id") * 1.0).alias("value"),
        F.lit("update").alias("action"))
    store.merge(partial_scd2(changes), "lin.000000000000")

    st = store.state()
    assert st.count() == n
    assert not any("array" in f.dataType.simpleString()
                   for f in st.schema.fields)
    per_bucket: dict = {}
    for f in glob.glob(f"{store.path}/bucket-*/v-*/part-*.parquet"):
        b = f.split("bucket-")[1].split("/")[0]
        per_bucket[b] = per_bucket.get(b, 0) + pq.read_table(f).num_rows
    assert len(per_bucket) == 4 and min(per_bucket.values()) > n // 16

    hist = store.history()
    assert hist.count() == n
    assert hist.filter(F.col("pos") == 5).collect()[0].valid_to == 6

    # a replayed slice of versions collapses by (key, pos) dedup
    store.merge(partial_scd2(changes.limit(1000)), "lin.000000000001")
    assert store.state().count() == n


def test_rebucket_preserves_state_and_resumes_stream(spark, events_dir,
                                                     tmp_path):
    """The bucket-count migration story: quiesce -> rebucket -> the
    SAME checkpoint resumes against the migrated store, and the
    final state equals the batch fold over everything. Also pins
    the two refusals: a non-quiesced store (claims past the commit
    log) and a lineage mismatch."""
    from galaxy_spark.queries.cdc import (cdc_apply_snapshot,
                                          snapshot_change_frame)
    from galaxy_spark.streaming.state_store import (
        ParquetSnapshotStore, rebucket,
        start_incremental_snapshot_parquet)
    from galaxy_spark.tables import load_table as _lt

    ev = _lt(spark, SF, "events")
    mid = ev.stat.approxQuantile("event_id", [0.5], 0.01)[0]
    src = str(tmp_path / "ev_src")
    ev.filter(F.col("event_id") <= mid).write.parquet(src)

    ckpt = str(tmp_path / "rb_ckpt")
    store = ParquetSnapshotStore(spark, str(tmp_path / "rb_a"),
                                 n_buckets=2)

    def start(st):
        return start_incremental_snapshot_parquet(
            snapshot_change_frame(
                envelope_from_events(_stream_events(spark, src))),
            st, ckpt)

    q = start(store)
    q.processAllAvailable()
    q.stop()
    before = store.snapshot()

    store2 = rebucket(store, str(tmp_path / "rb_b"), 8,
                      checkpoint_dir=ckpt)
    assert store2.n_buckets == 8
    assert store2.snapshot() == before          # identity, re-spread
    assert len(os.listdir(store2.path)) >= 8    # occupied buckets

    # resume from the ORIGINAL checkpoint against the migrated store
    (ev.filter(F.col("event_id") > mid)
     .write.mode("append").parquet(src))
    q2 = start(store2)
    q2.processAllAvailable()
    q2.stop()
    want = sorted(
        (r.database, r["table"], r.pk, r.last_value, r.last_pos,
         r.n_changes)
        for r in cdc_apply_snapshot(spark, SF).collect())
    assert store2.snapshot() == want

    # refusal 1: claims beyond the checkpoint's commit log
    import shutil as _sh

    b0 = os.path.join(store2.path, "bucket-0")
    cur = sorted(os.listdir(b0))[-1]
    lin, ep = cur[2:].rsplit(".", 1)
    bogus = os.path.join(b0, f"v-{lin}.{int(ep) + 99:012d}")
    _sh.copytree(os.path.join(b0, cur), bogus)
    with pytest.raises(ValueError, match="not quiesced"):
        rebucket(store2, str(tmp_path / "rb_c"), 4,
                 checkpoint_dir=ckpt)
    _sh.rmtree(bogus)

    # refusal 2: foreign checkpoint lineage
    foreign_ckpt = str(tmp_path / "foreign_ckpt")
    os.makedirs(foreign_ckpt)
    with open(os.path.join(foreign_ckpt, "metadata"), "w") as f:
        json.dump({"id": "ffffffff-0000-0000-0000-000000000000"}, f)
    with pytest.raises(ValueError, match="lineage"):
        rebucket(store2, str(tmp_path / "rb_d"), 4,
                 checkpoint_dir=foreign_ckpt)


def test_topic_files_sink_routes_like_kafka(spark, events_dir, tmp_path):
    """K1 through the Spark 4 Python DataSource WRITER API: routed
    messages stream into per-topic directories (the broker-less
    Kafka-sink twin, completing the custom reader+writer surface).
    Every message lands exactly once under its <task>.<db>.<table>
    topic with key <db>.<table>, no torn .tmp files survive the
    commit, and content equals the batch routing."""
    import glob
    import json as _json

    from galaxy_spark.sinks_topic import TopicFilesDataSource
    from galaxy_spark.streaming.pipeline import routed_messages

    try:
        spark.dataSource.register(TopicFilesDataSource)
    except Exception:
        pass

    env = envelope_from_events(_stream_events(spark, events_dir))
    msgs = routed_messages(env, "t_files")
    out = str(tmp_path / "topics")
    q = (msgs.writeStream.format("galaxy_topic_files")
         .option("path", out)
         .option("checkpointLocation", str(tmp_path / "tf_ckpt"))
         .start())
    q.processAllAvailable()
    q.stop()

    got = []
    for f in glob.glob(f"{out}/*/batch-*.jsonl"):
        topic = os.path.basename(os.path.dirname(f))
        with open(f) as fh:
            for line in fh:
                m = _json.loads(line)
                got.append((topic, m["key"], m["value"]))
    assert not glob.glob(f"{out}/*/*.tmp-*"), "torn batch visible"

    batch = routed_messages(
        envelope_from_events(load_table(spark, SF, "events")), "t_files")
    want = [(r.topic, r.key, r.value) for r in batch.collect()]
    assert sorted(got) == sorted(want) and len(want) > 500
    # routing invariants: topic = <task>.<key>; one dir per topic
    for topic, key, _ in got:
        assert topic == f"t_files.{key}"


def test_parquet_store_recovers_from_crash_debris(spark, tmp_path):
    """Pin the documented crash windows of the keyed parquet store:
    (a) an orphaned .stage- dir (crash before any rename) is swept
    by the next merge once STALE — never by construction (a reader
    handle over a running store must not delete a live merge's
    stage, r11 review wave 1) and never while fresh (a zombie
    writer must not delete the LIVE writer's seconds-old stage,
    wave 2); (b) a TORN version dir (renamed but no _COMMITTED
    marker — crash between rename and marker) is never read as
    current and is replaced when its epoch replays; (c) a crash
    mid-vacuum (stale older version left behind) is ignored by the
    max-committed-version rule and swept by the next merge."""
    import time as _time

    from galaxy_spark.streaming.state_store import ParquetSnapshotStore

    path = str(tmp_path / "st")
    store = ParquetSnapshotStore(spark, path, n_buckets=1)

    def partial(pk, pos, v):
        return spark.createDataFrame(
            [("d", "t", pk, "insert", v, pos, 1)],
            "database string, `table` string, pk long, "
            "last_action string, last_value double, last_pos long, "
            "n_changes long")

    store.merge(partial(1, 10, 1.0), "lin.000000000000")
    base = store.snapshot()

    # (a) orphaned staging dirs: one stale (crash debris), one
    # fresh (a concurrent writer's live stage)
    stale = os.path.join(path, ".stage-deadbeef")
    fresh = os.path.join(path, ".stage-11v3aaaa")
    os.makedirs(os.path.join(stale, "x"))
    os.makedirs(fresh)
    old = _time.time() - 3600
    os.utime(stale, (old, old))
    # (b) torn next-epoch version: dir present, no _COMMITTED
    torn = os.path.join(path, "bucket-0", "v-lin.000000000001")
    os.makedirs(torn)
    with open(os.path.join(torn, "garbage"), "w") as f:
        f.write("not parquet")

    store2 = ParquetSnapshotStore(spark, path, n_buckets=1)
    assert os.path.exists(stale), \
        "construction must not sweep (readers share the path)"
    assert store2.snapshot() == base          # torn version invisible

    # replaying the torn epoch recomputes it from the committed base
    store2.merge(partial(2, 20, 2.0), "lin.000000000001")
    assert store2.snapshot() == [("d", "t", 1, 1.0, 10, 1),
                                 ("d", "t", 2, 2.0, 20, 1)]
    # the merge swept the STALE stage and spared the FRESH one
    assert not os.path.exists(stale)
    assert os.path.exists(fresh)
    # (c) mid-vacuum debris: fake an old version surviving next to
    # the current one; the next merge of the bucket sweeps it
    stale = os.path.join(path, "bucket-0", "v-lin.000000000000x")
    os.makedirs(stale)
    store2.merge(partial(3, 30, 3.0), "lin.000000000002")
    versions = sorted(os.listdir(os.path.join(path, "bucket-0")))
    assert versions == ["v-lin.000000000002"], versions
    assert len(store2.snapshot()) == 3


def test_topic_files_abort_sweeps_staged_files(spark, tmp_path):
    """The sink's abort path (Spark calls it when any partition of
    a batch fails) must remove every staged .tmp file so a failed
    epoch leaves no debris for readers to trip on — unit-driven
    against the writer directly, since partition failure isn't
    deterministically injectable through a query."""
    from pyspark.sql import Row

    from galaxy_spark.sinks_topic import TopicFilesStreamWriter

    out = str(tmp_path / "topics")
    w = TopicFilesStreamWriter({"path": out})
    msg = w.write(iter([
        Row(topic="t.a.b", key="a.b", value="{}"),
        Row(topic="t.c.d", key="c.d", value="{}"),
    ]))
    staged = [tmp for tmp, _ in msg.renames]
    assert len(staged) == 2 and all(os.path.exists(p) for p in staged)
    w.abort([msg, None], batchId=5)
    assert not any(os.path.exists(p) for p in staged)
    import glob
    assert not glob.glob(f"{out}/*/batch-*"), "no published files"


def test_topic_files_replay_overwrites_same_batch(tmp_path, monkeypatch):
    """Replaying a batchId must never duplicate rows within that
    batchId: final names are deterministic per (batchId,
    partitionId) so a replay's commit overwrites the crashed
    attempt's files, and files a repartitioned replay did NOT
    republish are swept along with stale .tmp litter."""
    import glob

    from pyspark.sql import Row

    from galaxy_spark.sinks_topic import TopicFilesStreamWriter

    class _Ctx:
        def __init__(self, pid):
            self._pid = pid

        def partitionId(self):
            return self._pid

    def with_pid(pid):
        import pyspark

        monkeypatch.setattr(pyspark.TaskContext, "get",
                            staticmethod(lambda: _Ctx(pid)))

    out = str(tmp_path / "topics")
    w = TopicFilesStreamWriter({"path": out})
    row = Row(topic="t.a.b", key="a.b", value='{"v":1}')

    # attempt 1: two partitions publish under batch 7
    with_pid(0)
    m0 = w.write(iter([row]))
    with_pid(1)
    m1 = w.write(iter([row, row]))
    w.commit([m0, m1], batchId=7)
    assert sorted(os.path.basename(f) for f in
                  glob.glob(f"{out}/t.a.b/batch-7-*")) == [
        "batch-7-part-00000.jsonl", "batch-7-part-00001.jsonl"]

    # crash-post-commit replay: ONE partition this time, plus stale
    # .tmp litter from the crashed attempt
    litter = os.path.join(out, "t.a.b", "part-00009.jsonl.tmp-dead")
    with open(litter, "w") as f:
        f.write("torn\n")
    with_pid(0)
    m0b = w.write(iter([row, row, row]))
    w.commit([m0b], batchId=7)
    files = glob.glob(f"{out}/t.a.b/*")
    assert [os.path.basename(f) for f in files] == [
        "batch-7-part-00000.jsonl"]      # part-1 superseded, tmp swept
    with open(files[0]) as f:
        assert len(f.readlines()) == 3   # last attempt's content wins


def test_quarantined_rows_route_to_dead_letter_topic(spark, tmp_path):
    """A malformed event (wrong org_row arity) must neither kill the
    stream (reference behavior: error out, process.go:120-122) nor
    vanish: it lands on <task>.deadletter.<db>.<table> with its full
    raw payload, while well-formed events flow to their normal
    topics — one stream, one sink, conservation of events."""
    from galaxy_spark.cdc.filters import TaskFilter
    from galaxy_spark.streaming.pipeline import SinkConfig, start_pipeline

    src = str(tmp_path / "dlq_src")
    rows = [
        ("db0", "t", "insert", [["1", "2", "3.5"]], (1, 10)),   # good
        ("db0", "t", "insert", [["1", "2"]], (2, 20)),          # arity!
        ("db0", "t", "update",
         [["1", "2", "3.5"], ["1", "2", "4.5"]], (3, 30)),      # good
    ]
    spark.createDataFrame(
        rows, "database string, `table` string, action string, "
              "org_row array<array<string>>, "
              "event_header struct<timestamp:long, log_pos:long>"
    ).write.mode("overwrite").parquet(src)
    static = spark.read.parquet(src)
    stream = spark.readStream.schema(static.schema).parquet(src)

    q = start_pipeline(stream, "t_dlq", TaskFilter(),
                       EVENT_SOURCE_COLUMNS,
                       SinkConfig(kind="memory"),
                       str(tmp_path / "dlq_ckpt"))
    q.processAllAvailable()
    q.stop()

    out = spark.sql("SELECT * FROM t_dlq").collect()
    assert len(out) == 3, "events must be conserved"
    by_topic = {}
    for r in out:
        by_topic.setdefault(r.topic, []).append(r)
    assert len(by_topic["t_dlq.db0.t"]) == 2
    (dl,) = by_topic["t_dlq.deadletter.db0.t"]
    assert dl.key == "db0.t"
    payload = json.loads(dl.value)
    assert payload["org_row"] == [["1", "2"]]      # replayable raw row
    assert payload["event_header"]["log_pos"] == 20


def test_streaming_incremental_view_on_durable_store(spark, tmp_path):
    """The delta rule on the durable stores: a multi-batch change
    stream maintains (snapshot, aggregate view) in lockstep, and the
    final view equals BOTH the batch cdc_incremental_view_sum fold
    and a recompute off the snapshot store. Also pins the
    view-before-snapshot replay window: after the snapshot has
    absorbed a batch, a replayed merge under the same claimed epoch
    is a no-op even though its recomputed deltas are zero."""
    import time as _time

    from galaxy_spark.queries.cdc import snapshot_change_frame
    from galaxy_spark.registry import all_queries
    from galaxy_spark.streaming.state_store import (
        ParquetSnapshotStore, ParquetViewStore, partial_view_deltas,
        start_incremental_view_parquet)

    # three arrival slices in pos order (the binlog contract),
    # mtime-separated so maxFilesPerTrigger=1 yields >= 3 batches
    ev = load_table(spark, SF, "events")
    src = str(tmp_path / "view_src")
    mx = ev.agg(F.max("event_id")).collect()[0][0]
    cuts = [0, mx // 3, (2 * mx) // 3, mx + 1]
    for lo, hi in zip(cuts, cuts[1:]):
        (ev.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi))
         .coalesce(1).write.mode("append").parquet(src))
        _time.sleep(1.1)

    changes = snapshot_change_frame(envelope_from_events(
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)))
    view = ParquetViewStore(spark, str(tmp_path / "view_store"))
    snap = ParquetSnapshotStore(spark, str(tmp_path / "view_snap"))
    ck = str(tmp_path / "view_ckpt")
    q = start_incremental_view_parquet(changes, view, snap, ck)
    q.processAllAvailable()
    q.stop()

    commits = os.listdir(os.path.join(ck, "commits"))
    assert len([c for c in commits if c.isdigit()]) >= 3

    want = sorted(
        (r.database, r["table"], r.incr_sum_cents, r.incr_rows)
        for r in all_queries()["cdc_incremental_view_sum"](
            spark, SF).collect())
    assert view.view() == want and len(want) >= 10

    # view == recompute off the snapshot store's live rows
    st = (snap.state().filter(F.col("last_action") != "delete")
          .groupBy("database", "table")
          .agg(F.sum(F.round(F.col("last_value") * 100, 0).cast("long"))
               .alias("dv"),
               F.count("*").cast("long").alias("dn")))
    recompute = sorted((r.database, r["table"], r.dv, r.dn)
                       for r in st.collect())
    assert view.view() == recompute

    # replay window: batch already in snapshot -> recomputed deltas
    # are zero, and the claimed epoch skips the merge regardless
    batch3 = snapshot_change_frame(envelope_from_events(
        ev.filter(F.col("event_id") >= cuts[2])))
    replay = partial_view_deltas(batch3, snap.state())
    assert all(r.dv == 0 and r.dn == 0 for r in replay.collect())
    lin = sorted(view.lineages())[0]
    view.merge(replay, f"{lin}.{2:012d}")
    assert view.view() == want


def test_streaming_incremental_view_survives_restart(spark, tmp_path):
    """Kill/restart for the dual-store handler: stop after the first
    slices commit, append more changes, resume from the SAME
    checkpoint against the SAME stores — the final view and snapshot
    must equal the batch folds over everything (the lineage-scoped
    epoch claims make the restart's epoch numbering safe)."""
    import time as _time

    from galaxy_spark.queries.cdc import snapshot_change_frame
    from galaxy_spark.registry import all_queries
    from galaxy_spark.streaming.state_store import (
        ParquetSnapshotStore, ParquetViewStore,
        start_incremental_view_parquet)

    ev = load_table(spark, SF, "events")
    src = str(tmp_path / "rv_src")
    mx = ev.agg(F.max("event_id")).collect()[0][0]
    half = mx // 2

    def changes_stream():
        return snapshot_change_frame(envelope_from_events(
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1).parquet(src)))

    (ev.filter(F.col("event_id") < half)
     .coalesce(1).write.mode("append").parquet(src))
    view = ParquetViewStore(spark, str(tmp_path / "rv_view"))
    snap = ParquetSnapshotStore(spark, str(tmp_path / "rv_snap"))
    ck = str(tmp_path / "rv_ckpt")
    q = start_incremental_view_parquet(changes_stream(), view, snap, ck)
    q.processAllAvailable()
    q.stop()
    mid = view.view()
    assert mid and all(dv > 0 for (_, _, dv, _) in mid)

    _time.sleep(1.1)  # mtime-separate the post-restart slice
    (ev.filter(F.col("event_id") >= half)
     .coalesce(1).write.mode("append").parquet(src))
    q2 = start_incremental_view_parquet(changes_stream(), view, snap, ck)
    q2.processAllAvailable()
    q2.stop()

    want = sorted(
        (r.database, r["table"], r.incr_sum_cents, r.incr_rows)
        for r in all_queries()["cdc_incremental_view_sum"](
            spark, SF).collect())
    assert view.view() == want != mid
    want_snap = sorted(
        (r.database, r["table"], r.pk, r.last_value, r.last_pos,
         r.n_changes)
        for r in all_queries()["cdc_apply_snapshot"](spark, SF).collect())
    assert snap.snapshot() == want_snap


def test_ddl_apply_batch_persists_registry(spark, tmp_path):
    """The persistence half of the DDL contract: with save_path
    set, applied DDL survives a restart via SchemaRegistry.load —
    without it, Spark's commit log advances past the DDL batch and
    a restarted registry lacks the ALTER, quarantining every later
    row of the table on arity with no error anywhere."""
    from galaxy_spark.cdc.schema_registry import (ColumnDef,
                                                  SchemaRegistry)

    reg = SchemaRegistry()
    reg.put("db0", "t", [ColumnDef("id"), ColumnDef("v")])
    save = str(tmp_path / "registry.json")
    handler = ddl_apply_batch(reg, "db0", save_path=save)
    batch = spark.createDataFrame(
        [("db0", "ALTER TABLE t ADD COLUMN c int")],
        "database string, query string")
    handler(batch, 0)
    assert [c.name for c in reg.get("db0", "t").columns] \
        == ["id", "v", "c"]

    reloaded = SchemaRegistry.load(save)
    assert [c.name for c in reloaded.get("db0", "t").columns] \
        == ["id", "v", "c"]


def test_store_rename_failure_raises_not_skips(tmp_path, monkeypatch):
    """A commit-rename failure that is NOT a lost replay race must
    RAISE (so Spark retries the batch) — swallowing it as a replay
    skip silently dropped a live epoch's contribution while the
    checkpoint advanced."""
    import pandas as pd

    from galaxy_spark.streaming.exactly_once import EpochKeyedRollupStore

    store = EpochKeyedRollupStore(str(tmp_path / "eo"))
    pdf = pd.DataFrame({"grain": ["day"], "bucket_start": ["2024-01-01"],
                        "event_type": ["click"], "n_events": [1],
                        "total_value": [1.0]})

    real_rename = os.rename

    def failing_rename(src, dst):
        raise OSError("injected: no space left on device")

    monkeypatch.setattr(os, "rename", failing_rename)
    with pytest.raises(OSError, match="injected"):
        store.merge(pdf, epoch_id=1, lineage="lin")
    monkeypatch.setattr(os, "rename", real_rename)

    # genuine lost race (dest exists) still reports a replay skip
    assert store.merge(pdf, epoch_id=2, lineage="lin") is True
    monkeypatch.setattr(os, "rename", failing_rename)
    assert store.merge(pdf, epoch_id=2, lineage="lin") is False


def test_live_pipeline_routes_quarantined_to_dlq(spark, tmp_path):
    """The LIVE pipeline must honor the same dead-letter contract
    as start_pipeline: a malformed (short-arity) row routes to
    <task>.deadletter.<db>.<table> through the same sink — it used
    to be silently dropped on exactly the pipeline variant meant
    for production filter updates."""
    from galaxy_spark.cdc.filters import TaskFilter
    from galaxy_spark.streaming.pipeline import (LiveFilterRef,
                                                 _LIVE_MEMORY,
                                                 start_pipeline_live)

    src = str(tmp_path / "dlq_env")
    rows = [
        ("db0", "click", "insert", [["1", "10", "0.5"]]),   # good
        ("db0", "click", "insert", [["2", "11"]]),          # short
    ]
    (spark.createDataFrame(
        rows, "database string, table string, action string, "
              "org_row array<array<string>>")
     .withColumn("event_header",
                 F.struct(F.lit(1).cast("long").alias("timestamp"),
                          F.lit(10).cast("long").alias("log_pos"),
                          F.lit(1000).cast("long")
                          .alias("timestamp_ms")))
     .write.parquet(src))
    env = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    q = start_pipeline_live(
        env, "t_dlq", LiveFilterRef(TaskFilter()),
        ("event_id", "user_id", "value"),
        SinkConfig(kind="memory", options={}),
        str(tmp_path / "dlq_ckpt"))
    q.processAllAvailable()
    q.stop()
    topics = sorted(r.topic for r in _LIVE_MEMORY["t_dlq"])
    assert topics == ["t_dlq.db0.click", "t_dlq.deadletter.db0.click"]


def test_topic_files_lineage_scopes_batch_names(tmp_path, monkeypatch):
    """After a checkpoint reset (recovery_v2 bumps the task's
    checkpoint epoch; batchIds restart at 0), the new generation's
    batch 0 must NOT overwrite or sweep the previous generation's
    already-delivered batch-0 files — the lineage option scopes
    names and sweeps to the checkpoint generation, and TaskManager
    wires it from TaskSpec.checkpoint_epoch."""
    import glob

    from pyspark.sql import Row

    from galaxy_spark.control.tasks import TaskSpec
    from galaxy_spark.sinks_topic import TopicFilesStreamWriter

    class _Ctx:
        def partitionId(self):
            return 0

    import pyspark

    monkeypatch.setattr(pyspark.TaskContext, "get",
                        staticmethod(lambda: _Ctx()))
    out = str(tmp_path / "topics")
    row1 = Row(topic="t.a.b", key="a.b", value='{"v":"epoch0"}')
    row2 = Row(topic="t.a.b", key="a.b", value='{"v":"epoch1"}')

    w0 = TopicFilesStreamWriter({"path": out, "lineage": "e0"})
    w0.commit([w0.write(iter([row1]))], batchId=0)
    w1 = TopicFilesStreamWriter({"path": out, "lineage": "e1"})
    w1.commit([w1.write(iter([row2]))], batchId=0)

    names = sorted(os.path.basename(f) for f in
                   glob.glob(f"{out}/t.a.b/batch-*"))
    assert names == ["batch-e0.0-part-00000.jsonl",
                     "batch-e1.0-part-00000.jsonl"]

    # and a replay WITHIN a lineage still overwrites, not duplicates
    w1b = TopicFilesStreamWriter({"path": out, "lineage": "e1"})
    w1b.commit([w1b.write(iter([row2]))], batchId=0)
    assert sorted(os.path.basename(f) for f in
                  glob.glob(f"{out}/t.a.b/batch-e1*")) == [
        "batch-e1.0-part-00000.jsonl"]

    spec = TaskSpec(task_id="t", sink_kind="topic_files",
                    sink_options={"path": out})
    spec.checkpoint_epoch = 3
    assert spec.sink().options["lineage"] == "e3"


def test_rebucket_base_class_store_and_quiesce_warning(spark, tmp_path):
    """rebucket on a plain KeyedParquetStore must forward
    key_cols/aggs (the subclass-shaped constructor call raised a
    bare TypeError), and omitting checkpoint_dir warns that the
    quiesce check is skipped."""
    import warnings

    from pyspark.sql import functions as F

    from galaxy_spark.streaming.state_store import (KeyedParquetStore,
                                                    rebucket)

    store = KeyedParquetStore(
        spark, str(tmp_path / "base_a"), ["k"],
        [F.sum("v").cast("long").alias("v")], n_buckets=2,
        state_schema="k string, v long")
    store.merge(spark.createDataFrame([("a", 1), ("b", 2)],
                                      "k string, v long"),
                "ck1.000000000000")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        moved = rebucket(store, str(tmp_path / "base_b"), 4)
    assert any("quiesced" in str(w.message) for w in caught)
    assert moved.n_buckets == 4
    assert sorted((r.k, r.v) for r in moved.state().collect()) == \
        [("a", 1), ("b", 2)]


def test_streaming_cms_heavy_hitters_on_durable_store(spark, events_dir,
                                                      tmp_path):
    """Streaming approximate top-k on the durable store (the
    CMS + per-batch top-m candidate pattern): (1) the accumulated
    sketch equals the batch sketch CELL-FOR-CELL (cell-wise sum
    monoid — no batch split can move a counter); (2) with m sized
    to the key skew, the store-ranked top-k equals the batch
    query's CMS ranking, estimate-for-estimate; (3) the candidate
    store is bounded by m x batches rows, never the key universe."""
    from galaxy_spark.streaming.state_store import (
        ParquetCandidateStore, ParquetCmsStore, partial_cms,
        start_streaming_heavy_hitters, streaming_heavy_hitters)

    cms = ParquetCmsStore(spark, str(tmp_path / "cms_store"))
    cand = ParquetCandidateStore(spark, str(tmp_path / "cand_store"))
    q = start_streaming_heavy_hitters(
        _stream_events(spark, events_dir), cms, cand,
        str(tmp_path / "hh_ck"), key_col="user_id", m=64)
    q.processAllAvailable()
    q.stop()

    ev = load_table(spark, SF, "events")
    got_cells = {(r.row_i, r.pos): r.cnt
                 for r in cms.state().collect()}
    want_cells = {(r.row_i, r.pos): r.cnt
                  for r in partial_cms(ev, "user_id").collect()}
    assert got_cells == want_cells and len(want_cells) > 50

    # candidate set bounded: <= m per committed batch
    import os as _os

    n_batches = len([f for f in _os.listdir(
        str(tmp_path / "hh_ck" / "commits")) if f.isdigit()])
    n_cand = cand.state().count()
    assert 0 < n_cand <= 64 * max(n_batches, 1)

    # top-k off the stores == the batch query's CMS ranking
    from galaxy_spark.registry import all_queries

    got_top = [(r.item, r.cms_estimate)
               for r in streaming_heavy_hitters(cms, cand, 5).collect()]
    want_top = [(str(r.user_id), r.cms_estimate)
                for r in all_queries()["agg_countmin_heavy_hitters"](
                    spark, SF)
                .orderBy(F.desc("cms_estimate"),
                         F.col("user_id").cast("string"))
                .limit(5).collect()]
    assert got_top == want_top


def test_streaming_heavy_hitters_restart_resumes(spark, tmp_path):
    """Kill/restart mid-stream: the same-epoch-keyed double merge
    replays idempotently, and the final sketch equals the batch
    sketch over ALL rows."""
    from galaxy_spark.streaming.state_store import (
        ParquetCmsStore, ParquetCandidateStore, partial_cms,
        start_streaming_heavy_hitters)

    src = str(tmp_path / "hh_src")
    ev = load_table(spark, SF, "events").select("user_id")
    half1 = ev.filter(F.col("user_id") % 2 == 0)
    half2 = ev.filter(F.col("user_id") % 2 == 1)
    half1.write.mode("overwrite").parquet(src)

    cms = ParquetCmsStore(spark, str(tmp_path / "cms2"))
    cand = ParquetCandidateStore(spark, str(tmp_path / "cand2"))
    ck = str(tmp_path / "hh_ck2")

    def start():
        stream = spark.readStream.schema(
            spark.read.parquet(src).schema).parquet(src)
        return start_streaming_heavy_hitters(stream, cms, cand, ck,
                                             key_col="user_id", m=64)

    q = start()
    q.processAllAvailable()
    q.stop()                                   # the "kill"
    half2.write.mode("append").parquet(src)
    q = start()
    q.processAllAvailable()
    q.stop()

    got = {(r.row_i, r.pos): r.cnt for r in cms.state().collect()}
    want = {(r.row_i, r.pos): r.cnt
            for r in partial_cms(ev, "user_id").collect()}
    assert got == want


def test_streaming_hll_cardinality_on_durable_store(spark, events_dir,
                                                    tmp_path):
    """Streaming cardinality on the durable store: (1) accumulated
    registers equal the batch sketch cell-for-cell (cell-wise MAX
    monoid); (2) the store estimate equals the batch certification
    query's estimate to the last bit; (3) MAX idempotence: re-merging
    a duplicate partial moves nothing."""
    from galaxy_spark.operators.sketch import hll_registers
    from galaxy_spark.registry import all_queries
    from galaxy_spark.streaming.state_store import (
        ParquetHllStore, partial_hll, start_streaming_cardinality,
        streaming_cardinality_estimate)

    store = ParquetHllStore(spark, str(tmp_path / "hll_store"))
    q = start_streaming_cardinality(
        _stream_events(spark, events_dir), store,
        str(tmp_path / "hll_ck"), key_col="event_id")
    q.processAllAvailable()
    q.stop()

    ev = load_table(spark, SF, "events")
    got = {(r.hll_bucket, r.register) for r in store.state().collect()}
    want = {(r.bucket, r.register)
            for r in hll_registers(ev, F.col("event_id")).collect()}
    assert got == want and len(want) > 100

    got_est = streaming_cardinality_estimate(store).collect()[0]
    want_est = all_queries()["agg_hll_cardinality_bound"](
        spark, SF).collect()[0]
    assert (got_est.occupied, got_est.harmonic_num, got_est.est) == \
        (want_est.occupied, want_est.harmonic_num, want_est.est)

    # idempotence: a replayed partial under a NEW epoch key (the
    # claim-skip can't help) still cannot move a MAX register
    store.merge(partial_hll(ev, "event_id"), "zzreplay.000000000099")
    assert {(r.hll_bucket, r.register)
            for r in store.state().collect()} == want


def test_streaming_sliding_wau_on_durable_store(spark, events_dir,
                                                tmp_path):
    """Continuously-maintained sliding WAU: the streaming store's
    trailing-7-day estimates equal the batch certification query's
    sketch columns field-for-field (same shared merge + estimate
    code over the same registers), and a late-arriving duplicate
    day re-merges idempotently (MAX registers)."""
    from galaxy_spark.registry import all_queries
    from galaxy_spark.streaming.state_store import (
        ParquetDailyHllStore, partial_daily_hll,
        start_streaming_sliding_wau, streaming_sliding_wau)

    store = ParquetDailyHllStore(spark, str(tmp_path / "wau_store"))
    q = start_streaming_sliding_wau(
        _stream_events(spark, events_dir), store,
        str(tmp_path / "wau_ck"), ts_col="ts", key_col="user_id")
    q.processAllAvailable()
    q.stop()

    got = sorted(
        (str(r.day), r.occupied, r.harmonic_num, r.est)
        for r in streaming_sliding_wau(store).collect())
    want = sorted(
        (str(r.day), r.occupied, r.harmonic_num, r.est)
        for r in all_queries()["agg_hll_sliding_distinct_users"](
            spark, SF).collect())
    assert got == want and len(got) > 10

    # late-data absorption: replaying every event as a "late"
    # partial under a fresh epoch key cannot move a MAX register
    ev = load_table(spark, SF, "events")
    store.merge(partial_daily_hll(ev, "ts", "user_id"),
                "zzlate.000000000099")
    got2 = sorted(
        (str(r.day), r.occupied, r.harmonic_num, r.est)
        for r in streaming_sliding_wau(store).collect())
    assert got2 == got


def test_streaming_sliding_wau_restart_resumes(spark, tmp_path):
    """Kill/restart mid-stream: the per-day register merges replay
    idempotently and the final sliding estimates equal the batch
    query's sketch columns over ALL rows."""
    from galaxy_spark.registry import all_queries
    from galaxy_spark.streaming.state_store import (
        ParquetDailyHllStore, start_streaming_sliding_wau,
        streaming_sliding_wau)

    src = str(tmp_path / "wau_src")
    ev = load_table(spark, SF, "events").select("ts", "user_id")
    half1 = ev.filter(F.col("user_id") % 2 == 0)
    half2 = ev.filter(F.col("user_id") % 2 == 1)
    half1.write.mode("overwrite").parquet(src)

    store = ParquetDailyHllStore(spark, str(tmp_path / "wau2"))
    ck = str(tmp_path / "wau_ck2")

    def start():
        stream = spark.readStream.schema(
            spark.read.parquet(src).schema).parquet(src)
        return start_streaming_sliding_wau(stream, store, ck,
                                           ts_col="ts",
                                           key_col="user_id")

    q = start()
    q.processAllAvailable()
    q.stop()                                   # the "kill"
    half2.write.mode("append").parquet(src)
    q = start()
    q.processAllAvailable()
    q.stop()

    got = sorted((str(r.day), r.occupied, r.harmonic_num, r.est)
                 for r in streaming_sliding_wau(store).collect())
    want = sorted((str(r.day), r.occupied, r.harmonic_num, r.est)
                  for r in all_queries()["agg_hll_sliding_distinct_users"](
                      spark, SF).collect())
    assert got == want and len(got) > 10


# ------------------------------------------------------------------
# Streaming incremental near-dup index (durable MinHash-LSH)
# ------------------------------------------------------------------

def _near_dup_stores(spark, tmp_path, tag, delta=None, fs="posix"):
    from galaxy_spark.streaming.state_store import (ParquetDocStore,
                                                    ParquetLshStore,
                                                    ParquetPairStore)
    from galaxy_spark.streaming.store_fs import store_fs

    stores = (ParquetLshStore(spark, str(tmp_path / f"{tag}_lsh")),
              ParquetDocStore(spark, str(tmp_path / f"{tag}_docs")),
              ParquetPairStore(spark, str(tmp_path / f"{tag}_pairs")))
    for s in stores:       # write-strategy knobs: safe to set at any
        s.delta_threshold = delta         # epoch boundary (r11);
        s.fs = store_fs(fs)               # fs before first commit
    return stores


@pytest.mark.parametrize("delta,fs", [(None, "posix"), (2, "posix"),
                                      (None, "manifest"),
                                      (2, "manifest"),
                                      (2, "manifest_cas")],
                         ids=["cow", "delta2", "cow-manifest",
                              "delta2-manifest", "delta2-cas"])
def test_streaming_near_dup_index_matches_batch(spark, tmp_path,
                                                delta, fs):
    """The r9 verdict's top item: near-dup-check every micro-batch
    against ALL previously streamed documents on a durable growing
    LSH index. Union of per-batch pair emissions over the replayed
    corpus == the batch ``dedup_minhash_lsh`` answer pair-for-pair
    and jaccard-for-jaccard — and the match is NOT vacuous: pairs
    must span arrival slices (cross-batch matches through the
    index), not just co-arrive."""
    import time as _time

    from galaxy_spark.registry import all_queries
    from galaxy_spark.streaming.state_store import (
        lsh_probe_pairs, start_streaming_near_dup_index,
        streaming_near_dup_pairs)

    docs = load_table(spark, SF, "documents")
    src = str(tmp_path / "nd_src")
    for k in range(3):                 # three mtime-separated slices
        (docs.filter(F.col("doc_id") % 3 == k)
         .coalesce(1).write.mode("append").parquet(src))
        _time.sleep(1.1)

    lsh, dstore, pairs = _near_dup_stores(spark, tmp_path, "nd",
                                          delta=delta, fs=fs)
    stream = spark.readStream.schema(docs.schema) \
        .option("maxFilesPerTrigger", 1).parquet(src)
    q = start_streaming_near_dup_index(
        stream, lsh, dstore, pairs, str(tmp_path / "nd_ck"))
    q.processAllAvailable()
    q.stop()

    commits = os.listdir(os.path.join(str(tmp_path / "nd_ck"),
                                      "commits"))
    assert len([c for c in commits if c.isdigit()]) >= 3

    got = sorted((r.id_a, r.id_b, r.jaccard)
                 for r in streaming_near_dup_pairs(pairs).collect())
    want = sorted((r.id_a, r.id_b, r.jaccard)
                  for r in all_queries()["dedup_minhash_lsh"](
                      spark, SF).collect())
    assert got == want and len(want) >= 3
    assert any(a % 3 != b % 3 for a, b, _ in got), \
        "no cross-slice pair: the growing-index probe went untested"

    # replay insensitivity: after all inserts, re-probing a slice
    # under a FRESH epoch key (claim-skip can't help) emits a
    # subset of already-known pairs at identical jaccard — MAX
    # folds it away
    replay = lsh_probe_pairs(docs.filter(F.col("doc_id") % 3 == 0),
                             lsh, dstore)
    lin = sorted(pairs.lineages())[0]
    pairs.merge(replay, f"zz{lin}.000000000099")
    got2 = sorted((r.id_a, r.id_b, r.jaccard)
                  for r in streaming_near_dup_pairs(pairs).collect())
    assert got2 == got


def test_streaming_near_dup_index_restart_resumes(spark, tmp_path):
    """Kill/restart mid-stream: stop after the first half commits,
    append the rest, resume from the SAME checkpoint against the
    SAME stores — emissions still equal the batch answer (epoch
    claims + idempotent MAX folds make the replay window safe)."""
    import time as _time

    from galaxy_spark.registry import all_queries
    from galaxy_spark.streaming.state_store import (
        start_streaming_near_dup_index, streaming_near_dup_pairs)

    docs = load_table(spark, SF, "documents")
    src = str(tmp_path / "ndr_src")
    (docs.filter(F.col("doc_id") % 2 == 0)
     .coalesce(1).write.mode("append").parquet(src))

    lsh, dstore, pairs = _near_dup_stores(spark, tmp_path, "ndr")
    ck = str(tmp_path / "ndr_ck")

    def start():
        stream = spark.readStream.schema(docs.schema) \
            .option("maxFilesPerTrigger", 1).parquet(src)
        return start_streaming_near_dup_index(stream, lsh, dstore,
                                              pairs, ck)

    q = start()
    q.processAllAvailable()
    q.stop()                           # the "kill"
    mid = streaming_near_dup_pairs(pairs).count()

    _time.sleep(1.1)
    (docs.filter(F.col("doc_id") % 2 == 1)
     .coalesce(1).write.mode("append").parquet(src))
    q = start()
    q.processAllAvailable()
    q.stop()

    got = sorted((r.id_a, r.id_b, r.jaccard)
                 for r in streaming_near_dup_pairs(pairs).collect())
    want = sorted((r.id_a, r.id_b, r.jaccard)
                  for r in all_queries()["dedup_minhash_lsh"](
                      spark, SF).collect())
    assert got == want and len(want) > mid >= 0


def test_lsh_probe_plans_as_equi_join(spark, tmp_path):
    """The probe against the grown index must plan as an EQUI-join
    on (band, bucket) — hash/sort-merge/broadcast-HASH — never a
    cartesian or nested-loop product; same only-wide-operation
    contract the batch tier pins."""
    from galaxy_spark.plans import physical_plan
    from galaxy_spark.streaming.state_store import (
        lsh_probe_pairs, partial_lsh_index)

    docs = load_table(spark, SF, "documents")
    lsh, dstore, _ = _near_dup_stores(spark, tmp_path, "ndp")
    lsh.merge(partial_lsh_index(docs.filter(F.col("doc_id") % 2 == 0)),
              "lin.000000000000")
    dstore.merge(
        docs.filter(F.col("doc_id") % 2 == 0)
        .select(F.col("doc_id").alias("id"), "text"),
        "lin.000000000000")
    probe = lsh_probe_pairs(docs.filter(F.col("doc_id") % 2 == 1),
                            lsh, dstore)
    p = physical_plan(probe)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # the verification inputs must prune to candidate ids BEFORE
    # the shingle compute (r10 review: without the semi-join, every
    # trigger re-shuffled and re-shingled the whole corpus)
    assert "LeftSemi" in p
    assert probe.count() >= 0          # the plan executes


def _cluster_stores(spark, tmp_path, tag):
    from galaxy_spark.streaming.state_store import (
        ParquetClusterStore, ParquetDocStore, ParquetLshStore,
        ParquetPairStore, ParquetRedirectStore)

    return (ParquetLshStore(spark, str(tmp_path / f"{tag}_lsh")),
            ParquetDocStore(spark, str(tmp_path / f"{tag}_doc")),
            ParquetPairStore(spark, str(tmp_path / f"{tag}_pair")),
            ParquetClusterStore(spark, str(tmp_path / f"{tag}_cl")),
            ParquetRedirectStore(spark, str(tmp_path / f"{tag}_rd")))


def test_streaming_clustering_matches_batch(spark, tmp_path):
    """r10 verdict #4: the canonical-document assignment maintained
    INCREMENTALLY on the union-find stores equals the batch
    ``dedup_cluster_canonical`` answer over the replayed corpus —
    doc-for-doc across cluster_id, cluster_size and is_canonical —
    including clusters whose members arrived in different
    micro-batches."""
    import time as _time

    from galaxy_spark.registry import all_queries
    from galaxy_spark.streaming.state_store import (
        start_streaming_near_dup_clustering,
        streaming_cluster_assignments, streaming_near_dup_pairs)

    docs = load_table(spark, SF, "documents")
    src = str(tmp_path / "cl_src")
    for k in range(3):
        (docs.filter(F.col("doc_id") % 3 == k)
         .coalesce(1).write.mode("append").parquet(src))
        _time.sleep(1.1)

    lsh, dstore, pairs, cstore, rstore = _cluster_stores(
        spark, tmp_path, "clm")
    stream = spark.readStream.schema(docs.schema) \
        .option("maxFilesPerTrigger", 1).parquet(src)
    q = start_streaming_near_dup_clustering(
        stream, lsh, dstore, pairs, cstore, rstore,
        str(tmp_path / "cl_ck"))
    q.processAllAvailable()
    q.stop()

    got = sorted(tuple(r) for r in streaming_cluster_assignments(
        docs, cstore, rstore).collect())
    want = sorted(tuple(r) for r in all_queries()
                  ["dedup_cluster_canonical"](spark, SF).collect())
    assert got == want
    # non-vacuous: some cluster spans arrival slices, so a MERGE of
    # previously-separate state actually happened
    emitted = [(r.id_a, r.id_b) for r in
               streaming_near_dup_pairs(pairs).collect()]
    assert any(a % 3 != b % 3 for a, b in emitted)


def test_streaming_clustering_chain_merge_and_restart(spark,
                                                      tmp_path):
    """Chain-shaped merges across batches + kill/restart: docs
    30~20 and 20~10 (never 30~10) arrive LARGEST-FIRST, so the
    final batch must re-resolve 30's stale label through the
    redirect store (the untouched-member case eager relabeling
    would have missed), a fourth doc then walks a batch-time chain,
    and a replayed partial under a fresh epoch key cannot move
    anything (MIN folds)."""
    import time as _time

    from galaxy_spark.streaming.state_store import (
        _cluster_partials, start_streaming_near_dup_clustering,
        streaming_cluster_assignments, streaming_near_dup_pairs)

    W = [f"tok3x{i}" for i in range(16)]

    def txt(lo):
        return " ".join(W[lo:lo + 12])

    # chain shape verified against the batch tier: pairs are
    # exactly (10,20) and (20,30); 40 duplicates 30's text
    slices = [[(30, txt(0))], [(20, txt(2))], [(10, txt(4))],
              [(40, txt(0))]]
    schema = "doc_id long, text string"
    src = str(tmp_path / "ch_src")
    ck = str(tmp_path / "ch_ck")
    lsh, dstore, pairs, cstore, rstore = _cluster_stores(
        spark, tmp_path, "chn")

    def start():
        stream = spark.readStream.schema(schema) \
            .option("maxFilesPerTrigger", 1).parquet(src)
        return start_streaming_near_dup_clustering(
            stream, lsh, dstore, pairs, cstore, rstore, ck)

    for k, rows in enumerate(slices):
        spark.createDataFrame(rows, schema) \
            .coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)
        if k == 1:                     # kill after two slices...
            q = start()
            q.processAllAvailable()
            q.stop()                   # ...and resume below
    q = start()
    q.processAllAvailable()
    q.stop()

    docs = spark.createDataFrame(
        [r for s in slices for r in s], schema)
    got = {r.doc_id: (r.cluster_id, r.cluster_size, r.is_canonical)
           for r in streaming_cluster_assignments(
               docs, cstore, rstore).collect()}
    assert got == {10: (10, 4, True), 20: (10, 4, False),
                   30: (10, 4, False), 40: (10, 4, False)}
    # the redirect store did the work: 30 was never an endpoint of
    # a pair naming 10, so only chain resolution can have moved it
    assert (30, 10) not in [(a, b) for a, b in
                            ((r.id_a, r.id_b) for r in
                             streaming_near_dup_pairs(pairs)
                             .collect())]
    # replay insensitivity: re-fold the full pair backlog under a
    # fresh epoch key — MIN folds cannot move any assignment
    red_p, id_p = _cluster_partials(
        streaming_near_dup_pairs(pairs), cstore, rstore)
    lin = sorted(pairs.lineages())[0]
    rstore.merge(red_p, f"zz{lin}.000000000099")
    cstore.merge(id_p, f"zz{lin}.000000000099")
    got2 = {r.doc_id: (r.cluster_id, r.cluster_size, r.is_canonical)
            for r in streaming_cluster_assignments(
                docs, cstore, rstore).collect()}
    assert got2 == got


def test_streaming_emb_near_dup_index_matches_batch(spark, tmp_path):
    """r10 verdict #5: the embedding modality gets the same growing
    streaming index as text — union of per-batch emissions over the
    replayed corpus (WITH a kill/restart mid-stream) equals the
    batch ``dedup_embedding_cosine_lsh`` answer pair-for-pair and
    cosine-for-cosine, with cross-batch pairs proving the index
    probe (not just co-arrival) found them."""
    import time as _time

    from galaxy_spark.registry import all_queries
    from galaxy_spark.streaming.state_store import (
        ParquetCosinePairStore, ParquetEmbLshStore, ParquetVecStore,
        start_streaming_emb_near_dup_index,
        streaming_emb_near_dup_pairs)

    emb = load_table(spark, SF, "embeddings")
    src = str(tmp_path / "el_src")
    ck = str(tmp_path / "el_ck")
    estore = ParquetEmbLshStore(spark, str(tmp_path / "el_idx"))
    vstore = ParquetVecStore(spark, str(tmp_path / "el_vec"))
    pstore = ParquetCosinePairStore(spark, str(tmp_path / "el_pair"))

    def start():
        stream = spark.readStream.schema(emb.schema) \
            .option("maxFilesPerTrigger", 1).parquet(src)
        return start_streaming_emb_near_dup_index(
            stream, estore, vstore, pstore, ck, threshold=0.4)

    for k in range(2):
        (emb.filter(F.col("vec_id") % 3 == k)
         .coalesce(1).write.mode("append").parquet(src))
        _time.sleep(1.1)
    q = start()
    q.processAllAvailable()
    q.stop()                           # the "kill"
    mid = streaming_emb_near_dup_pairs(pstore).count()
    _time.sleep(1.1)
    (emb.filter(F.col("vec_id") % 3 == 2)
     .coalesce(1).write.mode("append").parquet(src))
    q = start()
    q.processAllAvailable()
    q.stop()

    got = sorted((r.id_a, r.id_b, r.cos_sim)
                 for r in streaming_emb_near_dup_pairs(pstore)
                 .collect())
    want = sorted((r.id_a, r.id_b, r.cos_sim)
                  for r in all_queries()
                  ["dedup_embedding_cosine_lsh"](spark, SF)
                  .collect())
    assert got == want and len(want) > max(mid, 2)
    assert any(a % 3 != b % 3 for a, b, _ in got), \
        "no cross-slice pair: the growing-index probe went untested"


def test_cluster_redirect_replay_regenerates_lost_edges(spark,
                                                        tmp_path):
    """r11 review finding on the clustering twin: the redirect
    store must keep EVERY (label -> target) edge, not a per-label
    MIN — with MIN, a crash that committed (30 -> 10) but lost
    (20 -> 10) made the replay walk short-circuit 30 -> 10 without
    revisiting 20, so the lost redirect was never regenerated and
    docs labeled 20 split off permanently. With the edge set, the
    replay rediscovers 20 through the retained (30 -> 20) edge and
    regenerates the lost row."""
    from galaxy_spark.streaming.state_store import (
        ParquetClusterStore, ParquetRedirectStore, _cluster_partials,
        streaming_cluster_assignments)

    cstore = ParquetClusterStore(spark, str(tmp_path / "rp_c"))
    rstore = ParquetRedirectStore(spark, str(tmp_path / "rp_r"),
                                  n_buckets=8)

    def pairs_df(rows):
        return spark.createDataFrame(rows, "id_a long, id_b long")

    def apply(rows, key):
        red, idp = _cluster_partials(pairs_df(rows), cstore, rstore)
        rstore.merge(red, key)
        cstore.merge(idp, key)

    apply([(30, 40)], "lin.000000000000")   # cluster {30,40} -> 30
    apply([(20, 40)], "lin.000000000001")   # merges to min 20;
    #                                         doc 30's id row still
    #                                         says 30 (untouched)
    # epoch 2 merges everything to min 10: redirect partial =
    # {(30 -> 10), (20 -> 10)} in DIFFERENT store buckets (labels
    # 30 -> bucket 0, 20 -> bucket 4 at n_buckets=8 — asserted, the
    # crash window below needs per-bucket claims to differ)
    red, idp = _cluster_partials(pairs_df([(10, 30)]), cstore,
                                 rstore)
    red = red.localCheckpoint()
    assert (rstore._buckets_for_keys(
        red.filter(F.col("label") == 30).select("label"))
        != rstore._buckets_for_keys(
            red.filter(F.col("label") == 20).select("label")))
    # the "crash": only label 30's bucket commits at this epoch;
    # (20 -> 10) and the id merge are lost
    rstore.merge(red.filter(F.col("label") == 30),
                 "lin.000000000002")
    # the replay: recompute partials from the post-crash stores and
    # merge fully under the SAME epoch key (claimed buckets skip)
    red2, idp2 = _cluster_partials(pairs_df([(10, 30)]), cstore,
                                   rstore)
    rstore.merge(red2, "lin.000000000002")
    cstore.merge(idp2, "lin.000000000002")

    # the historical edge (30 -> 20) must still exist next to the
    # newer (30 -> 10) — that retention is what made the replay
    # rediscover 20
    edges = {(r.label, r.target) for r in rstore.state().collect()}
    assert {(30, 20), (30, 10), (20, 10)} <= edges
    docs = spark.createDataFrame([(i,) for i in (10, 20, 30, 40)],
                                 "doc_id long")
    got = {r.doc_id: r.cluster_id
           for r in streaming_cluster_assignments(docs, cstore,
                                                  rstore).collect()}
    assert got == {10: 10, 20: 10, 30: 10, 40: 10}, \
        f"cluster split after replay: {got}"


@pytest.mark.parametrize("fs", ["posix", "manifest", "manifest_cas"])
def test_state_for_keys_opens_only_touched_buckets(spark, tmp_path,
                                                   monkeypatch, fs):
    """``state_for_keys`` is the probe-side twin of merge's
    touched-bucket discipline (r10 verdict #1): for a bounded key
    set it must OPEN only the bucket dirs those keys hash to —
    spied at the actual parquet read — and the rows it returns,
    key-joined, must equal a full-state read key-joined (the
    superset-restricted-to-buckets contract). Both commit
    strategies prune identically: the layout is above the seam."""
    import pyspark.sql.readwriter as rw

    from galaxy_spark.streaming.state_store import ParquetDocStore
    from galaxy_spark.streaming.store_fs import store_fs

    store = ParquetDocStore(spark, str(tmp_path / "sfk"), n_buckets=8)
    store.fs = store_fs(fs)
    docs = load_table(spark, SF, "documents") \
        .select(F.col("doc_id").alias("id"), "text")
    store.merge(docs, "lin.000000000000")
    keys = docs.select("id").filter(F.col("id").isin(3, 11, 40))
    expected = set(store._buckets_for_keys(keys))
    all_buckets = {int(d.split("-")[1]) for d in os.listdir(store.path)
                   if d.startswith("bucket-")}
    assert expected and expected < all_buckets, \
        "pruning vacuous: pick keys that miss some buckets"

    seen: list[str] = []
    orig = rw.DataFrameReader.parquet

    def spy(self, *paths, **kw):
        seen.extend(paths)
        return orig(self, *paths, **kw)

    monkeypatch.setattr(rw.DataFrameReader, "parquet", spy)
    got = sorted((r.id, r.text)
                 for r in store.state_for_keys(keys)
                 .join(keys, "id").collect())
    opened = {p for p in seen if p.startswith(store.path)}
    assert opened, "probe never read the store"
    for p in opened:
        b = int(p.split("bucket-")[1].split("/")[0].split(os.sep)[0])
        assert b in expected, f"opened untouched bucket {b}"
    monkeypatch.setattr(rw.DataFrameReader, "parquet", orig)
    want = sorted((r.id, r.text)
                  for r in store.state().join(keys, "id").collect())
    assert got == want and len(got) == 3


def test_lsh_probe_reads_are_layout_pruned(spark, tmp_path,
                                           monkeypatch):
    """Per-trigger store-scan I/O tracks the BATCH, not history
    (r10 verdict #1, the round's one weak): probing ONE incoming
    document against a grown index opens only the LSH-store buckets
    its (band, bucket) signatures hash to and only the doc-store
    buckets the candidate ids hash to — never full state — and
    still emits the known pair."""
    import pyspark.sql.readwriter as rw

    from galaxy_spark.operators.dedup import minhash_band_buckets
    from galaxy_spark.registry import all_queries
    from galaxy_spark.streaming.state_store import (ParquetDocStore,
                                                    ParquetLshStore,
                                                    lsh_probe_pairs,
                                                    partial_lsh_index)

    docs = load_table(spark, SF, "documents")
    a, b = sorted((r.id_a, r.id_b) for r in all_queries()
                  ["dedup_minhash_lsh"](spark, SF).collect())[0]
    lsh = ParquetLshStore(spark, str(tmp_path / "pr_lsh"),
                          n_buckets=16)
    dstore = ParquetDocStore(spark, str(tmp_path / "pr_doc"),
                             n_buckets=16)
    hist = docs.filter(F.col("doc_id") != b)     # everything but b
    lsh.merge(partial_lsh_index(hist), "lin.000000000000")
    dstore.merge(hist.select(F.col("doc_id").alias("id"), "text"),
                 "lin.000000000000")

    batch = docs.filter(F.col("doc_id") == b).localCheckpoint()
    exp_lsh = set(lsh._buckets_for_keys(
        minhash_band_buckets(batch).select("band", "bucket")))
    assert len(exp_lsh) <= 8             # one doc = 8 band signatures

    seen: list[str] = []
    orig = rw.DataFrameReader.parquet

    def spy(self, *paths, **kw):
        seen.extend(paths)
        return orig(self, *paths, **kw)

    monkeypatch.setattr(rw.DataFrameReader, "parquet", spy)
    got = sorted((r.id_a, r.id_b)
                 for r in lsh_probe_pairs(batch, lsh, dstore)
                 .collect())
    monkeypatch.setattr(rw.DataFrameReader, "parquet", orig)
    assert (a, b) in got
    lsh_opened = {int(p.split("bucket-")[1].split("/")[0])
                  for p in seen if p.startswith(lsh.path)}
    doc_opened = {int(p.split("bucket-")[1].split("/")[0])
                  for p in seen if p.startswith(dstore.path)}
    assert lsh_opened and lsh_opened <= exp_lsh
    # the candidate id set is known only inside the probe (it may
    # hold band-collision false positives beyond {a, b}), so the
    # doc-read contract asserted here is the pruning itself: a
    # STRICT subset of the store's buckets was opened (one incoming
    # doc admits a handful of candidates — deterministic corpus +
    # seed, so the subset is stable)
    all_doc = {int(d.split("-")[1]) for d in os.listdir(dstore.path)
               if d.startswith("bucket-")}
    assert doc_opened and doc_opened < all_doc


def test_partial_kmv_avoids_single_task_window(spark):
    """r10 verdict #2: the per-side pre-truncation must not funnel
    a side's whole batch through one task — no Window in the plan —
    and the two-level salted fold's contents must equal the min-k
    distinct hashes computed independently."""
    from galaxy_spark.plans import physical_plan
    from galaxy_spark.queries.indexing import _kmv_hv
    from galaxy_spark.streaming.state_store import partial_kmv

    df = _orders_fo(spark)
    part = partial_kmv(df, "o_orderstatus", "o_custkey", k=16)
    p = physical_plan(part)
    assert "Window" not in p
    want: dict = {}
    for r in (df.select(F.col("o_orderstatus").alias("side"),
                        _kmv_hv(F.col("o_custkey")).alias("hv"))
              .distinct().collect()):
        want.setdefault(r.side, set()).add(r.hv)
    assert {r.side: list(r.hvs) for r in part.collect()} == \
        {s: sorted(hs)[:16] for s, hs in want.items()}


# ------------------------------------------------------------------
# Streaming KMV sketches on the durable store
# ------------------------------------------------------------------

def _orders_fo(spark):
    return (load_table(spark, SF, "orders")
            .filter(F.col("o_orderstatus").isin("F", "O"))
            .select("o_orderkey", "o_orderstatus", "o_custkey"))


def test_streaming_kmv_matches_batch_sketch(spark, tmp_path):
    """The accumulated per-side KMV sketches equal the batch tier's
    min-k frames ELEMENT-FOR-ELEMENT, and the union-sketch
    instrument reproduces the registered query's (cnt, hk, j)
    integers exactly. Plus the monoid's replay story: a re-merged
    full partial under a fresh epoch key cannot move a sketch."""
    import time as _time

    from galaxy_spark.queries.indexing import _KMV_K, _kmv_hv
    from galaxy_spark.registry import all_queries
    from galaxy_spark.streaming.state_store import (
        ParquetKmvStore, partial_kmv, start_streaming_kmv,
        streaming_kmv_sketch, streaming_kmv_union_stats)

    od = _orders_fo(spark)
    src = str(tmp_path / "kmv_src")
    for k in range(3):
        (od.filter(F.col("o_orderkey") % 3 == k)
         .coalesce(1).write.mode("append").parquet(src))
        _time.sleep(1.1)

    store = ParquetKmvStore(spark, str(tmp_path / "kmv_store"))
    stream = spark.readStream.schema(od.schema) \
        .option("maxFilesPerTrigger", 1).parquet(src)
    q = start_streaming_kmv(stream, store, str(tmp_path / "kmv_ck"),
                            side_col="o_orderstatus",
                            key_col="o_custkey")
    q.processAllAvailable()
    q.stop()

    got = sorted((r.side, r.hv)
                 for r in streaming_kmv_sketch(store).collect())
    want = []
    for side in ("F", "O"):
        rows = (od.filter(F.col("o_orderstatus") == side)
                .select(_kmv_hv(F.col("o_custkey")).alias("hv"))
                .distinct().orderBy("hv").limit(_KMV_K).collect())
        want += [(side, r.hv) for r in rows]
    assert got == sorted(want) and len(want) > 10

    got_u = streaming_kmv_union_stats(store, "F", "O").collect()[0]
    want_u = all_queries()["agg_kmv_set_intersection"](
        spark, SF).collect()[0]
    assert (got_u.cnt, got_u.hk, got_u.j) == \
        (want_u.cnt, want_u.hk, want_u.j)
    want_d = all_queries()["agg_kmv_set_difference"](
        spark, SF).collect()[0]
    assert (got_u.j_ab, got_u.j_ba) == (want_d.j_ab, want_d.j_ba)

    # idempotence without the claim: full-corpus partial, new epoch
    store.merge(partial_kmv(od, "o_orderstatus", "o_custkey",
                            store.k), "zzreplay.000000000099")
    assert sorted((r.side, r.hv)
                  for r in streaming_kmv_sketch(store).collect()) == got


def test_streaming_kmv_restart_and_truncation(spark, tmp_path):
    """Kill/restart mid-stream at a small k (so every merge runs in
    the TRUNCATING regime — the monoid claim under stress): the
    resumed store still equals the batch min-k over everything."""
    import time as _time

    from galaxy_spark.queries.indexing import _kmv_hv
    from galaxy_spark.streaming.state_store import (
        ParquetKmvStore, start_streaming_kmv, streaming_kmv_sketch)

    od = _orders_fo(spark)
    src = str(tmp_path / "kmvr_src")
    (od.filter(F.col("o_orderkey") % 2 == 0)
     .coalesce(1).write.mode("append").parquet(src))

    store = ParquetKmvStore(spark, str(tmp_path / "kmvr_store"), k=16)
    ck = str(tmp_path / "kmvr_ck")

    def start():
        stream = spark.readStream.schema(od.schema) \
            .option("maxFilesPerTrigger", 1).parquet(src)
        return start_streaming_kmv(stream, store, ck,
                                   side_col="o_orderstatus",
                                   key_col="o_custkey")

    q = start()
    q.processAllAvailable()
    q.stop()                           # the "kill"
    _time.sleep(1.1)
    (od.filter(F.col("o_orderkey") % 2 == 1)
     .coalesce(1).write.mode("append").parquet(src))
    q = start()
    q.processAllAvailable()
    q.stop()

    got = sorted((r.side, r.hv)
                 for r in streaming_kmv_sketch(store).collect())
    want = []
    for side in ("F", "O"):
        rows = (od.filter(F.col("o_orderstatus") == side)
                .select(_kmv_hv(F.col("o_custkey")).alias("hv"))
                .distinct().orderBy("hv").limit(16).collect())
        want += [(side, r.hv) for r in rows]
    assert got == sorted(want) and len(got) == 32


def test_streaming_kmv_union_stats_with_one_empty_side(spark,
                                                       tmp_path):
    """r10 review: before the second side's first row arrives, the
    union stats must treat it as the EMPTY set — j = 0, not NULL
    (array_intersect against NULL nulled the whole column)."""
    from galaxy_spark.queries.indexing import _kmv_hv
    from galaxy_spark.streaming.state_store import (
        ParquetKmvStore, partial_kmv, streaming_kmv_union_stats)

    od = _orders_fo(spark).filter(F.col("o_orderstatus") == "F")
    store = ParquetKmvStore(spark, str(tmp_path / "kmv_one"), k=16)
    store.merge(partial_kmv(od, "o_orderstatus", "o_custkey", 16),
                "lin.000000000000")
    row = streaming_kmv_union_stats(store, "F", "O").collect()[0]
    want_cnt = (od.select(_kmv_hv(F.col("o_custkey")).alias("hv"))
                .distinct().count())
    assert row.j == 0 and row.cnt == min(want_cnt, 16)
    assert row.hk is not None


def test_near_dup_emissions_invariant_under_batch_splits(spark,
                                                         tmp_path):
    """The replay/ordering property behind the growing index: the
    UNION of per-batch emissions equals the batch answer under ANY
    partition of the corpus into arrival batches — including
    arrival orders where the 'later' half of a pair streams FIRST.
    Drives the store merges directly (no streaming query) so three
    split shapes stay cheap."""
    from galaxy_spark.registry import all_queries
    from galaxy_spark.streaming.state_store import (
        lsh_probe_pairs, partial_lsh_index, streaming_near_dup_pairs)

    docs = load_table(spark, SF, "documents")
    want = sorted((r.id_a, r.id_b, r.jaccard)
                  for r in all_queries()["dedup_minhash_lsh"](
                      spark, SF).collect())
    shapes = {
        "asc": [docs.filter(F.col("doc_id") % 4 == k)
                for k in range(4)],
        "desc": [docs.filter(F.col("doc_id") % 4 == k)
                 for k in (3, 2, 1, 0)],
        "one": [docs],
    }
    for tag, batches in shapes.items():
        lsh, dstore, pairs = _near_dup_stores(spark, tmp_path,
                                              f"split_{tag}")
        for i, batch in enumerate(batches):
            key = f"lin.{i:012d}"
            pairs.merge(lsh_probe_pairs(batch, lsh, dstore), key)
            lsh.merge(partial_lsh_index(batch), key)
            dstore.merge(batch.select(F.col("doc_id").alias("id"),
                                      "text"), key)
        got = sorted((r.id_a, r.id_b, r.jaccard)
                     for r in streaming_near_dup_pairs(pairs)
                     .collect())
        assert got == want, f"split shape {tag!r} diverged"


def test_near_dup_stores_survive_rebucket(spark, tmp_path):
    """The new stores inherit the generic rebucket() migration —
    pin it for the pair store (results) and the LSH index
    (membership): state is identical element-for-element after
    moving to a different bucket count."""
    from galaxy_spark.registry import all_queries
    from galaxy_spark.streaming.state_store import (
        ParquetLshStore, ParquetPairStore, lsh_probe_pairs,
        partial_lsh_index, rebucket, streaming_near_dup_pairs)

    docs = load_table(spark, SF, "documents")
    lsh, dstore, pairs = _near_dup_stores(spark, tmp_path, "rb")
    key = "lin.000000000000"
    pairs.merge(lsh_probe_pairs(docs, lsh, dstore), key)
    lsh.merge(partial_lsh_index(docs), key)
    dstore.merge(docs.select(F.col("doc_id").alias("id"), "text"),
                 key)
    want = sorted((r.id_a, r.id_b, r.jaccard)
                  for r in streaming_near_dup_pairs(pairs).collect())
    assert want == sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in all_queries()["dedup_minhash_lsh"](
            spark, SF).collect())

    pairs2 = rebucket(pairs, str(tmp_path / "rb_pairs7"),
                      n_buckets=7)
    assert isinstance(pairs2, ParquetPairStore)
    assert sorted((r.id_a, r.id_b, r.jaccard)
                  for r in streaming_near_dup_pairs(pairs2)
                  .collect()) == want

    lsh2 = rebucket(lsh, str(tmp_path / "rb_lsh5"), n_buckets=5)
    assert isinstance(lsh2, ParquetLshStore)
    assert lsh2.state().count() == lsh.state().count()
    a = sorted(map(tuple, lsh.state()
                   .select("band", "bucket", "id").collect()))
    b = sorted(map(tuple, lsh2.state()
                   .select("band", "bucket", "id").collect()))
    assert a == b


# ------------------------------------------------------------------
# Delta-tier merges (r11): O(batch) appends + amortized compaction
# ------------------------------------------------------------------

def _sum_store(spark, path, delta, fs="posix"):
    from galaxy_spark.streaming.state_store import KeyedParquetStore

    return KeyedParquetStore(
        spark, path, ["k"],
        [F.sum("v").cast("long").alias("v"),
         F.max("last").alias("last")],
        n_buckets=4, state_schema="k long, v long, last string",
        delta_threshold=delta, fs=fs)


_DELTA_BATCHES = [
    [(1, 10, "a"), (2, 5, "b"), (9, 1, "c")],
    [(1, 3, "d"), (3, 7, "e")],
    [(2, 2, "f"), (9, 4, "g"), (4, 1, "h")],
    [(1, 1, "i")],
    [(5, 5, "j"), (9, 9, "k"), (1, 2, "l")],
    [(3, 3, "m"), (9, 1, "n")],
]


def _batch_df(spark, rows):
    return spark.createDataFrame(rows, "k long, v long, last string")


@pytest.mark.parametrize("threshold", [1, 2, 4])
def test_delta_tier_state_matches_cow(spark, tmp_path, threshold):
    """The delta tier is a WRITE strategy, never a semantics change:
    after every epoch (and after a replayed epoch) a delta-tier
    store's folded state equals the copy-on-write twin's, row for
    row. Thresholds cover compact-every-touch (1), mid-stream
    compaction (2) and a never-compacted tail (4)."""
    cow = _sum_store(spark, str(tmp_path / "cow"), None)
    dlt = _sum_store(spark, str(tmp_path / f"d{threshold}"),
                     threshold)
    for i, rows in enumerate(_DELTA_BATCHES):
        key = f"lin.{i:012d}"
        cow.merge(_batch_df(spark, rows), key)
        dlt.merge(_batch_df(spark, rows), key)
        want = sorted(map(tuple, cow.state().collect()))
        got = sorted(map(tuple, dlt.state().collect()))
        assert got == want, f"divergence at epoch {i}"
    # at-least-once replay of the last epoch: both skip
    last = f"lin.{len(_DELTA_BATCHES) - 1:012d}"
    dlt.merge(_batch_df(spark, _DELTA_BATCHES[-1]), last)
    assert sorted(map(tuple, dlt.state().collect())) == want


def test_delta_merge_reads_no_state(spark, tmp_path, monkeypatch):
    """THE write-amplification pin: a non-compacting delta merge
    performs ZERO reads of store state (its I/O is the batch,
    full stop), and the compacting merge reads ONLY the ripe
    buckets' own dirs. CoW pays a touched-bucket rewrite per epoch;
    the delta tier pays O(batch) now and the bucket rewrite once
    per `threshold` touches — the difference between per-trigger
    and amortized bucket I/O at 100 TB state."""
    import pyspark.sql.readwriter as rw

    store = _sum_store(spark, str(tmp_path / "wa"), 3)
    seen: list[str] = []
    orig = rw.DataFrameReader.parquet

    def spy(self, *paths, **kw):
        seen.extend(paths)
        return orig(self, *paths, **kw)

    monkeypatch.setattr(rw.DataFrameReader, "parquet", spy)
    rows = [(1, 1, "x"), (2, 1, "y")]          # one bucket pair,
    for i in range(2):                         # touched every epoch
        store.merge(_batch_df(spark, rows), f"lin.{i:012d}")
    state_reads = [p for p in seen if p.startswith(store.path)]
    assert state_reads == [], \
        f"delta merge read store state: {state_reads}"
    seen.clear()
    store.merge(_batch_df(spark, rows), f"lin.{2:012d}")  # 3rd delta
    opened = [p for p in seen if p.startswith(store.path)]
    assert opened, "threshold hit but no compaction read"
    touched = {int(p.split("bucket-")[1].split(os.sep)[0])
               for p in opened}
    assert touched <= set(store._buckets_for_keys(
        _batch_df(spark, rows).select("k")))
    monkeypatch.setattr(rw.DataFrameReader, "parquet", orig)
    # post-compaction layout: ripe buckets hold ONE base, no deltas
    for b in touched:
        bd = store._bucket_dir(b)
        assert len([v for v in os.listdir(bd)
                    if v.startswith("v-")]) == 1
        assert not [v for v in os.listdir(bd) if v.startswith("d-")]


def test_delta_crash_mid_compaction_no_double_count(spark, tmp_path):
    """Crash window between the compacted base's commit and the
    absorbed deltas' vacuum: the leftover delta sits at-or-below
    the base epoch, so reads ignore it (strictly-above rule) and
    the next merge sweeps it."""
    import shutil as _sh

    store = _sum_store(spark, str(tmp_path / "cr"), 2)
    store.merge(_batch_df(spark, [(1, 10, "a")]), "lin.000000000000")
    b = store._buckets_for_keys(
        _batch_df(spark, [(1, 10, "a")]).select("k"))[0]
    bd = store._bucket_dir(b)
    saved = str(tmp_path / "saved_delta")
    _sh.copytree(os.path.join(bd, "d-lin.000000000000"), saved)
    store.merge(_batch_df(spark, [(1, 5, "b")]),
                "lin.000000000001")               # compacts: v=15
    # resurrect the absorbed delta = the un-vacuumed crash leftover
    _sh.copytree(saved, os.path.join(bd, "d-lin.000000000000"))
    got = {(r.k, r.v) for r in store.state().collect()}
    assert got == {(1, 15)}, f"double-counted absorbed delta: {got}"
    store.merge(_batch_df(spark, [(1, 1, "c")]), "lin.000000000002")
    assert not os.path.isdir(os.path.join(bd, "d-lin.000000000000")), \
        "next merge did not sweep the absorbed delta"
    got = {(r.k, r.v) for r in store.state().collect()}
    assert got == {(1, 16)}


def test_delta_torn_write_cleared_on_replay(spark, tmp_path):
    """A torn delta (crash between rename and _COMMITTED) is
    invisible to reads and is cleared by the epoch's replay —
    same contract the CoW tier has for torn bases."""
    store = _sum_store(spark, str(tmp_path / "torn"), 4)
    rows = [(7, 3, "t")]
    b = store._buckets_for_keys(
        _batch_df(spark, rows).select("k"))[0]
    torn = os.path.join(store._bucket_dir(b), "d-lin.000000000000")
    os.makedirs(torn)
    with open(os.path.join(torn, "part-junk.parquet"), "wb") as f:
        f.write(b"not parquet")
    assert store.state().count() == 0      # torn: never readable
    store.merge(_batch_df(spark, rows), "lin.000000000000")
    assert {(r.k, r.v) for r in store.state().collect()} == {(7, 3)}
    assert os.path.exists(os.path.join(torn, "_COMMITTED"))


def test_delta_threshold_flip_both_directions(spark, tmp_path):
    """delta_threshold is a pure write-strategy knob: flipping a
    live store CoW -> delta -> CoW between epochs never changes
    state — the CoW merge absorbs committed deltas below its epoch
    and its vacuum sweeps them."""
    cow = _sum_store(spark, str(tmp_path / "flip_ref"), None)
    st = _sum_store(spark, str(tmp_path / "flip"), None)
    plan = [None, None, 3, 3, None, 2]
    for i, (rows, mode) in enumerate(zip(_DELTA_BATCHES, plan)):
        key = f"lin.{i:012d}"
        st.delta_threshold = mode
        st.merge(_batch_df(spark, rows), key)
        cow.merge(_batch_df(spark, rows), key)
        assert sorted(map(tuple, st.state().collect())) == \
            sorted(map(tuple, cow.state().collect())), \
            f"flip divergence at epoch {i} (mode={mode})"
    # the CoW epoch at i=4 must have swept the i=2/3 deltas it
    # absorbed for the buckets it touched
    for b in st._buckets_for_keys(
            _batch_df(spark, _DELTA_BATCHES[4]).select("k")):
        bd = st._bucket_dir(b)
        below = [v for v in os.listdir(bd) if v.startswith("d-")
                 and v[2:] <= "lin.000000000004"]
        assert not below, f"unswept absorbed deltas: {below}"


def test_delta_store_rebucket_carries_mode_and_state(spark, tmp_path):
    """rebucket() from a delta-tier store (max claimed epoch may
    live in a delta, not a base) reproduces the folded state and
    carries the write-strategy knob."""
    from galaxy_spark.streaming.state_store import rebucket

    st = _sum_store(spark, str(tmp_path / "rb_src"), 5)
    for i, rows in enumerate(_DELTA_BATCHES[:3]):
        st.merge(_batch_df(spark, rows), f"lin.{i:012d}")
    assert any(v.startswith("d-")                 # precondition:
               for b in range(st.n_buckets)       # uncompacted
               if os.path.isdir(st._bucket_dir(b))
               for v in os.listdir(st._bucket_dir(b)))
    with pytest.warns(UserWarning):
        nb = rebucket(st, str(tmp_path / "rb_dst"), 8)
    assert nb.delta_threshold == 5
    assert sorted(map(tuple, nb.state().collect())) == \
        sorted(map(tuple, st.state().collect()))
    # the carried epoch is the max CLAIMED epoch (a delta): a
    # replay of that epoch against the new store must skip
    nb.merge(_batch_df(spark, _DELTA_BATCHES[2]), "lin.000000000002")
    assert sorted(map(tuple, nb.state().collect())) == \
        sorted(map(tuple, st.state().collect()))


# ------------------------------------------------------------------
# Streaming OLS twin (r11): SUM-monoid sufficient statistics
# ------------------------------------------------------------------

def test_streaming_ols_matches_batch_fit(spark, tmp_path):
    """Streaming per-key OLS on the durable store == the flagship
    batch fit FIELD-FOR-FIELD: every sufficient statistic is an
    exact integer under SUM (int64 + DECIMAL(38,0)), so slicing the
    corpus into micro-batches cannot move the model. Runs the store
    in DELTA-TIER mode (threshold 2) — a real pipeline exercising
    O(batch) appends over DECIMAL state — with a kill/restart in
    the middle of the replay corpus."""
    import time as _time

    from galaxy_spark.queries.ml import ols_partial_stats
    from galaxy_spark.registry import all_queries
    from galaxy_spark.streaming.state_store import (
        ParquetOlsStore, start_streaming_ols,
        streaming_ols_estimates)

    li = load_table(spark, SF, "lineitem")
    src = str(tmp_path / "ols_src")
    for k in range(3):
        (li.filter(F.col("l_orderkey") % 3 == k)
         .coalesce(1).write.mode("append").parquet(src))
        _time.sleep(1.1)

    store = ParquetOlsStore(spark, str(tmp_path / "ols_store"),
                            key_col="returnflag")
    store.delta_threshold = 2
    ck = str(tmp_path / "ols_ck")

    def start():
        stream = spark.readStream.schema(li.schema) \
            .option("maxFilesPerTrigger", 1).parquet(src)
        return start_streaming_ols(stream, store, ck,
                                   key=F.col("l_returnflag"))

    q = start()                       # kill after the first batch:
    while True:                       # resume must replay/continue
        done = os.path.join(ck, "commits", "0")
        if os.path.exists(done):
            break
        _time.sleep(0.1)
    q.stop()
    q = start()
    q.processAllAvailable()
    q.stop()

    got = sorted(map(tuple, streaming_ols_estimates(store)
                     .collect()))
    want = sorted(map(tuple, all_queries()
                      ["ml_ols_price_on_quantity"](spark, SF)
                      .collect()))
    assert got == want and len(want) == 3

    # monoid sanity the solve hides: the stored statistics are the
    # batch fold's exact integers (pre-cast), not approximations
    exact = {r.returnflag: (r.n, r.sx, r.sy, r.sxx, r.sxy, r.syy)
             for r in ols_partial_stats(
                 li, F.col("l_returnflag"), "returnflag").collect()}
    stored = {r.returnflag: (r.n, r.sx, r.sy, r.sxx, r.sxy, r.syy)
              for r in store.state().collect()}
    assert stored == exact


# ------------------------------------------------------------------
# Streaming sessionization twin (r11): gap-merge closure store
# ------------------------------------------------------------------

def test_streaming_sessions_match_batch(spark, tmp_path):
    """Streaming sessionization on the durable store ==
    ``events_sessionization`` FIELD-FOR-FIELD over the replayed
    corpus — with the nastiest possible slicing: events interleave
    across micro-batches by event_id, so most sessions SPAN batches
    and reassemble purely through the gap-merge closure's
    associativity. Includes a kill/restart after the first
    commit."""
    import time as _time

    from galaxy_spark.registry import all_queries
    from galaxy_spark.streaming.state_store import (
        ParquetSessionStore, start_streaming_sessions,
        streaming_session_rows)

    ev = load_table(spark, SF, "events")
    src = str(tmp_path / "sess_src")
    for k in range(3):                # interleaved-in-time slices
        (ev.filter(F.col("event_id") % 3 == k)
         .coalesce(1).write.mode("append").parquet(src))
        _time.sleep(1.1)

    store = ParquetSessionStore(spark, str(tmp_path / "sess_store"))
    ck = str(tmp_path / "sess_ck")

    def start():
        stream = spark.readStream.schema(ev.schema) \
            .option("maxFilesPerTrigger", 1).parquet(src)
        return start_streaming_sessions(stream, store, ck)

    q = start()
    while not os.path.exists(os.path.join(ck, "commits", "0")):
        _time.sleep(0.1)
    q.stop()
    q = start()
    q.processAllAvailable()
    q.stop()

    got = sorted((r.user_id, r.session_id, r.n_events,
                  r.session_value, r.session_start)
                 for r in streaming_session_rows(store).collect())
    want = sorted((r.user_id, r.session_id, r.n_events,
                   r.session_value, r.session_start)
                  for r in all_queries()["events_sessionization"](
                      spark, SF).collect())
    assert len(got) == len(want) > 500
    assert got == want
    # non-vacuous: sessions must actually span arrival slices
    assert any(n > 1 for _, _, n, _, _ in got), \
        "all sessions are singletons: the merge went untested"


def test_delta_review_fixes(spark, tmp_path):
    """r11 review wave: (a) a stray FILE named bucket-* is noise,
    not a NotADirectoryError inside the lineage check; (b) the
    delta_threshold guard holds on the blessed (attribute) mutation
    path; (c) the read fold is scoped to delta-bearing buckets —
    compacted buckets stay scan-only (one aggregate under a union);
    (d) an un-written ParquetOlsStore's empty state carries the
    declared key TYPE."""
    from galaxy_spark.plans import physical_plan
    from galaxy_spark.streaming.state_store import ParquetOlsStore

    st = _sum_store(spark, str(tmp_path / "rf"), 2)
    # (b) setter guard
    with pytest.raises(ValueError):
        st.delta_threshold = 0
    # rows 1 and 2 land in different buckets (checked below)
    df0 = _batch_df(spark, [(1, 1, "a"), (2, 1, "b")])
    b1, b2 = (st._buckets_for_keys(
        _batch_df(spark, [(k, 0, "")]).select("k"))[0]
        for k in (1, 2))
    assert b1 != b2, "pick keys that hash apart"
    st.merge(df0, "lin.000000000000")
    st.merge(_batch_df(spark, [(1, 1, "c")]), "lin.000000000001")
    # bucket b1 compacted (2 deltas >= threshold), b2 holds a delta
    assert [v for v in os.listdir(st._bucket_dir(b1))
            if v.startswith("d-")] == []
    assert [v for v in os.listdir(st._bucket_dir(b2))
            if v.startswith("d-")]
    # (a) stray file named bucket-junk
    with open(os.path.join(st.path, "bucket-junk"), "w") as f:
        f.write("noise")
    assert st.lineages() == {"lin"}
    # (c) selective fold: union of a scan-only branch and ONE fold
    got = {(r.k, r.v) for r in st.state().collect()}
    assert got == {(1, 2), (2, 1)}
    p = physical_plan(st.state())
    assert "Union" in p, "compacted bucket must bypass the fold"
    assert p.count("partial_max") == 1, \
        "exactly one fold branch (the delta-bearing bucket)"
    # (d) typed empty state for a long-keyed OLS store
    ols = ParquetOlsStore(spark, str(tmp_path / "rf_ols"),
                          key_col="partkey", key_type="long")
    assert dict(ols.state().dtypes)["partkey"] == "bigint"


# ------------------------------------------------------------------
# Streaming search index (r11): postings + doc-len + corpus stats
# ------------------------------------------------------------------

def test_streaming_search_index_matches_batch(spark, tmp_path,
                                              monkeypatch):
    """The incrementally-maintained index equals the batch
    ``text_inverted_index`` row-for-row and its BM25 reader equals
    ``text_bm25_search`` row-for-row — and the QUERY reads are
    layout-pruned: postings open only the query terms' buckets,
    doc lengths only the candidate docs' buckets (spied at the
    parquet read), never full state."""
    import time as _time

    import pyspark.sql.readwriter as rw

    from galaxy_spark.queries.indexing import _BM25_TERMS
    from galaxy_spark.registry import all_queries
    from galaxy_spark.streaming.state_store import (
        ParquetCorpusStatsStore, ParquetDocLenStore,
        ParquetPostingsStore, start_streaming_search_index,
        streaming_bm25, streaming_inverted_index)

    docs = load_table(spark, SF, "documents")
    src = str(tmp_path / "six_src")
    for k in range(3):
        (docs.filter(F.col("doc_id") % 3 == k)
         .coalesce(1).write.mode("append").parquet(src))
        _time.sleep(1.1)

    postings = ParquetPostingsStore(spark,
                                    str(tmp_path / "six_post"))
    # 32 dl buckets: the template corpus's rarest term still hits
    # 25 docs, which covers all 8 default buckets — strict-subset
    # pruning needs the layout finer than the candidate set
    doclen = ParquetDocLenStore(spark, str(tmp_path / "six_dl"),
                                n_buckets=32)
    stats = ParquetCorpusStatsStore(spark, str(tmp_path / "six_st"))
    stream = spark.readStream.schema(docs.schema) \
        .option("maxFilesPerTrigger", 1).parquet(src)
    q = start_streaming_search_index(stream, postings, doclen,
                                     stats, str(tmp_path / "six_ck"))
    q.processAllAvailable()
    q.stop()

    got_ix = sorted((r.term, r.df, tuple(r.postings))
                    for r in streaming_inverted_index(postings)
                    .collect())
    want_ix = sorted((r.term, r.df, tuple(r.postings))
                     for r in all_queries()["text_inverted_index"](
                         spark, SF).collect())
    assert got_ix == want_ix and len(want_ix) > 20

    probe = spark.createDataFrame([(t,) for t in _BM25_TERMS],
                                  "term string")
    exp_post = set(postings._buckets_for_keys(probe))
    all_post = set(postings._bucket_ids())
    assert exp_post < all_post, \
        "pruning vacuous: query terms hash to every bucket"

    seen: list[str] = []
    orig = rw.DataFrameReader.parquet

    def spy(self, *paths, **kw):
        seen.extend(paths)
        return orig(self, *paths, **kw)

    monkeypatch.setattr(rw.DataFrameReader, "parquet", spy)
    got_bm = [(r.doc_id, r.bm25, r.n_terms)
              for r in streaming_bm25(postings, doclen, stats,
                                      _BM25_TERMS).collect()]
    monkeypatch.setattr(rw.DataFrameReader, "parquet", orig)
    want_bm = [(r.doc_id, r.bm25, r.n_terms)
               for r in all_queries()["text_bm25_search"](
                   spark, SF).collect()]
    assert got_bm == want_bm and len(want_bm) == 20

    post_opened = {int(p.split("bucket-")[1].split(os.sep)[0])
                   for p in seen if p.startswith(postings.path)}
    assert post_opened and post_opened <= exp_post
    # every INDEXED term here matches ~80% of this template corpus
    # (candidates cover all dl buckets — pruning correct but
    # vacuous), so demonstrate STRICT dl pruning with a genuinely
    # rare term from the raw postings (the store keeps all terms;
    # df >= 5 is a read-time filter)
    rare_row = (postings.state().groupBy("term")
                .agg(F.count("*").alias("df"))
                .orderBy("df", "term").limit(1).collect())[0]
    assert rare_row.df < doclen.n_buckets, \
        "corpus changed: rarest term no longer rarer than buckets"
    seen.clear()
    monkeypatch.setattr(rw.DataFrameReader, "parquet", spy)
    rare_hits = streaming_bm25(postings, doclen, stats,
                               (rare_row.term,)).collect()
    monkeypatch.setattr(rw.DataFrameReader, "parquet", orig)
    assert 1 <= len(rare_hits) <= 20
    dl_opened = {int(p.split("bucket-")[1].split(os.sep)[0])
                 for p in seen if p.startswith(doclen.path)}
    assert dl_opened and dl_opened < set(doclen._bucket_ids()), \
        "doc-length read was not candidate-pruned"
    rare_post = {int(p.split("bucket-")[1].split(os.sep)[0])
                 for p in seen if p.startswith(postings.path)}
    assert len(rare_post) == 1          # one term -> one bucket


# ------------------------------------------------------------------
# Streaming decay-score twin (r11): per-(user, day) SUM statistics
# ------------------------------------------------------------------

def test_streaming_decay_scores_match_batch(spark, tmp_path):
    """The read-time decay fold over accumulated per-(user, day)
    counts equals ``events_decay_score`` field-for-field — the
    anchor re-derives from state, so the twin stays correct as the
    stream's newest day advances (scores are NOT a monoid; the
    day layer is). Delta-tier store, interleaved slices."""
    import time as _time

    from galaxy_spark.registry import all_queries
    from galaxy_spark.streaming.state_store import (
        ParquetUserDayStore, start_streaming_user_days,
        streaming_decay_scores)

    ev = load_table(spark, SF, "events")
    src = str(tmp_path / "ud_src")
    for k in range(3):
        (ev.filter(F.col("event_id") % 3 == k)
         .coalesce(1).write.mode("append").parquet(src))
        _time.sleep(1.1)

    store = ParquetUserDayStore(spark, str(tmp_path / "ud_store"))
    store.delta_threshold = 2
    stream = spark.readStream.schema(ev.schema) \
        .option("maxFilesPerTrigger", 1).parquet(src)
    q = start_streaming_user_days(stream, store,
                                  str(tmp_path / "ud_ck"))
    q.processAllAvailable()
    q.stop()

    got = sorted((r.user_id, r.decay_score, r.purchase_score,
                  r.n_recent)
                 for r in streaming_decay_scores(store).collect())
    want = sorted((r.user_id, r.decay_score, r.purchase_score,
                   r.n_recent)
                  for r in all_queries()["events_decay_score"](
                      spark, SF).collect())
    assert got == want and len(want) >= 15

    # the same state serves DAU/WAU stickiness (r14, third
    # reader): state rows ARE the distinct (user, day) frame
    from galaxy_spark.streaming.state_store import \
        streaming_stickiness
    got_s = sorted((r.day, r.dau, r.wau, r.stickiness_bp)
                   for r in streaming_stickiness(store).collect())
    want_s = sorted((r.day, r.dau, r.wau, r.stickiness_bp)
                    for r in all_queries()[
                        "events_stickiness_dau_wau"](
                        spark, SF).collect())
    assert got_s == want_s and len(want_s) >= 20


# ------------------------------------------------------------------
# Streaming funnel twin (r11): event-time index under set-union
# ------------------------------------------------------------------

def test_streaming_funnel_matches_batch(spark, tmp_path):
    """The stage-gated funnel off the accumulated event-time index
    equals ``events_funnel_conversion`` field-for-field — with
    events interleaved across micro-batches, so late-arriving
    earlier views re-gate which clicks qualify (the case bounded
    per-user scalars get wrong). Set-union fold => also
    replay-insensitive beyond the epoch claim: a fresh-epoch
    re-merge of a full slice cannot move the index."""
    import time as _time

    from galaxy_spark.registry import all_queries
    from galaxy_spark.streaming.state_store import (
        ParquetEventIndexStore, partial_event_index,
        start_streaming_event_index, streaming_funnel)

    ev = load_table(spark, SF, "events")
    src = str(tmp_path / "fun_src")
    for k in range(3):
        (ev.filter(F.col("event_id") % 3 == k)
         .coalesce(1).write.mode("append").parquet(src))
        _time.sleep(1.1)

    store = ParquetEventIndexStore(spark, str(tmp_path / "fun_store"))
    store.delta_threshold = 2
    stream = spark.readStream.schema(ev.schema) \
        .option("maxFilesPerTrigger", 1).parquet(src)
    q = start_streaming_event_index(stream, store,
                                    str(tmp_path / "fun_ck"))
    q.processAllAvailable()
    q.stop()

    def rows(df):
        return sorted((r.user_id, r.t_view, r.t_click, r.t_purchase)
                      for r in df.collect())

    got = rows(streaming_funnel(store))
    want = rows(all_queries()["events_funnel_conversion"](spark, SF))
    assert got == want and len(want) >= 10
    # non-vacuous gating: some user must have a click at-or-before
    # their first view, so t_click is NOT simply min(click ts) —
    # the case bounded per-user scalars get wrong (r11 review wave
    # 3: the earlier any-click assertion was satisfied by ordinary
    # view-then-click users and would not notice a regenerated
    # dataset losing the gated case)
    minc = {r.user_id: r.mc for r in
            ev.filter(F.col("event_type") == "click")
            .groupBy("user_id").agg(F.min("ts").alias("mc"))
            .collect()}
    gated = [(u, tv, tc) for u, tv, tc, _ in want
             if u in minc and minc[u] <= tv]
    assert gated, "dataset lost the gated-click case"
    assert all(tc is None or tc > minc[u] for u, tv, tc in gated)

    # the same index serves RETENTION (one store, many readers)
    from galaxy_spark.streaming.state_store import streaming_retention
    got_r = sorted((r.cohort_week, r.week_offset, r.n_users)
                   for r in streaming_retention(store).collect())
    want_r = sorted((r.cohort_week, r.week_offset, r.n_users)
                    for r in all_queries()["events_retention_cohorts"](
                        spark, SF).collect())
    assert got_r == want_r and len(want_r) >= 3

    # the same index serves the WINDOWED funnel too (r13 verdict
    # #5): 24 h stage bounds as extra array-filter residuals
    from galaxy_spark.streaming.state_store import \
        streaming_funnel_windowed
    got_w = rows(streaming_funnel_windowed(store))
    want_w = rows(all_queries()["events_funnel_windowed"](spark, SF))
    assert got_w == want_w and len(want_w) >= 10
    # the bound must bite somewhere, or the windowed reader is
    # indistinguishable from the unbounded one on this dataset
    assert got_w != got

    # idempotence WITHOUT the claim: full-slice re-merge, new epoch
    lin = sorted(store.lineages())[0]
    store.merge(partial_event_index(
        ev.filter(F.col("event_id") % 3 == 0)),
        f"zz{lin}.000000000099")
    assert rows(streaming_funnel(store)) == got
    assert sorted((r.cohort_week, r.week_offset, r.n_users)
                  for r in streaming_retention(store).collect()) == got_r
    assert rows(streaming_funnel_windowed(store)) == got_w


def test_streaming_attribution_matches_batch(spark, tmp_path):
    """Daily last-touch attribution off the purchase-fact store +
    the click index (r13 verdict #5): one hub write path, two
    idempotent set-union stores, kill/restart mid-stream, a
    whole-slice re-merge under a fresh epoch — and the reader
    equals ``events_attribution_last_touch`` field-for-field over
    the replayed corpus."""
    import time as _time

    from galaxy_spark.registry import all_queries
    from galaxy_spark.streaming.state_store import (
        ParquetEventIndexStore, ParquetPurchaseStore,
        partial_purchases, start_streaming_attribution_hub,
        streaming_attribution_last_touch)

    ev = load_table(spark, SF, "events")
    src = str(tmp_path / "att_src")
    for k in range(3):
        (ev.filter(F.col("event_id") % 3 == k)
         .coalesce(1).write.mode("append").parquet(src))
        _time.sleep(1.1)

    pur = ParquetPurchaseStore(spark, str(tmp_path / "att_p"))
    pur.delta_threshold = 2
    idx = ParquetEventIndexStore(spark, str(tmp_path / "att_i"))
    ck = str(tmp_path / "att_ck")

    def start():
        stream = spark.readStream.schema(ev.schema) \
            .option("maxFilesPerTrigger", 1).parquet(src)
        return start_streaming_attribution_hub(stream, pur, idx, ck)

    q = start()
    while not os.path.exists(os.path.join(ck, "commits", "0")):
        _time.sleep(0.1)
    q.stop()                           # the "kill"
    q = start()
    q.processAllAvailable()
    q.stop()

    def rows(df):
        return sorted((r.day, r.n_purchases, r.n_attributed,
                       r.attributed_revenue, r.organic_revenue)
                      for r in df.collect())

    got = rows(streaming_attribution_last_touch(pur, idx))
    want = rows(all_queries()["events_attribution_last_touch"](
        spark, SF))
    assert got == want and len(want) >= 10
    # both outcome classes present, or the band logic is untested
    assert any(n_att > 0 for _, _, n_att, _, _ in want)
    assert any(n_att < n for _, n, n_att, _, _ in want)

    # the same two stores serve time-to-convert (r14): the forward
    # as-of as a scan-local array_min over the purchase array
    from galaxy_spark.streaming.state_store import \
        streaming_time_to_convert
    got_t = sorted((r.bucket, r.n_conversions, r.n_users)
                   for r in streaming_time_to_convert(
                       pur, idx).collect())
    want_t = sorted((r.bucket, r.n_conversions, r.n_users)
                    for r in all_queries()["events_time_to_convert"](
                        spark, SF).collect())
    assert got_t == want_t and len(want_t) >= 3

    # idempotence WITHOUT the claim: full-slice re-merge, new epoch
    lin = sorted(pur.lineages())[0]
    pur.merge(partial_purchases(
        ev.filter(F.col("event_id") % 3 == 0)),
        f"zz{lin}.000000000099")
    assert rows(streaming_attribution_last_touch(pur, idx)) == got


def test_streaming_path_trigrams_matches_batch(spark, tmp_path):
    """Path trigrams off the per-user typed-timeline store (r14):
    events stream sliced by event_id % 3, so most users' timelines
    arrive INTERLEAVED across batches — late events land
    mid-sequence and rewrite trigrams on both sides, the case that
    forces the full-timeline state — with kill/restart and a
    whole-slice re-merge under a fresh epoch (set-union
    idempotence). The reader equals ``events_path_trigrams``
    field-for-field, from a plan with NO Window operator (the
    sorted struct arrays already ARE the (ts, event_id) walk; the
    three-step windows are scan-local)."""
    import time as _time

    from galaxy_spark.registry import all_queries
    from galaxy_spark.streaming.state_store import (
        ParquetUserSeqStore, partial_user_seq,
        start_streaming_user_seq, streaming_path_trigrams)

    ev = load_table(spark, SF, "events")
    src = str(tmp_path / "seq_src")
    for k in range(3):
        (ev.filter(F.col("event_id") % 3 == k)
         .coalesce(1).write.mode("append").parquet(src))
        _time.sleep(1.1)

    store = ParquetUserSeqStore(spark, str(tmp_path / "seq_store"))
    store.delta_threshold = 2
    ck = str(tmp_path / "seq_ck")

    def start():
        stream = spark.readStream.schema(ev.schema) \
            .option("maxFilesPerTrigger", 1).parquet(src)
        return start_streaming_user_seq(stream, store, ck)

    q = start()
    while not os.path.exists(os.path.join(ck, "commits", "0")):
        _time.sleep(0.1)
    q.stop()                           # the "kill"
    q = start()
    q.processAllAvailable()
    q.stop()

    reader = streaming_path_trigrams(store)
    assert "Window" not in \
        reader._jdf.queryExecution().optimizedPlan().toString()
    got = sorted(map(tuple, reader.collect()))
    want = sorted(map(tuple, all_queries()["events_path_trigrams"](
        spark, SF).collect()))
    assert got == want and len(want) > 50

    # second reader (r14): the first-order transition matrix off
    # the same timelines (bigram walks, same scan-local extraction)
    from galaxy_spark.streaming.state_store import \
        streaming_markov_transitions
    got_m = sorted(map(tuple,
                       streaming_markov_transitions(store).collect()))
    want_m = sorted(map(tuple,
                        all_queries()["events_markov_transitions"](
                            spark, SF).collect()))
    assert got_m == want_m and len(want_m) > 10

    # third reader (r14): per-type burstiness — exact integer
    # moments off the exploded timelines
    from galaxy_spark.streaming.state_store import \
        streaming_interarrival_burstiness
    got_b = sorted(map(tuple, streaming_interarrival_burstiness(
        store).collect()))
    want_b = sorted(map(tuple,
                        all_queries()["events_interarrival_burstiness"](
                            spark, SF).collect()))
    assert got_b == want_b and len(want_b) >= 3

    # idempotence WITHOUT the claim: full-slice re-merge, new epoch
    lin = sorted(store.lineages())[0]
    store.merge(partial_user_seq(
        ev.filter(F.col("event_id") % 3 == 1)),
        f"zz{lin}.000000000099")
    assert sorted(map(tuple,
                      streaming_path_trigrams(store).collect())) \
        == got


def test_user_seq_retention_bounds_state(spark, tmp_path):
    """retention_days=H on the typed-timeline store: merge-time
    eviction drops facts older than H days behind the folded
    watermark, and the trigram reader answers exactly the batch
    query RESTRICTED to the retained window (a trigram straddling
    the horizon dies with its evicted step — window semantics).
    Composes with the delta tier."""
    import time as _time

    from galaxy_spark.queries.events import path_trigrams_from_events
    from galaxy_spark.streaming.state_store import (
        ParquetUserSeqStore, start_streaming_user_seq,
        streaming_path_trigrams)

    ev = load_table(spark, SF, "events")
    src = str(tmp_path / "usr_src")
    for k in range(3):
        (ev.filter(F.col("event_id") % 3 == k)
         .coalesce(1).write.mode("append").parquet(src))
        _time.sleep(1.1)

    H = 14
    store = ParquetUserSeqStore(spark, str(tmp_path / "usr_store"),
                                retention_days=H)
    store.delta_threshold = 2
    stream = spark.readStream.schema(ev.schema) \
        .option("maxFilesPerTrigger", 1).parquet(src)
    q = start_streaming_user_seq(stream, store,
                                 str(tmp_path / "usr_ck"))
    q.processAllAvailable()
    q.stop()

    max_t = ev.agg(F.max(F.unix_micros("ts"))).collect()[0][0]
    cutoff = max_t - H * 86_400_000_000
    ev_r = ev.filter(F.unix_micros("ts") >= cutoff)
    n_all, n_ret = ev.count(), ev_r.count()
    assert 0 < n_ret < n_all, "horizon must split the dataset"

    got = sorted(map(tuple,
                     streaming_path_trigrams(store).collect()))
    want = sorted(map(tuple,
                      path_trigrams_from_events(ev_r).collect()))
    assert got == want and len(want) > 20

    # bounded state: merge-time eviction, not just read filtering
    stored = store.state().agg(
        F.sum(F.size("es"))).collect()[0][0]
    assert stored < n_all, \
        f"no merge-time eviction: {stored} stored vs {n_all} full"

    # default behavior unchanged: no retention -> no wm column
    plain = ParquetUserSeqStore(spark, str(tmp_path / "usr_plain"))
    assert "wm" not in (plain.state_schema or "")
    with pytest.raises(ValueError, match="retention_days"):
        ParquetUserSeqStore(spark, str(tmp_path / "usr_bad"),
                            retention_days=0)


def test_streaming_rfm_matches_batch(spark, tmp_path):
    """RFM quartiles off the continuously maintained per-customer
    order rollup (r13 verdict #7): MAX/SUM/SUM monoid state,
    kill/restart mid-stream, reader == ``customer_rfm_segments``
    field-for-field through the batch query's own imported scoring
    tail."""
    import time as _time

    from galaxy_spark.registry import all_queries
    from galaxy_spark.streaming.state_store import (
        ParquetCustomerOrderStore, start_streaming_customer_orders,
        streaming_rfm_segments)

    o = load_table(spark, SF, "orders")
    src = str(tmp_path / "rfm_src")
    for k in range(3):
        (o.filter(F.col("o_orderkey") % 3 == k)
         .coalesce(1).write.mode("append").parquet(src))
        _time.sleep(1.1)

    store = ParquetCustomerOrderStore(spark,
                                      str(tmp_path / "rfm_store"))
    store.delta_threshold = 2
    ck = str(tmp_path / "rfm_ck")

    def start():
        stream = spark.readStream.schema(o.schema) \
            .option("maxFilesPerTrigger", 1).parquet(src)
        return start_streaming_customer_orders(stream, store, ck)

    q = start()
    while not os.path.exists(os.path.join(ck, "commits", "0")):
        _time.sleep(0.1)
    q.stop()                           # the "kill"
    q = start()
    q.processAllAvailable()
    q.stop()

    def rows(df):
        return sorted((r.r_bucket, r.f_bucket, r.m_bucket,
                       r.n_customers, r.total_monetary)
                      for r in df.collect())

    got = rows(streaming_rfm_segments(store))
    want = rows(all_queries()["customer_rfm_segments"](spark, SF))
    assert got == want and len(want) >= 20


def test_streaming_order_cadence_matches_batch(spark, tmp_path):
    """Segment cadence off the per-customer order timelines (r14):
    idempotent set-union facts, kill/restart mid-stream plus a
    whole-slice re-merge under a fresh epoch, reader ==
    ``customer_order_cadence`` through the imported tail."""
    import time as _time

    from galaxy_spark.registry import all_queries
    from galaxy_spark.streaming.state_store import (
        ParquetOrderFactStore, partial_order_facts,
        start_streaming_order_facts, streaming_order_cadence)

    o = load_table(spark, SF, "orders")
    c = load_table(spark, SF, "customer")
    src = str(tmp_path / "oc_src")
    for k in range(3):
        (o.filter(F.col("o_orderkey") % 3 == k)
         .coalesce(1).write.mode("append").parquet(src))
        _time.sleep(1.1)

    store = ParquetOrderFactStore(spark, str(tmp_path / "oc_store"))
    store.delta_threshold = 2
    ck = str(tmp_path / "oc_ck")

    def start():
        stream = spark.readStream.schema(o.schema) \
            .option("maxFilesPerTrigger", 1).parquet(src)
        return start_streaming_order_facts(stream, store, ck)

    q = start()
    while not os.path.exists(os.path.join(ck, "commits", "0")):
        _time.sleep(0.1)
    q.stop()                           # the "kill"
    q = start()
    q.processAllAvailable()
    q.stop()

    def rows(df):
        return sorted((r.mktsegment, r.n_customers, r.n_gaps,
                       r.avg_gap_days, r.max_gap_days)
                      for r in df.collect())

    got = rows(streaming_order_cadence(store, c))
    want = rows(all_queries()["customer_order_cadence"](spark, SF))
    assert got == want and len(want) == 5

    # idempotence WITHOUT the claim: full-slice re-merge, new epoch
    lin = sorted(store.lineages())[0]
    store.merge(partial_order_facts(
        o.filter(F.col("o_orderkey") % 3 == 0)),
        f"zz{lin}.000000000099")
    assert rows(streaming_order_cadence(store, c)) == got


def test_state_for_keys_prunes_and_folds_under_deltas(spark, tmp_path,
                                                      monkeypatch):
    """Layout pruning and the delta tier compose: a probe on a
    delta-mode store with layout_cols ⊂ key_cols opens only the
    touched buckets' files (base AND pending deltas) and the rows
    come back FOLDED — never a raw delta fragment."""
    import pyspark.sql.readwriter as rw

    from galaxy_spark.streaming.state_store import ParquetLshStore

    store = ParquetLshStore(spark, str(tmp_path / "lshd"),
                            n_buckets=8)
    store.delta_threshold = 4            # stays un-compacted here

    def rows_df(vals):
        return spark.createDataFrame(
            vals, "band int, bucket int, id long, seen int")

    # same (band, bucket, id) key inserted across TWO epochs: the
    # probe must fold the two delta fragments into one row
    store.merge(rows_df([(1, 7, 10, 1), (2, 9, 11, 1)]),
                "lin.000000000000")
    store.merge(rows_df([(1, 7, 10, 1), (1, 7, 12, 1)]),
                "lin.000000000001")

    probe = spark.createDataFrame([(1, 7)], "band int, bucket int")
    expected = set(store._buckets_for_keys(probe))
    assert expected < set(store._bucket_ids()) or \
        len(store._bucket_ids()) < 8   # key (2,9) may share bucket

    seen: list[str] = []
    orig = rw.DataFrameReader.parquet

    def spy(self, *paths, **kw):
        seen.extend(paths)
        return orig(self, *paths, **kw)

    monkeypatch.setattr(rw.DataFrameReader, "parquet", spy)
    got = sorted((r.band, r.bucket, r.id, r.seen)
                 for r in store.state_for_keys(probe)
                 .filter((F.col("band") == 1) & (F.col("bucket") == 7))
                 .collect())
    monkeypatch.setattr(rw.DataFrameReader, "parquet", orig)
    assert got == [(1, 7, 10, 1), (1, 7, 12, 1)], \
        f"unfolded or missing delta rows: {got}"
    opened = {p for p in seen if p.startswith(store.path)}
    assert opened
    for p in opened:
        b = int(p.split("bucket-")[1].split(os.sep)[0])
        assert b in expected, f"opened untouched bucket {b}"


# ------------------------------------------------------------------
# Commit-protocol seam (r12): object-store-safe manifest commits
# ------------------------------------------------------------------

@pytest.mark.parametrize("fs", ["manifest", "manifest_cas"])
@pytest.mark.parametrize("delta", [None, 2], ids=["cow", "delta2"])
def test_manifest_strategy_state_matches_posix(spark, tmp_path,
                                               delta, fs):
    """The manifest (rename-less) strategy is a commit-protocol
    change, never a semantics change: after every epoch — and
    after an at-least-once replay — its folded state equals the
    posix twin's row for row, in both write modes and under both
    manifest backends (plain local put / fenced conditional put).
    And it must be genuinely rename-less on the commit path: no
    _COMMITTED markers anywhere, a _MANIFEST.json in every
    written bucket."""
    ref = _sum_store(spark, str(tmp_path / "p"), delta)
    man = _sum_store(spark, str(tmp_path / "m"), delta, fs=fs)
    for i, rows in enumerate(_DELTA_BATCHES):
        key = f"lin.{i:012d}"
        ref.merge(_batch_df(spark, rows), key)
        man.merge(_batch_df(spark, rows), key)
        want = sorted(map(tuple, ref.state().collect()))
        got = sorted(map(tuple, man.state().collect()))
        assert got == want, f"divergence at epoch {i}"
    last = f"lin.{len(_DELTA_BATCHES) - 1:012d}"
    man.merge(_batch_df(spark, _DELTA_BATCHES[-1]), last)  # replay
    assert sorted(map(tuple, man.state().collect())) == want
    markers = [os.path.join(r, f) for r, _, fl in os.walk(man.path)
               for f in fl if f == "_COMMITTED"]
    assert markers == [], f"manifest mode wrote markers: {markers}"
    for b in man._bucket_ids():
        assert os.path.exists(os.path.join(
            man._bucket_dir(b), "_MANIFEST.json"))
    assert man.lineages() == {"lin"}


@pytest.mark.parametrize("fs", ["manifest", "manifest_cas"])
def test_manifest_crash_between_put_and_publish(spark, tmp_path,
                                                monkeypatch, fs):
    """THE object-store crash window: files put at their final
    keys, crash before the manifest put. The version must stay
    invisible (no partial state), the epoch's replay must repair
    it, and the orphan objects from the crashed attempt must never
    be read (the manifest names the exact file list) and must be
    swept when the version is eventually dropped. The crash seam
    is each backend's actual publish primitive: the local atomic
    put (manifest) / the conditional object-store put
    (manifest_cas)."""
    from galaxy_spark.streaming import store_fs as sfs

    store = _sum_store(spark, str(tmp_path / "cw"), None, fs=fs)
    store.merge(_batch_df(spark, [(1, 10, "a")]), "lin.000000000000")
    before = sorted(map(tuple, store.state().collect()))

    def boom(self, *a, **kw):
        raise OSError("simulated crash after puts, before publish")

    if fs == "manifest":
        monkeypatch.setattr(sfs.ManifestStoreFs, "_put_manifest",
                            boom)
    else:
        monkeypatch.setattr(sfs.LocalObjectStore, "put_if_match",
                            boom)
    with pytest.raises(OSError, match="simulated crash"):
        store.merge(_batch_df(spark, [(1, 5, "b")]),
                    "lin.000000000001")
    monkeypatch.undo()
    # invisible: the half-published version changed nothing
    assert sorted(map(tuple, store.state().collect())) == before
    b = store._buckets_for_keys(
        _batch_df(spark, [(1, 5, "b")]).select("k"))[0]
    vdir = os.path.join(store._bucket_dir(b), "v-lin.000000000001")
    orphans = set(os.listdir(vdir))
    assert orphans, "crash left no orphan objects to exercise"
    # replay repairs; orphans coexist in the dir but are unread —
    # a double-count of the k=1 row would show in the sum
    store.merge(_batch_df(spark, [(1, 5, "b")]), "lin.000000000001")
    assert {(r.k, r.v) for r in store.state().collect()} == {(1, 15)}
    assert set(os.listdir(vdir)) > orphans
    # next epoch supersedes the version; its drop sweeps orphans too
    store.merge(_batch_df(spark, [(1, 1, "c")]), "lin.000000000002")
    assert not os.path.exists(vdir)
    assert {(r.k, r.v) for r in store.state().collect()} == {(1, 16)}


def test_manifest_drop_updates_visibility_before_bytes(tmp_path):
    """drop_version removes the version from the manifest (one
    atomic put) BEFORE deleting bytes — a reader can never resolve
    a version whose files are already gone."""
    import shutil

    from galaxy_spark.streaming.store_fs import ManifestStoreFs

    fs = ManifestStoreFs()
    bd = str(tmp_path / "bucket-0")
    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    with open(os.path.join(stage, "part-1.parquet"), "wb") as f:
        f.write(b"x")
    fs.publish_version(bd, "v-lin.000000000000", stage)
    assert fs.committed(bd, "v-lin.000000000000")
    assert fs.read_paths(bd, "v-lin.000000000000") == [
        os.path.join(bd, "v-lin.000000000000", "part-1.parquet")]

    real_rmtree = shutil.rmtree
    order = []

    def spy_rmtree(path, **kw):
        # at byte-deletion time the version is already invisible
        order.append(fs.committed(bd, "v-lin.000000000000"))
        real_rmtree(path, **kw)

    import unittest.mock as mock
    with mock.patch.object(shutil, "rmtree", spy_rmtree):
        fs.drop_version(bd, "v-lin.000000000000")
    assert order == [False], "bytes deleted while still visible"
    # a read that resolved the version before the drop must fail
    # LOUDLY (retryable), never silently omit the bucket's rows
    # (r12 review)
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        fs.read_paths(bd, "v-lin.000000000000")


def test_cross_strategy_path_refused(spark, tmp_path):
    """A store path is bound to one commit strategy for life:
    posix markers are invisible to the manifest reader and vice
    versa, so continuing a path under the other strategy would
    silently read committed state as empty. Both directions must
    refuse loudly at the next write."""
    rows = [(1, 10, "a")]
    pos = _sum_store(spark, str(tmp_path / "x"), None)
    pos.merge(_batch_df(spark, rows), "lin.000000000000")
    wrong = _sum_store(spark, str(tmp_path / "x"), None,
                       fs="manifest")
    with pytest.raises(ValueError, match="posix-committed"):
        wrong.merge(_batch_df(spark, rows), "lin.000000000001")

    man = _sum_store(spark, str(tmp_path / "y"), None,
                     fs="manifest")
    man.merge(_batch_df(spark, rows), "lin.000000000000")
    wrong2 = _sum_store(spark, str(tmp_path / "y"), None)
    with pytest.raises(ValueError, match="manifest"):
        wrong2.merge(_batch_df(spark, rows), "lin.000000000001")

    # READ side refuses too (r12 review): a pure reader opened with
    # the wrong strategy previously saw committed state as EMPTY —
    # silent data loss on e.g. a BM25 query over a stopped task
    with pytest.raises(ValueError, match="manifest"):
        _sum_store(spark, str(tmp_path / "y"), None).state()
    with pytest.raises(ValueError, match="posix-committed"):
        _sum_store(spark, str(tmp_path / "x"), None,
                   fs="manifest").state()


def test_rebucket_carries_fs_and_grace(spark, tmp_path):
    """rebucket reconstructs the store through _clone; the commit
    strategy and vacuum grace ride along like delta_threshold —
    and the migrated state re-reads identically under the carried
    strategy."""
    from galaxy_spark.streaming.state_store import rebucket
    from galaxy_spark.streaming.store_fs import ManifestStoreFs

    st = _sum_store(spark, str(tmp_path / "src"), 2, fs="manifest")
    st.vacuum_grace_seconds = 123.0
    for i, rows in enumerate(_DELTA_BATCHES[:3]):
        st.merge(_batch_df(spark, rows), f"lin.{i:012d}")
    with pytest.warns(UserWarning, match="quiesced"):
        new = rebucket(st, str(tmp_path / "dst"), 7)
    assert isinstance(new.fs, ManifestStoreFs)
    assert new.vacuum_grace_seconds == 123.0
    assert sorted(map(tuple, new.state().collect())) == \
        sorted(map(tuple, st.state().collect()))


def test_vacuum_grace_defers_drop(spark, tmp_path):
    """vacuum_grace_seconds (r11 ADVICE): superseded versions
    younger than the grace survive the post-merge vacuum — a drain
    window for concurrent readers mid-scan — while reads stay on
    the current version (max-committed rule), and dropping the
    grace sweeps them on the next touch."""
    st = _sum_store(spark, str(tmp_path / "g"), None)
    st.vacuum_grace_seconds = 3600.0
    st.merge(_batch_df(spark, [(1, 10, "a")]), "lin.000000000000")
    st.merge(_batch_df(spark, [(1, 5, "b")]), "lin.000000000001")
    b = st._buckets_for_keys(
        _batch_df(spark, [(1, 0, "x")]).select("k"))[0]
    bd = st._bucket_dir(b)
    assert os.path.isdir(os.path.join(bd, "v-lin.000000000000")), \
        "grace did not defer the vacuum"
    assert {(r.k, r.v) for r in st.state().collect()} == {(1, 15)}
    st.vacuum_grace_seconds = 0.0
    st.merge(_batch_df(spark, [(1, 1, "c")]), "lin.000000000002")
    kept = [v for v in os.listdir(bd) if v.startswith("v-")]
    assert kept == ["v-lin.000000000002"], f"unswept: {kept}"


def test_manifest_cache_survives_mtime_collision(tmp_path):
    """r12 ADVICE: on coarse-mtime filesystems two manifest
    publishes can land in one mtime quantum, leaving a second
    in-process reader instance serving the stale manifest when the
    cache is keyed on mtime alone. The cache key is the full stat
    signature (inode, mtime_ns, size); os.replace installs a fresh
    inode on every publish, so even a FORCED mtime collision (the
    worst case, emulated here with utime) must invalidate."""
    from galaxy_spark.streaming.store_fs import _MANIFEST, \
        ManifestStoreFs

    writer, reader = ManifestStoreFs(), ManifestStoreFs()
    bd = str(tmp_path / "bucket-0")
    for i in (0, 1):
        stage = str(tmp_path / f"stage{i}")
        os.makedirs(stage)
        with open(os.path.join(stage, f"part-{i}.parquet"),
                  "wb") as f:
            f.write(b"x")
        writer.publish_version(bd, f"v-lin.{i:012d}", stage)
        if i == 0:
            # reader caches the one-version manifest
            assert reader.version_names(bd) == ["v-lin.000000000000"]
            mpath = os.path.join(bd, _MANIFEST)
            t0 = os.stat(mpath).st_mtime
    # force the mtime of the SECOND publish back onto the first's
    os.utime(os.path.join(bd, _MANIFEST), (t0, t0))
    assert sorted(reader.version_names(bd)) == [
        "v-lin.000000000000", "v-lin.000000000001"], \
        "reader served a stale cached manifest"
    assert reader.committed(bd, "v-lin.000000000001")


def test_store_fs_resolver():
    from galaxy_spark.streaming.store_fs import (CasManifestStoreFs,
                                                 ManifestStoreFs,
                                                 PosixStoreFs,
                                                 store_fs)

    inst = ManifestStoreFs()
    assert store_fs(inst) is inst
    assert isinstance(store_fs("posix"), PosixStoreFs)
    assert isinstance(store_fs("manifest"), ManifestStoreFs)
    assert isinstance(store_fs("manifest_cas"), CasManifestStoreFs)
    with pytest.raises(ValueError, match="unknown store commit"):
        store_fs("s3")


def _stage_one_file(tmp_path, name: str) -> str:
    import uuid

    stage = str(tmp_path / f"stage-{name}-{uuid.uuid4().hex[:6]}")
    os.makedirs(stage)
    with open(os.path.join(stage, f"part-{name}.parquet"),
              "wb") as f:
        f.write(name.encode())
    return stage


def test_local_object_store_precondition_semantics(tmp_path):
    """The fake object store honors the exact contract a real S3
    client must provide to CasManifestStoreFs: create-only puts
    refuse existing keys, If-Match puts refuse a stale ETag, and a
    winning put changes the ETag."""
    from galaxy_spark.streaming.store_fs import (LocalObjectStore,
                                                 PreconditionFailed)

    s = LocalObjectStore()
    key = str(tmp_path / "obj")
    assert s.get(key) == (None, None)
    e1 = s.put_if_match(key, b"v1", None)
    assert s.get(key) == (b"v1", e1)
    with pytest.raises(PreconditionFailed):
        s.put_if_match(key, b"v2", None)          # exists
    with pytest.raises(PreconditionFailed):
        s.put_if_match(key, b"v2", "stale-etag")  # wrong etag
    e2 = s.put_if_match(key, b"v2", e1)
    assert e2 != e1 and s.get(key) == (b"v2", e2)


def test_manifest_cas_two_writer_race_loses_no_version(tmp_path):
    """r12 verdict #1, the fencing scenario: a ZOMBIE driver still
    mid-publish of epoch N's version while the new LIVE driver
    commits N and N+1. The zombie's manifest put is made from a
    stale read; under the plain last-writer-wins emulation it
    would erase the live writer's versions. Under the fenced
    strategy the put fails its If-Match precondition, the mutation
    re-applies on the fresh manifest (where the version already
    exists), and the race degrades to a no-op: NO version lost,
    replay-skip lineage (the committed set) stays consistent."""
    from galaxy_spark.streaming.store_fs import (CasManifestStoreFs,
                                                 LocalObjectStore)

    objects = LocalObjectStore()
    live = CasManifestStoreFs(objects)
    zombie = CasManifestStoreFs(objects)
    bd = str(tmp_path / "bucket-0")
    vN, vN1 = "v-lin.000000000005", "v-lin.000000000006"

    # interleave: the hook fires inside the zombie's publish,
    # between its stale manifest read and its conditional put —
    # the live writer lands BOTH epochs in that window
    def live_commits():
        live.publish_version(bd, vN, _stage_one_file(tmp_path, "ln"))
        live.publish_version(bd, vN1,
                             _stage_one_file(tmp_path, "l1"))

    objects.before_put = live_commits
    zombie.publish_version(bd, vN, _stage_one_file(tmp_path, "zn"))

    # no lost version, and the committed set is the union
    assert sorted(zombie.version_names(bd)) == [vN, vN1]
    assert live.committed(bd, vN) and live.committed(bd, vN1)
    # the winner's (live) files are the visible ones for vN — the
    # zombie's stale attempt converged to a no-op, and every
    # manifest-listed file actually exists and is readable
    for v in (vN, vN1):
        paths = live.read_paths(bd, v)
        assert paths and all(os.path.exists(p) for p in paths)
    assert [os.path.basename(p)
            for p in live.read_paths(bd, vN)] == ["part-ln.parquet"]


def test_manifest_unfenced_race_demonstrates_lost_version(tmp_path):
    """The CONVERSE of the fenced test — documents WHY the CAS
    strategy exists: under plain ManifestStoreFs (single-key
    last-writer-wins put, the correct local emulation of S3's
    unconditional PUT), the same zombie interleave erases the live
    writer's in-between version. This is the documented contract
    boundary (store_fs.py module docstring), not a bug: deploys
    with any chance of two live writers must use manifest_cas."""
    from galaxy_spark.streaming.store_fs import ManifestStoreFs

    live = ManifestStoreFs()
    zombie = ManifestStoreFs()
    bd = str(tmp_path / "bucket-0")
    vN, vN1 = "v-lin.000000000005", "v-lin.000000000006"

    orig = ManifestStoreFs._put_manifest
    fired = []

    def hooked(self, bucket_dir, manifest):
        if self is zombie and not fired:
            fired.append(True)
            live.publish_version(bd, vN,
                                 _stage_one_file(tmp_path, "ln"))
            live.publish_version(bd, vN1,
                                 _stage_one_file(tmp_path, "l1"))
        orig(self, bucket_dir, manifest)

    import unittest.mock as mock
    with mock.patch.object(ManifestStoreFs, "_put_manifest", hooked):
        zombie.publish_version(bd, vN,
                               _stage_one_file(tmp_path, "zn"))
    # vN1 is GONE from the manifest — the lost-version hazard
    assert zombie.version_names(bd) == [vN]


def test_posix_zombie_replay_cannot_erase_live_versions(tmp_path):
    """The posix path's zombie-vs-live story, made explicit (r12
    verdict #1): version dirs are DISJOINT keys — a zombie replay
    of epoch N can at worst lose the rename race for its own
    version (absorbed by the winner's _COMMITTED marker check) and
    can never touch versions it never wrote, so there is no
    manifest-style lost-version window to fence."""
    from galaxy_spark.streaming.store_fs import PosixStoreFs

    live, zombie = PosixStoreFs(), PosixStoreFs()
    bd = str(tmp_path / "bucket-0")
    vN, vN1 = "v-lin.000000000005", "v-lin.000000000006"
    live.publish_version(bd, vN, _stage_one_file(tmp_path, "ln"))
    live.publish_version(bd, vN1, _stage_one_file(tmp_path, "l1"))
    # zombie replays epoch N with ITS recompute of the same version
    zombie.publish_version(bd, vN, _stage_one_file(tmp_path, "zn"))
    assert sorted(zombie.version_names(bd)) == [vN, vN1]
    assert all(zombie.committed(bd, v) for v in (vN, vN1))
    # the live winner's bytes survived the zombie's replay
    names = os.listdir(os.path.join(bd, vN))
    assert "part-ln.parquet" in names and \
        "part-zn.parquet" not in names


def _cas_counter_worker(key: str, rounds: int, barrier) -> None:
    """One contender: read-modify-write increments through the
    conditional put, retrying on PreconditionFailed — the client
    loop a real S3 CAS user runs. Module-level so child processes
    can import it."""
    from galaxy_spark.streaming.store_fs import (LocalObjectStore,
                                                 PreconditionFailed)

    s = LocalObjectStore()
    barrier.wait()
    for _ in range(rounds):
        while True:
            raw, etag = s.get(key)
            n = int(raw) if raw is not None else 0
            try:
                s.put_if_match(key, str(n + 1).encode(), etag)
                break
            except PreconditionFailed:
                continue


def test_local_object_store_cas_is_cross_process(tmp_path):
    """r13 verdict #1: the fencing guarantee names a zombie driver
    in another PROCESS, so the stand-in's compare-and-swap must be
    OS-level, not a threading.Lock. Three real processes hammer
    one key with CAS increments; flock-serialized windows mean no
    increment is lost — under the old process-wide threading.Lock
    (private per child after fork) interleaved get→replace windows
    lose updates."""
    import multiprocessing as mp

    ctx = mp.get_context("fork")
    key, rounds = str(tmp_path / "counter"), 40
    barrier = ctx.Barrier(3)
    procs = [ctx.Process(target=_cas_counter_worker,
                         args=(key, rounds, barrier))
             for _ in range(3)]
    for p in procs:
        p.start()
    for p in procs:
        p.join(120)
        assert p.exitcode == 0
    with open(key, "rb") as f:
        assert int(f.read()) == 3 * rounds


def _cas_publisher_worker(bd: str, stage_root: str, tag: str,
                          n_versions: int, barrier) -> None:
    """One driver process publishing its own version lineage into
    the shared bucket through the fenced strategy."""
    import os as _os
    import uuid as _uuid

    from galaxy_spark.streaming.store_fs import CasManifestStoreFs

    fs = CasManifestStoreFs()
    barrier.wait()
    for j in range(n_versions):
        stage = _os.path.join(
            stage_root, f"stage-{tag}-{j}-{_uuid.uuid4().hex[:6]}")
        _os.makedirs(stage)
        with open(_os.path.join(stage,
                                f"part-{tag}-{j}.parquet"),
                  "wb") as f:
            f.write(f"{tag}:{j}".encode())
        fs.publish_version(bd, f"v-{tag}.{j:09d}", stage)


def test_manifest_cas_two_process_race_loses_no_version(tmp_path):
    """The r13 verdict #1 'done' criterion: a REAL two-(three-)
    process writer race over one bucket's manifest, every publish
    a get→merge→conditional-put from a possibly-stale read. With
    the flock-backed object store no version is lost; a fresh
    reader process (the parent) sees the union of every writer's
    lineage and every manifest-listed file exists."""
    import multiprocessing as mp

    from galaxy_spark.streaming.store_fs import CasManifestStoreFs

    ctx = mp.get_context("fork")
    bd = str(tmp_path / "bucket-0")
    n_versions = 8
    tags = ["a", "b", "c"]
    barrier = ctx.Barrier(len(tags))
    procs = [ctx.Process(target=_cas_publisher_worker,
                         args=(bd, str(tmp_path), t, n_versions,
                               barrier))
             for t in tags]
    for p in procs:
        p.start()
    for p in procs:
        p.join(120)
        assert p.exitcode == 0

    reader = CasManifestStoreFs()
    expect = sorted(f"v-{t}.{j:09d}"
                    for t in tags for j in range(n_versions))
    assert sorted(reader.version_names(bd)) == expect
    for v in expect:
        paths = reader.read_paths(bd, v)
        assert paths and all(os.path.exists(p) for p in paths)


def test_manifest_publish_failure_sweeps_orphan_version_dir(
        tmp_path, monkeypatch):
    """r13 ADVICE: if the manifest put fails AFTER the data files
    were moved to their final keys (e.g. CAS exhaustion), the
    staged-but-unpublished version dir would be invisible to
    vacuum forever — manifest entries ARE the committed set. The
    publish path now removes exactly the files it put (and the
    dir, if empty) before re-raising, and leaves committed
    versions untouched."""
    from galaxy_spark.streaming import store_fs as sfs

    fs = sfs.CasManifestStoreFs()
    bd = str(tmp_path / "bucket-0")
    v0, v1 = "v-lin.000000000001", "v-lin.000000000002"
    fs.publish_version(bd, v0, _stage_one_file(tmp_path, "ok"))

    def always_fail(self, key, data, etag):
        raise sfs.PreconditionFailed(f"{key}: induced")

    monkeypatch.setattr(sfs.LocalObjectStore, "put_if_match",
                        always_fail)
    with pytest.raises(RuntimeError, match="did not converge"):
        fs.publish_version(bd, v1, _stage_one_file(tmp_path, "nf"))
    # the failed version's dir is swept — no unreferenced orphan
    assert not os.path.exists(os.path.join(bd, v1))
    # the committed version is untouched and still readable
    monkeypatch.undo()
    assert fs.version_names(bd) == [v0]
    assert all(os.path.exists(p) for p in fs.read_paths(bd, v0))


def test_event_index_retention_bounds_state(spark, tmp_path):
    """retention_days=H (r11 verdict #3) bounds the event-index
    store's state: merge-time eviction drops micros older than H
    days behind the folded watermark, and the funnel/retention
    readers answer exactly the batch queries RESTRICTED to the
    retained window. Composes with the delta tier (read-side folds
    run the same watermark-gated agg)."""
    import time as _time

    from galaxy_spark.queries.events import (
        funnel_from_events, retention_cohorts_from_events)
    from galaxy_spark.streaming.state_store import (
        ParquetEventIndexStore, start_streaming_event_index,
        streaming_funnel, streaming_retention)

    ev = load_table(spark, SF, "events")
    src = str(tmp_path / "ret_src")
    for k in range(3):
        (ev.filter(F.col("event_id") % 3 == k)
         .coalesce(1).write.mode("append").parquet(src))
        _time.sleep(1.1)

    H = 14
    store = ParquetEventIndexStore(spark, str(tmp_path / "ret_store"),
                                   retention_days=H)
    store.delta_threshold = 2
    stream = spark.readStream.schema(ev.schema) \
        .option("maxFilesPerTrigger", 1).parquet(src)
    q = start_streaming_event_index(stream, store,
                                    str(tmp_path / "ret_ck"))
    q.processAllAvailable()
    q.stop()

    # the retained-window batch twin: events at/after (global max
    # event time - H days) — the same cutoff the folded watermark
    # converges to once the final batch (which contains the max)
    # has merged
    max_t = ev.agg(F.max(F.unix_micros("ts"))).collect()[0][0]
    cutoff = max_t - H * 86_400_000_000
    ev_r = ev.filter(F.unix_micros("ts") >= cutoff)
    n_all, n_ret = ev.count(), ev_r.count()
    assert 0 < n_ret < n_all, "horizon must split the dataset"

    got = sorted((r.user_id, r.t_view, r.t_click, r.t_purchase)
                 for r in streaming_funnel(store).collect())
    want = sorted((r.user_id, r.t_view, r.t_click, r.t_purchase)
                  for r in funnel_from_events(ev_r).collect())
    assert got == want and len(want) >= 5
    got_r = sorted((r.cohort_week, r.week_offset, r.n_users)
                   for r in streaming_retention(store).collect())
    want_r = sorted(
        (r.cohort_week, r.week_offset, r.n_users)
        for r in retention_cohorts_from_events(
            ev_r.select("user_id", "ts")).collect())
    assert got_r == want_r and len(want_r) >= 1

    # bounded state: the stored index holds strictly fewer micros
    # than the full-history twin would (merge-time eviction, not
    # just read-time filtering)
    stored = store.state().agg(
        F.sum(F.size("tss"))).collect()[0][0]
    full = ev.select("user_id", "event_type",
                     F.unix_micros("ts").alias("t")) \
        .distinct().count()
    assert stored < full, \
        f"no merge-time eviction: {stored} stored vs {full} full"
    # and nothing below the global watermark survives in state
    # for keys touched after the horizon settled: the READERS see
    # none regardless (global-wm gate), certified by the equality
    # above

    # default behavior unchanged: no retention -> no wm column
    plain = ParquetEventIndexStore(spark, str(tmp_path / "plain"))
    assert "wm" not in (plain.state_schema or "")
    with pytest.raises(ValueError, match="retention_days"):
        ParquetEventIndexStore(spark, str(tmp_path / "bad"),
                               retention_days=0)


def test_user_day_retention_below_decay_horizon_warns(
        spark, tmp_path):
    """r13 ADVICE: streaming_decay_scores equals the unbounded
    batch twin only at H >= the 40-day zero-weight horizon; an H
    in [1, 39] silently evicts rows still carrying nonzero decay
    weight. The store now warns at construction (retained-window
    answers stay legal — the bounded-state test pins them — but
    sub-horizon eviction must be a choice, not a surprise)."""
    import warnings as _warnings

    from galaxy_spark.streaming.state_store import ParquetUserDayStore

    with pytest.warns(UserWarning, match="40-day decay-weight"):
        ParquetUserDayStore(spark, str(tmp_path / "ud_w"),
                            retention_days=14)
    # at or above the horizon, and with no retention: silent
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        ParquetUserDayStore(spark, str(tmp_path / "ud_40"),
                            retention_days=40)
        ParquetUserDayStore(spark, str(tmp_path / "ud_n"))
    with pytest.raises(ValueError, match="retention_days"):
        ParquetUserDayStore(spark, str(tmp_path / "ud_bad"),
                            retention_days=0)


def test_streaming_gapfill_matches_batch(spark, tmp_path):
    """The gap-filled hourly series off the continuously maintained
    rollup store equals the batch ``events_timeseries_gapfill``
    field-for-field — including zero rows for hours NO event ever
    touched (the store holds only occupied buckets; the reader's
    grid synthesis must regenerate the gaps) — with events
    interleaved across micro-batches and a replayed epoch."""
    import time as _time

    from galaxy_spark.registry import all_queries
    from galaxy_spark.streaming.state_store import (
        ParquetRollupStore, start_incremental_rollup_parquet,
        streaming_gapfill)

    ev = load_table(spark, SF, "events")
    src = str(tmp_path / "gf_src")
    for k in range(3):
        (ev.filter(F.col("event_id") % 3 == k)
         .coalesce(1).write.mode("append").parquet(src))
        _time.sleep(1.1)

    store = ParquetRollupStore(spark, str(tmp_path / "gf_store"))
    store.delta_threshold = 2
    stream = spark.readStream.schema(ev.schema) \
        .option("maxFilesPerTrigger", 1).parquet(src)
    q = start_incremental_rollup_parquet(stream, store,
                                         str(tmp_path / "gf_ck"))
    q.processAllAvailable()
    q.stop()

    got = sorted((r.event_type, r.hour, r.n_events, r.trailing_24h)
                 for r in streaming_gapfill(store).collect())
    want = sorted((r.event_type, r.hour, r.n_events, r.trailing_24h)
                  for r in all_queries()["events_timeseries_gapfill"](
                      spark, SF).collect())
    assert got == want and len(want) > 100
    assert any(n == 0 for _, _, n, _ in got), \
        "no zero-filled hour: the gap regeneration went untested"


def test_streaming_anomaly_matches_batch(spark, tmp_path):
    """The anomaly flags off the continuously maintained rollup
    store equal the batch ``events_anomaly_daily_counts``
    field-for-field — the rollup store serving its THIRD reader
    (rollup snapshot, gap-filled series, anomaly flags) from one
    write path, with events interleaved across micro-batches."""
    import time as _time

    from galaxy_spark.registry import all_queries
    from galaxy_spark.streaming.state_store import (
        ParquetRollupStore, start_incremental_rollup_parquet,
        streaming_anomaly)

    ev = load_table(spark, SF, "events")
    src = str(tmp_path / "an_src")
    for k in range(2):
        (ev.filter(F.col("event_id") % 2 == k)
         .coalesce(1).write.mode("append").parquet(src))
        _time.sleep(1.1)

    store = ParquetRollupStore(spark, str(tmp_path / "an_store"))
    store.delta_threshold = 2
    stream = spark.readStream.schema(ev.schema) \
        .option("maxFilesPerTrigger", 1).parquet(src)
    q = start_incremental_rollup_parquet(stream, store,
                                         str(tmp_path / "an_ck"))
    q.processAllAvailable()
    q.stop()

    got = sorted((r.event_type, r.day, r.n_events, r.is_anomaly)
                 for r in streaming_anomaly(store).collect())
    want = sorted((r.event_type, r.day, r.n_events, r.is_anomaly)
                  for r in all_queries()["events_anomaly_daily_counts"](
                      spark, SF).collect())
    assert got == want and len(want) >= 100


# ------------------------------------------------------------------
# Streaming winnowing near-dup index (r12 verdict #3)
# ------------------------------------------------------------------

@pytest.mark.parametrize("delta,fs", [(None, "posix"),
                                      (2, "manifest_cas")],
                         ids=["cow", "delta2-cas"])
def test_streaming_winnowing_index_matches_batch(spark, tmp_path,
                                                 delta, fs):
    """r12 verdict #3: the winnowing tier's streaming twin. Docs
    stream in three slices with a kill/restart mid-stream; the
    store reader answers EXACTLY the batch
    ``dedup_winnowing_pairs`` over the replayed corpus (the
    one-write many-readers hub shape — the DF cap and min-shared
    floor are whole-corpus properties, so the reader recomputes
    from accumulated fingerprint state). The post-ingest probe of
    the full corpus equals the same answer (state-union replay
    insensitivity at final df)."""
    import time as _time

    from galaxy_spark.registry import all_queries
    from galaxy_spark.streaming.state_store import (
        ParquetWinnowStore, start_streaming_winnowing_index,
        streaming_winnowing_pairs, winnow_probe_pairs)
    from galaxy_spark.streaming.store_fs import store_fs

    docs = load_table(spark, SF, "documents")
    src = str(tmp_path / "wn_src")
    for k in (0, 1):                   # first two slices, then kill
        (docs.filter(F.col("doc_id") % 3 == k)
         .coalesce(1).write.mode("append").parquet(src))
        _time.sleep(1.1)

    store = ParquetWinnowStore(spark, str(tmp_path / "wn_store"))
    store.delta_threshold = delta
    store.fs = store_fs(fs)
    ck = str(tmp_path / "wn_ck")

    def start():
        stream = spark.readStream.schema(docs.schema) \
            .option("maxFilesPerTrigger", 1).parquet(src)
        return start_streaming_winnowing_index(stream, store, ck)

    q = start()
    q.processAllAvailable()
    q.stop()                           # the "kill"
    mid = streaming_winnowing_pairs(store).count()

    _time.sleep(1.1)
    (docs.filter(F.col("doc_id") % 3 == 2)
     .coalesce(1).write.mode("append").parquet(src))
    q = start()
    q.processAllAvailable()
    q.stop()

    got = sorted((r.doc_a, r.doc_b, r.n_shared)
                 for r in streaming_winnowing_pairs(store).collect())
    want = sorted((r.doc_a, r.doc_b, r.n_shared)
                  for r in all_queries()["dedup_winnowing_pairs"](
                      spark, SF).collect())
    assert got == want and len(want) > max(mid, 3)
    assert any(a % 3 != b % 3 for a, b, _ in got), \
        "no cross-slice pair: the growing index went untested"

    # post-ingest probe of the full corpus: at final df the
    # candidate superset collapses to the exact answer, and the
    # state-union makes it indifferent to the already-applied
    # inserts (replay shape)
    probed = sorted((r.doc_a, r.doc_b, r.n_shared)
                    for r in winnow_probe_pairs(docs,
                                                store).collect())
    assert probed == want


def test_winnow_store_caps_boilerplate_and_probe_is_superset(
        spark, tmp_path):
    """Merge-time DF-cap enforcement + the documented probe
    semantics. With df_cap=3: (a) a boilerplate fingerprint shared
    by 8 documents keeps at most cap+1 = 4 member ids in state (the
    truncation witness — bounded state no matter how hot the
    fingerprint); (b) a pair the per-trigger probe legitimately
    emitted early (df at trigger <= cap) is RETRACTED by the exact
    reader once later arrivals push the fingerprint over the cap —
    probe union is a superset, the store reader is the truth."""
    from galaxy_spark.streaming.state_store import (
        ParquetWinnowStore, partial_winnow_index,
        streaming_winnowing_pairs, winnow_probe_pairs)

    # a 20-word shared run -> several distinct shared fingerprints
    # (>= the min-shared floor of 2)
    run = ("quick brown foxes jump over lazy dogs while striped "
           "cats sleep calmly under warm afternoon sun near old "
           "stone walls")
    mk = lambda i: (i, f"{run} unique{i} filler{i} tail{i} "
                    f"pad{i} extra{i} more{i}")
    batch1 = spark.createDataFrame([mk(i) for i in (1, 2, 3)],
                                   "doc_id long, text string")
    batch2 = spark.createDataFrame([mk(i) for i in (4, 5, 6, 7, 8)],
                                   "doc_id long, text string")

    store = ParquetWinnowStore(spark, str(tmp_path / "bp_store"),
                               df_cap=3)
    store.merge(partial_winnow_index(batch1), "lin.000000000000")
    early = {(r.doc_a, r.doc_b) for r in
             winnow_probe_pairs(batch1, store).collect()}
    assert early, "df<=cap pairs must emit at trigger time"

    store.merge(partial_winnow_index(batch2), "lin.000000000001")
    # (a) bounded state: every fp row holds <= cap+1 member ids
    sizes = [r.n for r in store.state()
             .select(F.size("doc_ids").alias("n")).collect()]
    assert max(sizes) == 4 and len(sizes) > 1
    # (b) retraction: the shared run's fingerprints now exceed the
    # cap everywhere, so the exact reader emits nothing...
    assert streaming_winnowing_pairs(store).count() == 0
    # ...and a fresh probe agrees (superset collapsed to truth)
    assert winnow_probe_pairs(batch2, store).count() == 0
    # the early emission was a strict superset of the final answer
    assert early > set()


# ------------------------------------------------------------------
# Retention knobs: session + user-day stores (r12 verdict #5)
# ------------------------------------------------------------------

def test_session_store_retention_bounds_state(spark, tmp_path):
    """retention_days=H on the session store: merge-time eviction
    of sessions that END more than H days behind the folded
    watermark. Pins (a) the absorption property — evicting DURING
    the stream (intermediate watermarks) lands on exactly the
    exact-forever store's state filtered at the final global
    watermark, sessions evicted WHOLE, never truncated; (b) every
    batch session starting inside the window survives with
    identical fields; (c) state is strictly bounded below the
    full-history twin."""
    import time as _time

    from galaxy_spark.registry import all_queries
    from galaxy_spark.streaming.state_store import (
        ParquetSessionStore, start_streaming_sessions,
        streaming_session_rows)

    ev = load_table(spark, SF, "events")
    src = str(tmp_path / "sr_src")
    for k in range(3):
        (ev.filter(F.col("event_id") % 3 == k)
         .coalesce(1).write.mode("append").parquet(src))
        _time.sleep(1.1)

    H = 14
    ret = ParquetSessionStore(spark, str(tmp_path / "sr_ret"),
                              retention_days=H)
    ret.delta_threshold = 2          # exercise the delta-fold site
    full = ParquetSessionStore(spark, str(tmp_path / "sr_full"))
    for store, ck in ((ret, "sr_ck_r"), (full, "sr_ck_f")):
        stream = spark.readStream.schema(ev.schema) \
            .option("maxFilesPerTrigger", 1).parquet(src)
        q = start_streaming_sessions(stream, store,
                                     str(tmp_path / ck))
        q.processAllAvailable()
        q.stop()

    cutoff = ev.agg(F.max(F.unix_micros("ts"))).collect()[0][0] \
        - H * 86_400_000_000

    # (a) absorption: retained state == exact state filtered at
    # the global watermark (whole intervals, e >= cutoff)
    got_iv = sorted(
        (r.user_id, tuple(map(tuple, r.ivs)))
        for r in ret.state().select(
            "user_id", F.filter("ivs",
                                lambda iv: iv["e"] >= F.lit(cutoff))
            .alias("ivs")).filter(F.size("ivs") > 0).collect())
    want_iv = sorted(
        (r.user_id, tuple(map(tuple, r.ivs)))
        for r in full.state().select(
            "user_id", F.filter("ivs",
                                lambda iv: iv["e"] >= F.lit(cutoff))
            .alias("ivs")).filter(F.size("ivs") > 0).collect())
    assert got_iv == want_iv and len(want_iv) > 5

    # (b) every batch session starting in-window survives with
    # identical (user, n_events, value, start); the only extras
    # the reader may add are straddlers (start < cutoff <= end) —
    # retained whole by design
    got = {(r.user_id, r.n_events, r.session_value, r.session_start)
           for r in streaming_session_rows(ret).collect()}
    batch = all_queries()["events_sessionization"](spark, SF)
    from datetime import datetime, timezone
    cut_ts = datetime.fromtimestamp(cutoff / 1e6, tz=timezone.utc)
    want_in = {(r.user_id, r.n_events, r.session_value,
                r.session_start)
               for r in batch.collect()
               if r.session_start.replace(tzinfo=timezone.utc)
               >= cut_ts}
    assert want_in <= got and len(want_in) > 5
    extras = got - want_in               # straddlers only
    all_batch = {(r.user_id, r.n_events, r.session_value,
                  r.session_start) for r in batch.collect()}
    assert extras <= all_batch

    # (c) bounded state: strictly fewer stored intervals
    n_ret = ret.state().agg(F.sum(F.size("ivs"))).collect()[0][0]
    n_full = full.state().agg(F.sum(F.size("ivs"))).collect()[0][0]
    assert 0 < n_ret < n_full


def test_user_day_store_retention_bounds_state(spark, tmp_path):
    """retention_days=H on the user-day store (the fold_finalize
    row-eviction seam — the aging column is part of the KEY, so
    eviction cannot live inside the agg): the decay reader answers
    exactly the batch decay query over events restricted to the
    retained window, and state is strictly bounded below the
    full-history twin. Delta tier on, so the pre-fold, compaction
    and read-side fold sites all run the finalize filter."""
    import time as _time

    from galaxy_spark.queries.events import decay_scores_from_events
    from galaxy_spark.streaming.state_store import (
        ParquetUserDayStore, start_streaming_user_days,
        streaming_decay_scores)

    ev = load_table(spark, SF, "events")
    src = str(tmp_path / "udr_src")
    for k in range(3):
        (ev.filter(F.col("event_id") % 3 == k)
         .coalesce(1).write.mode("append").parquet(src))
        _time.sleep(1.1)

    H = 14
    store = ParquetUserDayStore(spark, str(tmp_path / "udr_store"),
                                retention_days=H)
    store.delta_threshold = 2
    full = ParquetUserDayStore(spark, str(tmp_path / "udr_full"))
    for st, ck in ((store, "udr_ck"), (full, "udr_ck_f")):
        stream = spark.readStream.schema(ev.schema) \
            .option("maxFilesPerTrigger", 1).parquet(src)
        q = start_streaming_user_days(stream, st,
                                      str(tmp_path / ck))
        q.processAllAvailable()
        q.stop()

    cut = ev.agg(F.date_sub(F.max(F.to_date("ts")), H)
                 .alias("c")).collect()[0].c
    ev_r = ev.filter(F.to_date("ts") >= F.lit(cut))
    assert 0 < ev_r.count() < ev.count()

    got = sorted((r.user_id, r.decay_score, r.purchase_score,
                  r.n_recent)
                 for r in streaming_decay_scores(store).collect())
    want = sorted((r.user_id, r.decay_score, r.purchase_score,
                   r.n_recent)
                  for r in decay_scores_from_events(ev_r).collect())
    assert got == want and len(want) >= 10

    assert 0 < store.state().count() < full.state().count()


# ------------------------------------------------------------------
# Streaming item-CF / frequent-pairs hub (r12 verdict #7 optional)
# ------------------------------------------------------------------

def test_streaming_item_cf_matches_batch(spark, tmp_path):
    """The co-occurrence hub: lineitem stream sliced BY PART so
    most orders' lines arrive across different micro-batches (the
    hard case — a pair's two items in different batches must meet
    through the accumulated basket store), kill/restart
    mid-stream, plus a duplicate re-delivery of a whole slice
    under a fresh epoch key (claim-skip can't absorb it; the
    new-item discipline must). Both readers equal their batch
    queries row-for-row over the replayed corpus."""
    import time as _time

    from galaxy_spark.registry import all_queries
    from galaxy_spark.streaming.state_store import (
        ParquetBasketStore, ParquetCoocStore, ParquetItemDegStore,
        cooc_deltas, start_streaming_item_cf,
        streaming_frequent_pairs, streaming_item_cf_topk)

    li = load_table(spark, SF, "lineitem") \
        .select("l_orderkey", "l_partkey")
    src = str(tmp_path / "cf_src")
    for k in range(3):                 # slices split by PART
        (li.filter(F.col("l_partkey") % 3 == k)
         .coalesce(1).write.mode("append").parquet(src))
        _time.sleep(1.1)

    baskets = ParquetBasketStore(spark, str(tmp_path / "cf_b"))
    cooc = ParquetCoocStore(spark, str(tmp_path / "cf_c"))
    cooc.delta_threshold = 2
    deg = ParquetItemDegStore(spark, str(tmp_path / "cf_d"))
    ck = str(tmp_path / "cf_ck")

    def start():
        stream = spark.readStream.schema(li.schema) \
            .option("maxFilesPerTrigger", 1).parquet(src)
        return start_streaming_item_cf(stream, baskets, cooc, deg,
                                       ck)

    q = start()
    while not os.path.exists(os.path.join(ck, "commits", "0")):
        _time.sleep(0.1)
    q.stop()                           # the "kill"
    q = start()
    q.processAllAvailable()
    q.stop()

    # whole-slice re-delivery under a FRESH epoch: the basket
    # store's new-item discipline must make it a no-op
    dup = li.filter(F.col("l_partkey") % 3 == 0)
    pair_d, deg_d, bk = cooc_deltas(dup, baskets)
    assert pair_d.count() == 0 and deg_d.count() == 0 \
        and bk.count() == 0
    lin = sorted(cooc.lineages())[0]
    cooc.merge(pair_d, f"{lin}.000000000099")
    deg.merge(deg_d, f"{lin}.000000000099")

    got = sorted(map(tuple,
                     streaming_item_cf_topk(cooc, deg).collect()))
    want = sorted(map(tuple, all_queries()["similarity_item_cf_topk"](
        spark, SF).collect()))
    assert got == want and len(want) > 100

    got_fp = sorted(map(tuple,
                        streaming_frequent_pairs(cooc,
                                                 deg).collect()))
    want_fp = sorted(map(tuple, all_queries()["mining_frequent_pairs"](
        spark, SF).collect()))
    assert got_fp == want_fp and len(want_fp) > 10

    # third reader (r14): association lift — N from the basket
    # store's key count
    from galaxy_spark.streaming.state_store import \
        streaming_pair_lift
    got_l = sorted(map(tuple, streaming_pair_lift(
        cooc, deg, baskets).collect()))
    want_l = sorted(map(tuple, all_queries()["mining_pair_lift"](
        spark, SF).collect()))
    assert got_l == want_l and len(want_l) > 10

    # fourth reader (r14): per-node clustering coefficient — the
    # cooc store's n >= 1 pairs ARE the co-purchase edges, so the
    # batch query's triangle tail runs over state verbatim
    from galaxy_spark.streaming.state_store import \
        streaming_clustering_coefficient
    got_cc = sorted(map(tuple, streaming_clustering_coefficient(
        cooc).collect()))
    want_cc = sorted(map(tuple,
                         all_queries()["graph_clustering_coefficient"](
                             spark, SF).collect()))
    assert got_cc == want_cc and len(want_cc) > 100

    # fifth reader (r14): degree assortativity — same edge
    # derivation, the sufficient-statistics tail
    from galaxy_spark.streaming.state_store import \
        streaming_degree_assortativity
    got_a = sorted(map(tuple, streaming_degree_assortativity(
        cooc).collect()))
    want_a = sorted(map(tuple,
                        all_queries()["graph_degree_assortativity"](
                            spark, SF).collect()))
    assert got_a == want_a and len(want_a) == 1

    # readers six and seven (r14): the per-edge link features —
    # the whole graph family now reads one maintained pair store
    from galaxy_spark.streaming.state_store import (
        streaming_common_neighbors, streaming_resource_allocation)
    got_cn = sorted(map(tuple,
                        streaming_common_neighbors(cooc).collect()))
    want_cn = sorted(map(tuple,
                         all_queries()["graph_common_neighbors"](
                             spark, SF).collect()))
    assert got_cn == want_cn and len(want_cn) == 50
    # the max_degree hot-node lever reaches the reader too (r13
    # verdict #7) — == batch under the SAME cap, and the cap
    # genuinely bites (sampled != exact)
    from galaxy_spark.queries.graphs import graph_common_neighbors
    got_cap = sorted(map(tuple, streaming_common_neighbors(
        cooc, max_degree=3).collect()))
    want_cap = sorted(map(tuple, graph_common_neighbors(
        spark, SF, max_degree=3).collect()))
    assert got_cap == want_cap and got_cap != got_cn
    got_ra = sorted(map(tuple,
                        streaming_resource_allocation(cooc).collect()))
    want_ra = sorted(map(tuple,
                         all_queries()["graph_resource_allocation"](
                             spark, SF).collect()))
    assert got_ra == want_ra and len(want_ra) == 50


def test_basket_retention_recount_contract(spark, tmp_path):
    """r13 verdict #4, the documented inexactness made explicit:
    with ``retention_days=H`` on the basket store, a line arriving
    MORE than H days after its order's last ship activity finds an
    evicted (empty) basket — it re-counts as new (degree +1 again)
    and pairs only against later arrivals; counts can only
    over-count, never lose a pair. Deterministic micro-case."""
    from galaxy_spark.streaming.state_store import (
        ParquetBasketStore, ParquetCoocStore, ParquetItemDegStore,
        cooc_deltas)

    baskets = ParquetBasketStore(spark, str(tmp_path / "br_b"),
                                 n_buckets=1, retention_days=10)
    cooc = ParquetCoocStore(spark, str(tmp_path / "br_c"))
    deg = ParquetItemDegStore(spark, str(tmp_path / "br_d"))
    schema = "l_orderkey long, l_partkey long, l_shipdate date"

    def merge(rows, eid):
        b = spark.createDataFrame(rows, schema)
        pd_, dd, bk = cooc_deltas(b, baskets)
        cooc.merge(pd_, f"lin.{eid:012d}")
        deg.merge(dd, f"lin.{eid:012d}")
        baskets.merge(bk, f"lin.{eid:012d}")

    from datetime import date
    d0 = date(2024, 1, 1)
    merge([(1, 101, d0), (1, 102, d0)], 0)     # order 1: p101+p102
    # day 31: another order touches the (single) bucket — the fold
    # evicts order 1's basket (t=d0 < current_wm=d31-10)
    merge([(2, 201, date(2024, 2, 1))], 1)
    assert [r.o for r in baskets.state().collect()] == [2], \
        "order 1's basket should have evicted on bucket fold"
    # day 32: a >H-late line for order 1 re-counts: p101 is 'new'
    # again (degree over-count) and pairs with p103 only
    merge([(1, 101, date(2024, 2, 2)), (1, 103, date(2024, 2, 2))],
          2)
    got_deg = {r.p: r.d for r in deg.state().collect()}
    assert got_deg == {101: 2, 102: 1, 103: 1, 201: 1}
    got_cooc = {(r.part_a, r.part_b): r.n
                for r in cooc.state().collect()}
    assert got_cooc == {(101, 102): 1, (102, 101): 1,
                        (101, 103): 1, (103, 101): 1}
    # a time-less batch under retention fails loudly
    with pytest.raises(ValueError, match="l_shipdate"):
        cooc_deltas(spark.createDataFrame(
            [(3, 301)], "l_orderkey long, l_partkey long"),
            baskets)
    with pytest.raises(ValueError, match="retention_days"):
        ParquetBasketStore(spark, str(tmp_path / "br_bad"),
                           retention_days=0)


def test_basket_retention_bounds_state(spark, tmp_path):
    """The horizon's point at 100 TB: basket state is O(orders
    active within H) + tails of untouched buckets, not O(all
    orders ever). Lineitem streamed in SHIP-DATE order (three
    date-tercile slices):

    - with a horizon far smaller than the corpus span the
      retained store ends strictly smaller than the exact-forever
      twin (every surviving basket sits at/above the final
      watermark — the slices touch every bucket, so the sweep is
      complete), while pair/degree counts stay well-formed;
    - with a horizon covering the whole span NOTHING can expire
      and the retention path's counts equal the exact twin
      row-for-row (the code path is exercised — t column, wm
      advance, probe filter — without any eviction)."""
    import time as _time

    from galaxy_spark.streaming.state_store import (
        ParquetBasketStore, ParquetCoocStore, ParquetItemDegStore,
        start_streaming_item_cf)

    li = load_table(spark, SF, "lineitem") \
        .select("l_orderkey", "l_partkey",
                F.to_date("l_shipdate").alias("l_shipdate"))
    qs = li.agg(
        F.expr("percentile(unix_date(l_shipdate), 0.33)").alias("a"),
        F.expr("percentile(unix_date(l_shipdate), 0.66)").alias("b")
    ).collect()[0]
    cuts = [int(qs.a), int(qs.b)]
    src = str(tmp_path / "brb_src")
    conds = [F.expr(f"unix_date(l_shipdate) <= {cuts[0]}"),
             F.expr(f"unix_date(l_shipdate) > {cuts[0]} AND "
                    f"unix_date(l_shipdate) <= {cuts[1]}"),
             F.expr(f"unix_date(l_shipdate) > {cuts[1]}")]
    for c in conds:                    # slices in ship-date order
        li.filter(c).coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)

    H = 180
    ret_b = ParquetBasketStore(spark, str(tmp_path / "brb_b"),
                               retention_days=H)
    ret_b.delta_threshold = 2          # exercise every fold site
    cooc = ParquetCoocStore(spark, str(tmp_path / "brb_c"))
    deg = ParquetItemDegStore(spark, str(tmp_path / "brb_d"))
    wide_b = ParquetBasketStore(spark, str(tmp_path / "brb_wb"),
                                retention_days=9999)
    wcooc = ParquetCoocStore(spark, str(tmp_path / "brb_wc"))
    wdeg = ParquetItemDegStore(spark, str(tmp_path / "brb_wd"))
    full_b = ParquetBasketStore(spark, str(tmp_path / "brb_fb"))
    fcooc = ParquetCoocStore(spark, str(tmp_path / "brb_fc"))
    fdeg = ParquetItemDegStore(spark, str(tmp_path / "brb_fd"))
    for bst, cst, dst, ck in ((ret_b, cooc, deg, "brb_ck"),
                              (wide_b, wcooc, wdeg, "brb_wck"),
                              (full_b, fcooc, fdeg, "brb_fck")):
        stream = spark.readStream.schema(li.schema) \
            .option("maxFilesPerTrigger", 1).parquet(src)
        q = start_streaming_item_cf(stream, bst, cst, dst,
                                    str(tmp_path / ck))
        q.processAllAvailable()
        q.stop()

    n_ret, n_full = ret_b.state().count(), full_b.state().count()
    assert 0 < n_ret < n_full, (n_ret, n_full)
    assert ret_b.current_wm is not None
    assert ret_b.state().filter(
        F.col("t") < F.lit(ret_b.current_wm)).count() == 0, \
        "a surviving basket sits below the final watermark"
    assert cooc.state().filter(F.col("n") <= 0).count() == 0
    # H covering the span: the retention code path, zero eviction,
    # exact equality with the unbounded twin
    assert wide_b.state().count() == n_full
    assert sorted(map(tuple, wcooc.state().collect())) == \
        sorted(map(tuple, fcooc.state().collect()))
    assert sorted(map(tuple, wdeg.state().collect())) == \
        sorted(map(tuple, fdeg.state().collect()))


def test_streaming_item_cf_basket_cap_matches_capped_batch(
        spark, tmp_path):
    """r14, the streaming face of ``cap_mega_baskets``: a hub with
    ``basket_cap=K`` must equal the BATCH queries run with the
    same cap — on TPC-H's widest baskets the cap genuinely bites
    (capped != uncapped), lines stream BY PART so samples get
    REVISED mid-stream (items hash-evicting earlier arrivals →
    negative deltas through the SUM monoid and the zero-row fold
    filter), with a kill/restart and a whole-slice re-delivery
    under a fresh epoch proving the truncation monoid keeps
    re-delivery a no-op."""
    import time as _time

    from galaxy_spark.queries.graphs import (
        mining_frequent_pairs as batch_fp,
        mining_pair_lift as batch_lift,
        similarity_item_cf_topk as batch_cf)
    from galaxy_spark.streaming.state_store import (
        ParquetBasketStore, ParquetCoocStore, ParquetItemDegStore,
        cooc_deltas, start_streaming_item_cf,
        streaming_frequent_pairs, streaming_item_cf_topk,
        streaming_pair_lift)

    K = 3                     # TPC-H baskets reach 7 -> cap bites
    li = load_table(spark, SF, "lineitem") \
        .select("l_orderkey", "l_partkey")
    src = str(tmp_path / "cap_src")
    for k in range(3):                 # slices split by PART
        (li.filter(F.col("l_partkey") % 3 == k)
         .coalesce(1).write.mode("append").parquet(src))
        _time.sleep(1.1)

    baskets = ParquetBasketStore(spark, str(tmp_path / "cap_b"),
                                 basket_cap=K)
    cooc = ParquetCoocStore(spark, str(tmp_path / "cap_c"))
    cooc.delta_threshold = 2
    deg = ParquetItemDegStore(spark, str(tmp_path / "cap_d"))
    ck = str(tmp_path / "cap_ck")

    def start():
        stream = spark.readStream.schema(li.schema) \
            .option("maxFilesPerTrigger", 1).parquet(src)
        return start_streaming_item_cf(stream, baskets, cooc, deg,
                                       ck)

    q = start()
    while not os.path.exists(os.path.join(ck, "commits", "0")):
        _time.sleep(0.1)
    q.stop()                           # the "kill"
    q = start()
    q.processAllAvailable()
    q.stop()

    # the truncation monoid's state bound: every basket <= K items
    widths = baskets.state().select(
        F.max(F.size("parts")).alias("w")).collect()[0].w
    assert widths == K, f"cap should bite and bound: {widths}"
    # counts never negative, zero rows physically filtered
    assert cooc.state().filter(F.col("n") <= 0).count() == 0
    assert deg.state().filter(F.col("d") <= 0).count() == 0

    # whole-slice re-delivery under a FRESH epoch: every item
    # either already in its order's sample or hash-losing to it —
    # S_new == S_old everywhere, zero deltas, zero partials
    dup = li.filter(F.col("l_partkey") % 3 == 0)
    pair_d, deg_d, bk = cooc_deltas(dup, baskets)
    assert pair_d.count() == 0 and deg_d.count() == 0 \
        and bk.count() == 0

    got_cf = sorted(map(tuple,
                        streaming_item_cf_topk(cooc, deg).collect()))
    want_cf = sorted(map(tuple,
                         batch_cf(spark, SF, basket_cap=K).collect()))
    assert got_cf == want_cf and len(want_cf) > 100
    got_fp = sorted(map(tuple,
                        streaming_frequent_pairs(cooc, deg).collect()))
    want_fp = sorted(map(tuple,
                         batch_fp(spark, SF, basket_cap=K).collect()))
    assert got_fp == want_fp and len(want_fp) > 5
    got_l = sorted(map(tuple,
                       streaming_pair_lift(cooc, deg,
                                           baskets).collect()))
    want_l = sorted(map(tuple,
                        batch_lift(spark, SF,
                                   basket_cap=K).collect()))
    assert got_l == want_l and len(want_l) > 5

    # non-vacuous: the cap genuinely changes the answer vs uncapped
    uncapped_fp = sorted(map(tuple, batch_fp(spark, SF).collect()))
    assert got_fp != uncapped_fp

    with pytest.raises(ValueError, match="basket cap"):
        ParquetBasketStore(spark, str(tmp_path / "cap_bad"),
                           basket_cap=1)


def test_fold_finalize_empty_bucket_slice_still_claims_epoch(
        spark, tmp_path):
    """r13 review: a retention filter can evict a touched bucket's
    ENTIRE folded slice — the commit must still publish (an empty
    0-row version) so the epoch is claimed and replays skip,
    instead of re-running the fold for that bucket forever."""
    from datetime import datetime

    from galaxy_spark.streaming.state_store import (
        ParquetUserDayStore, partial_user_days)

    H = 14
    store = ParquetUserDayStore(spark, str(tmp_path / "ef_store"),
                                retention_days=H)

    def ev(user, day_str, typ="view"):
        return (1, datetime.fromisoformat(day_str + "T12:00:00"),
                user, typ, 1.0, "{}")
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")

    # find two users hashing to DIFFERENT buckets for their days
    probe = spark.createDataFrame(
        [ev(u, "2024-01-01") for u in range(8)]
        + [ev(u, "2024-06-01") for u in range(8)], schema)
    pk = partial_user_days(probe, H).select("user_id", "day")
    rows = pk.collect()
    bmap = {}
    for r in rows:
        b = store._buckets_for_keys(
            pk.filter((F.col("user_id") == r.user_id)
                      & (F.col("day") == r.day)))[0]
        bmap[(r.user_id, str(r.day))] = b
    old_key = next(k for k in bmap if k[1] == "2024-01-01")
    new_key = next(k for k in bmap if k[1] == "2024-06-01"
                   and bmap[k] != bmap[old_key])

    # ONE batch: a fresh row (sets the watermark) + a >H-late row
    # whose bucket holds nothing else — its folded slice is empty
    batch = spark.createDataFrame(
        [ev(new_key[0], "2024-06-01"), ev(old_key[0], "2024-01-01")],
        schema)
    store.merge(partial_user_days(batch, H), "lin.000000000000")

    b_old = bmap[old_key]
    assert store._applied(b_old, "lin.000000000000"), \
        "evicted-slice bucket left unclaimed: every replay refolds"
    # the empty version is a legitimate readable slice
    assert {(r.user_id, str(r.day)) for r in
            store.state().select("user_id", "day").collect()} \
        == {(new_key[0], new_key[1])}
    # and a replay is the claim-skip no-op, not a rewrite
    before = sorted(map(tuple, store.state().collect()))
    store.merge(partial_user_days(batch, H), "lin.000000000000")
    assert sorted(map(tuple, store.state().collect())) == before
