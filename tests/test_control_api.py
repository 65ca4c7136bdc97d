"""HTTP control-plane tests (T1 parity): drive the stdlib server
over a real loopback socket with http.client — the same surface the
reference exposes via gin (internal/scheduler/api.go:13-40).
"""

from __future__ import annotations

import http.client
import json
import os

import pytest

from galaxy_spark.cdc.envelope import EVENT_SOURCE_COLUMNS, envelope_from_events
from galaxy_spark.control.api import ControlPlane
from galaxy_spark.control.metrics import MetricsListener
from galaxy_spark.control.tasks import TaskManager
from galaxy_spark.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def events_dir(spark, tmp_path):
    out = str(tmp_path / "events_src")
    load_table(spark, SF, "events").write.mode("overwrite").parquet(out)
    return out


def _source_factory(path):
    def factory(spark, spec):
        static = spark.read.parquet(path)
        return envelope_from_events(
            spark.readStream.schema(static.schema).parquet(path))
    return factory


@pytest.fixture()
def plane(spark, events_dir, tmp_path):
    mgr = TaskManager(spark, str(tmp_path / "state"),
                      _source_factory(events_dir))
    cp = ControlPlane(mgr, metrics=MetricsListener()).start()
    yield cp
    for tid in list(mgr.queries):
        mgr.stop_task(tid)
    cp.stop()


def _call(plane, method, path, body=None):
    host, port = plane.address
    conn = http.client.HTTPConnection(host, port, timeout=30)
    payload = None if body is None else json.dumps(body)
    conn.request(method, path, body=payload,
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    raw = resp.read().decode()
    conn.close()
    try:
        return resp.status, json.loads(raw)
    except json.JSONDecodeError:
        return resp.status, raw


def test_post_task_then_get_task(plane):
    status, out = _call(plane, "POST", "/v1/post_task", {
        "task_id": "api_t1",
        "database": ["db0"],
        "tables": ["db0.*"],
        "columns": list(EVENT_SOURCE_COLUMNS),
        "sink_kind": "memory",
    })
    assert status == 200 and out["error_code"] == 0

    plane.manager.await_all()
    status, out = _call(plane, "GET", "/v1/task")
    assert status == 200
    assert out["data"]["total"] == 1
    assert out["data"]["task"]["api_t1"]["active"]


def test_post_task_rejects_missing_id(plane):
    status, out = _call(plane, "POST", "/v1/post_task", {"database": ["db0"]})
    assert status == 400 and out["error_code"] == 400
    assert "task is null" in out["message"]  # LegalVerification parity


def test_stop_and_recover_roundtrip(plane, tmp_path):
    _call(plane, "POST", "/v1/post_task", {
        "task_id": "api_lc", "columns": list(EVENT_SOURCE_COLUMNS),
        "sink_kind": "parquet",
        "sink_options": {"path": str(tmp_path / "out_api_lc")},
    })
    plane.manager.await_all()

    status, out = _call(plane, "POST", "/v1/stop_task",
                        {"task_id": "api_lc", "stop_type": "stop"})
    assert status == 200 and "STOP TASK SUCCESS" in out["message"]
    assert not plane.manager.status()["api_lc"]["active"]
    assert plane.manager.tasks["api_lc"].stopped

    status, _ = _call(plane, "POST", "/v1/stop_task",
                      {"task_id": "api_lc", "stop_type": "recovery_v1"})
    assert status == 200
    plane.manager.await_all()
    assert plane.manager.status()["api_lc"]["active"]

    # recovery_v2 bumps the checkpoint epoch (jump-to-latest analog)
    e0 = plane.manager.tasks["api_lc"].checkpoint_epoch
    status, _ = _call(plane, "POST", "/v1/stop_task",
                      {"task_id": "api_lc", "stop_type": "recovery_v2"})
    assert status == 200
    assert plane.manager.tasks["api_lc"].checkpoint_epoch == e0 + 1


def test_stop_task_unknown_id_and_bad_type(plane):
    status, _ = _call(plane, "POST", "/v1/stop_task",
                      {"task_id": "nope", "stop_type": "stop"})
    assert status == 400
    _call(plane, "POST", "/v1/post_task",
          {"task_id": "api_bad", "sink_kind": "memory",
           "columns": list(EVENT_SOURCE_COLUMNS)})
    status, _ = _call(plane, "POST", "/v1/stop_task",
                      {"task_id": "api_bad", "stop_type": "recovery_v9"})
    assert status == 400


def test_update_task_filters(plane, tmp_path):
    # parquet sink: filter update restarts from the checkpoint, which
    # the memory sink doesn't support (matches production Kafka)
    _call(plane, "POST", "/v1/post_task", {
        "task_id": "api_upd", "database": ["db0"],
        "columns": list(EVENT_SOURCE_COLUMNS), "sink_kind": "parquet",
        "sink_options": {"path": str(tmp_path / "out_api_upd")},
    })
    plane.manager.await_all()
    status, out = _call(plane, "POST", "/v1/update_task", {
        "task_id": "api_upd", "database": ["db1"],
        "tables": ["db1.click"], "exclude_table": [],
    })
    assert status == 200 and out["message"] == "Update Success"
    spec = plane.manager.tasks["api_upd"]
    assert spec.databases == ("db1",) and spec.tables == ("db1.click",)


def test_delete_task_removes_state_exactly(plane, tmp_path):
    """Deleting 'api_del' must not touch 'api_del_extra''s
    checkpoints (exact epoch match, not a prefix glob)."""
    for tid in ("api_del", "api_del_extra"):
        _call(plane, "POST", "/v1/post_task", {
            "task_id": tid, "columns": list(EVENT_SOURCE_COLUMNS),
            "sink_kind": "parquet",
            "sink_options": {"path": str(tmp_path / f"out_{tid}")},
        })
    plane.manager.await_all()
    ckpt_root = os.path.join(plane.manager.state_dir, "checkpoints")
    assert sorted(os.listdir(ckpt_root)) == ["api_del-e0", "api_del_extra-e0"]

    status, out = _call(plane, "POST", "/v1/delete_task/api_del")
    assert status == 200 and "DEL TASK SUCCESS" in out["message"]
    assert os.listdir(ckpt_root) == ["api_del_extra-e0"]
    assert "api_del" not in plane.manager.tasks

    status, _ = _call(plane, "POST", "/v1/delete_task/api_del")
    assert status == 400  # already gone -> parameter error, gin parity


def test_restoration_task_relaunches(plane, tmp_path):
    _call(plane, "POST", "/v1/post_task", {
        "task_id": "api_fix", "columns": list(EVENT_SOURCE_COLUMNS),
        "sink_kind": "parquet",
        "sink_options": {"path": str(tmp_path / "out_api_fix")},
    })
    plane.manager.await_all()
    status, out = _call(plane, "POST", "/v1/restoration_task/api_fix")
    assert status == 200 and "RESTORATION TASK SUCCESS" in out["message"]
    plane.manager.await_all()
    assert plane.manager.status()["api_fix"]["active"]


def test_metrics_endpoint(plane):
    status, text = _call(plane, "GET", "/metrics")
    assert status == 200
    assert "galaxy_stream" in text or "galaxy_up" in text


def test_unknown_route_404(plane):
    status, _ = _call(plane, "GET", "/v2/nope")
    assert status == 404
    status, _ = _call(plane, "POST", "/v1/nope")
    assert status == 404
