"""Audit-log parity tests (reference internal/audit/audit.go:1-180):
mutating RPCs through the facade must produce replayable audit records
with the reference's field shape; torn tail lines are skipped on
replay; the /v1/audit REST surface filters the trail."""

import json

import pytest

from miniodb_spark.api import MiniODBService
from miniodb_spark.audit import AuditLogger

US = 1_000_000
T0 = 1_700_000_000 * US


@pytest.fixture()
def audited_service(engine, tmp_path):
    log = AuditLogger(str(tmp_path / "audit" / "audit.jsonl"), node_id="n1")
    return MiniODBService(engine, audit=log), log


def test_lifecycle_produces_replayable_records(audited_service):
    svc, log = audited_service
    svc.create_table("at")
    svc.write_data("at", {"id": "a", "timestamp": T0, "payload": {"v": 1}},
                   client_id="alice")
    svc.stream_write("at", [{"id": "b", "payload": {"v": 2}}],
                     client_id="alice")
    svc.update_data("at", "a", {"v": 9}, client_id="bob")
    svc.delete_data("at", "b", client_id="bob")
    svc.query_data("SELECT id FROM at")  # reads are NOT audited
    svc.delete_table("at")

    entries = list(log.replay())
    actions = [e["action"] for e in entries]
    assert actions == ["create_table", "write", "stream_write", "update",
                      "delete", "delete_table"]
    # reference field shape on every entry
    for e in entries:
        assert {"timestamp", "action", "table", "record_id", "user_id",
                "success", "node_id"} <= set(e)
        assert e["node_id"] == "n1" and e["success"] is True
        assert e["timestamp"] > 0 and e.get("duration_ms", 0) >= 0
    w = entries[1]
    assert (w["table"], w["record_id"], w["user_id"]) == ("at", "a", "alice")
    u = entries[3]
    assert u["user_id"] == "bob" and u["details"] == {"replaced": 1}
    d = entries[4]
    assert d["details"] == {"deleted_count": 1}


def test_failures_are_audited_with_error(audited_service):
    svc, log = audited_service
    with pytest.raises(TypeError):
        svc.create_table("bad", {"no_such_config_key": 1})
    entries = list(log.replay())
    assert entries and entries[-1]["action"] == "create_table"
    assert entries[-1]["success"] is False and entries[-1]["error"]


def test_generated_id_lands_in_audit(audited_service):
    svc, _log = audited_service
    out = svc.write_data("gen", {"payload": {"v": 1}})
    entries = list(_log.replay())
    write = [e for e in entries if e["action"] == "write"][-1]
    assert write["record_id"] == out["id"] != ""


def test_replay_skips_torn_and_corrupt_lines(tmp_path):
    log = AuditLogger(str(tmp_path / "a.jsonl"))
    log.log("write", "t", "1")
    log.log("delete", "t", "2")
    with open(log.path, "a", encoding="utf-8") as fh:
        fh.write('{"crc":12345,"e":{"action":"write","tampered":true}}\n')
        fh.write('{"crc":99,"e":{"action":"truncat')  # torn tail (crash)
    # the process restarts after the crash: a fresh logger probes the
    # tail once and starts a clean line (the torn fragment alone is lost)
    log2 = AuditLogger(str(tmp_path / "a.jsonl"))
    log2.log("update", "t", "3")
    actions = [e["action"] for e in log2.replay()]
    assert actions == ["write", "delete", "update"]


def test_read_filters_and_limit(tmp_path):
    log = AuditLogger(str(tmp_path / "a.jsonl"))
    for i in range(10):
        log.log("write" if i % 2 == 0 else "delete", f"t{i % 3}", str(i),
                user_id="u1" if i < 5 else "u2")
    assert len(log.read(limit=4)) == 4
    assert all(e["action"] == "write" for e in log.read(action="write"))
    assert all(e["table"] == "t0" for e in log.read(table="t0"))
    assert len(log.read(user_id="u2")) == 5


def test_disabled_logger_is_noop(tmp_path):
    log = AuditLogger(str(tmp_path / "off.jsonl"), enabled=False)
    log.log("write", "t", "1")
    assert list(log.replay()) == []
    import os

    assert not os.path.exists(log.path)


def test_audit_df_is_queryable(audited_service, spark):
    svc, log = audited_service
    svc.write_data("dfq", {"id": "a", "payload": {"v": 1}})
    svc.delete_data("dfq", "a")
    df = log.load_df(spark)
    assert df.filter("action = 'delete' AND table = 'dfq'").count() == 1


def test_rest_audit_route(engine, tmp_path):
    import urllib.request

    from miniodb_spark.rest import RestServer

    log = AuditLogger(str(tmp_path / "r.jsonl"), node_id="n9")
    svc = MiniODBService(engine, audit=log)
    srv = RestServer(svc, port=0).serve_background()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        body = json.dumps({"table": "rt", "record": {
            "id": "x", "payload": {"v": 1}}}).encode()
        req = urllib.request.Request(f"{base}/v1/data", data=body,
                                     headers={"Content-Type": "application/json"})
        urllib.request.urlopen(req)
        out = json.loads(urllib.request.urlopen(
            f"{base}/v1/audit?action=write").read())
        assert out["enabled"] and out["total"] == 1
        e = out["entries"][0]
        assert e["table"] == "rt" and e["record_id"] == "x"
        assert e["node_id"] == "n9"
        # filter that matches nothing
        none = json.loads(urllib.request.urlopen(
            f"{base}/v1/audit?table=absent").read())
        assert none["total"] == 0
    finally:
        srv.shutdown()


def test_rest_audit_route_disabled(engine):
    import urllib.request

    from miniodb_spark.rest import RestServer

    srv = RestServer(MiniODBService(engine), port=0).serve_background()
    try:
        out = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/v1/audit").read())
        assert out == {"enabled": False, "entries": []}
    finally:
        srv.shutdown()
