"""REST transport: the reference's /v1 route table served over HTTP
(reference transport/rest/server.go:477-521), driven by a plain
urllib client — what a reference REST user would do."""

import json
import urllib.error
import urllib.request

import pytest

from miniodb_spark.api import MiniODBService
from miniodb_spark.auth import TokenManager
from miniodb_spark.rest import RestServer

US = 1_000_000
T0 = 1_700_000_000 * US


def _call(port, method, path, body=None, token=None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", method=method,
        data=json.dumps(body).encode() if body is not None else None,
        headers={"Content-Type": "application/json"}
        | ({"Authorization": f"Bearer {token}"} if token else {}),
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        ct = resp.headers.get("Content-Type", "")
        raw = resp.read()
        return resp.status, (json.loads(raw) if "json" in ct else raw.decode())


@pytest.fixture()
def server(engine):
    srv = RestServer(MiniODBService(engine)).serve_background()
    yield srv
    srv.shutdown()


def test_rest_lifecycle(server):
    p = server.port
    assert _call(p, "GET", "/v1/health")[1]["status"] == "healthy"
    _call(p, "POST", "/v1/tables", {"name": "users", "config": {"buffer_size": 10}})
    assert "users" in _call(p, "GET", "/v1/tables")[1]["tables"]
    assert _call(p, "GET", "/v1/tables/users")[1]["config"]["buffer_size"] == 10

    _call(p, "POST", "/v1/data", {
        "table": "users",
        "record": {"id": "u1", "timestamp": T0, "payload": {"age": 30}}})
    _call(p, "POST", "/v1/stream/write", {
        "table": "users",
        "records": [{"id": f"s{i}", "timestamp_us": T0, "payload": {"age": 40 + i}}
                    for i in range(3)]})
    out = _call(p, "POST", "/v1/query",
                {"sql": "SELECT id, age FROM users ORDER BY id"})[1]
    rows = json.loads(out["result_json"])
    assert [r["id"] for r in rows] == ["u1", "s0", "s1", "s2"][0:0] + sorted(
        ["u1", "s0", "s1", "s2"])
    _call(p, "PUT", "/v1/data", {"table": "users", "id": "u1",
                                 "payload": {"age": 31}, "timestamp": T0})
    _call(p, "DELETE", "/v1/data", {"table": "users", "id": "s0"})
    out = _call(p, "POST", "/v1/query",
                {"sql": "SELECT count(*) AS n FROM users"})[1]
    assert json.loads(out["result_json"])[0]["n"] == 3

    sq = _call(p, "POST", "/v1/stream/query",
               {"sql": "SELECT id FROM users ORDER BY id", "batch_size": 2})[1]
    assert len(sq["rows"]) == 2 and sq["has_more"]

    b = _call(p, "POST", "/v1/metadata/backup")[1]
    assert b["success"]
    assert _call(p, "GET", "/v1/metadata/backups?days=1")[1]["total"] >= 1
    assert _call(p, "GET", "/v1/metadata/status")[1]["health_status"] == "healthy"
    assert _call(p, "GET", "/v1/status")[1]["uptime_s"] >= 0
    assert "cache_hits" in _call(p, "GET", "/v1/metrics")[1]
    assert "rpc_requests_total" in _call(p, "GET", "/metrics")[1]
    _call(p, "DELETE", "/v1/tables/users")
    assert "users" not in _call(p, "GET", "/v1/tables")[1]["tables"]


def test_rest_auth_enforced(engine):
    svc = MiniODBService(engine, auth=TokenManager("k", {"api": "sec"}))
    srv = RestServer(svc).serve_background()
    p = srv.port
    try:
        # secured route without token → 401
        with pytest.raises(urllib.error.HTTPError) as ei:
            _call(p, "GET", "/v1/tables")
        assert ei.value.code == 401
        # open routes work; token unlocks secured routes
        assert _call(p, "GET", "/v1/health")[1]["status"] == "healthy"
        pair = _call(p, "POST", "/v1/auth/token",
                     {"api_key": "api", "secret": "sec"})[1]
        tok = pair["access_token"]
        assert _call(p, "GET", "/v1/tables", token=tok)[1]["tables"] == []
        pair2 = _call(p, "POST", "/v1/auth/refresh",
                      {"refresh_token": pair["refresh_token"]})[1]
        assert pair2["access_token"] != tok
        _call(p, "DELETE", "/v1/auth/token", {"token": tok})
        with pytest.raises(urllib.error.HTTPError) as ei:
            _call(p, "GET", "/v1/tables", token=tok)
        assert ei.value.code == 401
        # bad credentials → 401
        with pytest.raises(urllib.error.HTTPError) as ei:
            _call(p, "POST", "/v1/auth/token", {"api_key": "api", "secret": "no"})
        assert ei.value.code == 401
    finally:
        srv.shutdown()


def test_rest_unknown_route_404(server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _call(server.port, "GET", "/v1/nope")
    assert ei.value.code == 404


def test_rest_malformed_token_is_401(engine):
    svc = MiniODBService(engine, auth=TokenManager("k", {"api": "sec"}))
    srv = RestServer(svc).serve_background()
    try:
        for bad in ("not-a-jwt", "a.b.c", "x.!!!notb64!!!.y"):
            with pytest.raises(urllib.error.HTTPError) as ei:
                _call(srv.port, "GET", "/v1/tables", token=bad)
            assert ei.value.code == 401, bad
    finally:
        srv.shutdown()


def test_rest_client_error_400_server_error_500(server):
    p = server.port
    # gate violation (client's fault) → 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _call(p, "POST", "/v1/query", {"sql": "DROP TABLE users"})
    assert ei.value.code == 400
    # server-side failure → 500, not 400
    def boom():
        raise RuntimeError("spark cluster on fire")
    server.service.get_status = boom
    with pytest.raises(urllib.error.HTTPError) as ei:
        _call(p, "GET", "/v1/status")
    assert ei.value.code == 500


def test_rest_rate_limit_is_per_client(engine):
    """One client's burst must not 429 the others (reference keys its
    smart limiter per client; SmartRateLimiter already does — the
    transport has to hand it a real identity, the token subject)."""
    from miniodb_spark.ratelimit import (
        PathRateLimit, RateLimitTier, SmartRateLimiter, SmartRateLimiterConfig,
    )

    cfg = SmartRateLimiterConfig(
        tiers=[RateLimitTier("tiny", 1.0, 3, backoff_s=5.0)],
        path_limits=[PathRateLimit("*", "tiny")],
        default_tier="tiny",
    )
    svc = MiniODBService(
        engine,
        auth=TokenManager("k", {"alice": "s1", "bob": "s2"}),
        rate_limiter=SmartRateLimiter(cfg),
    )
    srv = RestServer(svc).serve_background()
    p = srv.port
    try:
        tok_a = _call(p, "POST", "/v1/auth/token",
                      {"api_key": "alice", "secret": "s1"})[1]["access_token"]
        tok_b = _call(p, "POST", "/v1/auth/token",
                      {"api_key": "bob", "secret": "s2"})[1]["access_token"]
        _call(p, "POST", "/v1/data", {
            "table": "rl",
            "record": {"id": "r1", "timestamp": T0, "payload": {"v": 1}},
        }, token=tok_a)
        q = {"sql": "SELECT id FROM rl"}
        # alice burns her burst of 3 and gets 429'd
        with pytest.raises(urllib.error.HTTPError) as ei:
            for _ in range(10):
                _call(p, "POST", "/v1/query", q, token=tok_a)
        assert ei.value.code == 429
        assert ei.value.headers.get("Retry-After") is not None
        # bob is unaffected
        assert _call(p, "POST", "/v1/query", q, token=tok_b)[0] == 200
    finally:
        srv.shutdown()


def test_dashboard_static_serving(engine, tmp_path):
    """Static dashboard UI serving (reference
    internal/dashboard/server.go serves its embedded dashboard-ui):
    index fallback, content types, and path-traversal rejection. The
    JSON data routes under /v1/dashboard/* stay auth-gated; the static
    assets are an open route like the reference's."""
    ui = tmp_path / "ui"
    (ui / "assets").mkdir(parents=True)
    (ui / "index.html").write_text("<html>dash</html>")
    (ui / "assets" / "app.js").write_text("console.log(1)")
    (tmp_path / "secret.txt").write_text("nope")

    srv = RestServer(MiniODBService(engine), static_dir=str(ui)).serve_background()
    try:
        p = srv.port
        code, body = _call(p, "GET", "/dashboard")
        assert (code, body) == (200, "<html>dash</html>")
        assert _call(p, "GET", "/dashboard/")[1] == "<html>dash</html>"
        assert _call(p, "GET", "/dashboard/index.html")[1] == "<html>dash</html>"
        req = urllib.request.Request(f"http://127.0.0.1:{p}/dashboard/assets/app.js")
        with urllib.request.urlopen(req, timeout=30) as resp:
            assert resp.headers["Content-Type"] == "text/javascript"
            assert resp.read() == b"console.log(1)"
        # traversal out of the static root is a 404, never a file read
        with pytest.raises(urllib.error.HTTPError) as ei:
            _call(p, "GET", "/dashboard/%2e%2e/secret.txt")
        assert ei.value.code == 404
        with pytest.raises(urllib.error.HTTPError) as ei:
            _call(p, "GET", "/dashboard/missing.js")
        assert ei.value.code == 404
    finally:
        srv.shutdown()


def test_dashboard_static_unconfigured_404(server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _call(server.port, "GET", "/dashboard")
    assert ei.value.code == 404


def test_rest_bulk_merge(server):
    """POST /v1/data/merge: bulk SCD1 upsert over the wire — existing
    key replaced, new key inserted, one version per key."""
    p = server.port
    _call(p, "POST", "/v1/tables", {"name": "mg", "config": {"buffer_size": 10}})
    _call(p, "POST", "/v1/stream/write", {
        "table": "mg",
        "records": [{"id": f"m{i}", "timestamp_us": T0, "payload": {"v": i}}
                    for i in range(4)]})
    code, out = _call(p, "POST", "/v1/data/merge", {
        "table": "mg",
        "records": [
            {"id": "m1", "timestamp_us": T0, "payload": {"v": 11}},
            {"id": "new", "timestamp_us": T0, "payload": {"v": 99}},
        ]})
    assert code == 200 and out["inserted"] == 2 and out["replaced"] == 1
    rows = json.loads(_call(p, "POST", "/v1/query", {
        "sql": "SELECT id, v FROM mg ORDER BY id"})[1]["result_json"])
    assert {r["id"]: r["v"] for r in rows} == {
        "m0": 0, "m1": 11, "m2": 2, "m3": 3, "new": 99}
    assert len(rows) == 5


def test_rest_get_record_zonemap_lookup(server, engine):
    p = server.port
    for i in range(4):
        _call(p, "POST", "/v1/data", {
            "table": "zr",
            "record": {"id": f"k{i}", "timestamp": T0 + i * 86_400 * US,
                       "payload": {"v": i}}})
    engine.flush("zr")
    st, out = _call(p, "GET", "/v1/tables/zr/records/k2")
    assert st == 200 and out["success"] is True
    rows = json.loads(out["rows"])
    assert len(rows) == 1 and rows[0]["id"] == "k2" and rows[0]["v"] == 2
    assert out["files_scanned"] <= out["files_total"]
    assert out["files_scanned"] >= 1
    # miss returns empty rows, not an error
    st, out = _call(p, "GET", "/v1/tables/zr/records/absent")
    assert st == 200 and json.loads(out["rows"]) == []
