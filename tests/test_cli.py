"""CLI entry points (python -m miniodb_spark ...): query/explain/serve
wiring over a live engine (getOrCreate reuses the test session)."""

import json
import urllib.request

from miniodb_spark.__main__ import main
from miniodb_spark.engine import Engine

US = 1_000_000
T0 = 1_700_000_000 * US


def _seed(spark, root):
    eng = Engine(spark, root)
    eng.write("users", {"age": 30}, record_id="u1", timestamp_us=T0)
    eng.flush()


def test_cli_query_and_explain(spark, tmp_path, capsys):
    root = str(tmp_path / "cli")
    _seed(spark, root)
    assert main(["query", "--root", root, "SELECT id, age FROM users"]) == 0
    out = capsys.readouterr().out.strip()
    assert json.loads(out) == [{"id": "u1", "age": 30}]
    assert main(["explain", "--root", root,
                 "SELECT id FROM users WHERE age > 20"]) == 0
    plan = capsys.readouterr().out
    assert "PushedFilters" in plan and "GreaterThan(age,20)" in plan


def test_cli_serve_wiring(spark, tmp_path):
    # drive the same construction serve uses, without blocking on
    # serve_forever: auth + limiter + RestServer wiring
    from miniodb_spark.api import MiniODBService
    from miniodb_spark.auth import TokenManager
    from miniodb_spark.ratelimit import SmartRateLimiter
    from miniodb_spark.rest import RestServer

    root = str(tmp_path / "cli2")
    _seed(spark, root)
    svc = MiniODBService(Engine(spark, root),
                         auth=TokenManager("s", {"k": "sec"}),
                         rate_limiter=SmartRateLimiter())
    srv = RestServer(svc).serve_background()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/auth/token", method="POST",
            data=json.dumps({"api_key": "k", "secret": "sec"}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=30) as r:
            tok = json.loads(r.read())["access_token"]
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/query", method="POST",
            data=json.dumps({"sql": "SELECT id FROM users"}).encode(),
            headers={"Content-Type": "application/json",
                     "Authorization": f"Bearer {tok}"})
        with urllib.request.urlopen(req, timeout=30) as r:
            body = json.loads(r.read())
        assert json.loads(body["result_json"]) == [{"id": "u1"}]
    finally:
        srv.shutdown()
