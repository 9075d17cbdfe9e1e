"""Runnable entry points — the reference ships server/client binaries
(cmd/server, cmd/client); this is the Spark-native equivalent:

    python -m miniodb_spark serve  --root /data/store --port 8080
    python -m miniodb_spark query  --root /data/store "SELECT ..."
    python -m miniodb_spark explain --root /data/store "SELECT ..."

`serve` exposes the reference's /v1 REST contract (rest.py); pass
``--api-key KEY:SECRET`` (repeatable) to enforce JWT auth,
``--rate-limit`` to enable the default tiered limiter, and
``--grpc-port PORT`` to additionally serve the miniodb.v1 gRPC surface
(grpc_server.py; requires grpcio).
"""

from __future__ import annotations

import argparse
import sys


def _engine(args):
    from .engine import Engine
    from .session import get_spark

    spark = get_spark("miniodb_spark_cli", cpus=args.cpus)
    return Engine(spark, args.root)


def cmd_serve(args) -> int:
    from .api import MiniODBService
    from .rest import RestServer

    auth = None
    if args.api_key:
        from .auth import TokenManager

        keys = dict(kv.split(":", 1) for kv in args.api_key)
        auth = TokenManager(args.signing_secret or "change-me", keys)
    engine = _engine(args)
    limiter = None
    if args.rate_limit:
        from .ratelimit import SmartRateLimiter

        divisor = None
        if args.shared_limits:
            # multi-driver budget splitting: heartbeat into the store's
            # driver registry and enforce rate/N locally (kv.py)
            import threading
            import uuid as _uuid

            from . import fs as fsmod
            from .kv import DriverRegistry, FileKV

            reg = DriverRegistry(
                FileKV(engine.fs, fsmod.join(args.root, "_meta", "drivers")),
                _uuid.uuid4().hex[:12],
            )
            reg.heartbeat()

            def _beat():
                import time as _t

                while True:
                    _t.sleep(reg.heartbeat_interval_s())
                    try:
                        reg.heartbeat()
                    except Exception:
                        # a transient store error must not kill the
                        # thread: a silently-dead heartbeat ages this
                        # driver out while it keeps serving, and the
                        # fleet then jointly exceeds the global budget
                        pass

            threading.Thread(target=_beat, daemon=True).start()
            divisor = reg.active_count
        limiter = SmartRateLimiter(budget_divisor=divisor)
    audit_log = None
    if args.audit_log:
        from .audit import AuditLogger

        audit_log = AuditLogger(args.audit_log)
    svc = MiniODBService(engine, auth=auth, rate_limiter=limiter,
                         audit=audit_log)
    grpc_srv = None
    if args.grpc_port is not None:
        from .grpc_server import GrpcServer  # raises if grpcio missing

        grpc_srv = GrpcServer(svc, host=args.host,
                              port=args.grpc_port).serve_background()
        print(f"miniodb_spark gRPC serving on {args.host}:{grpc_srv.port}",
              flush=True)
    srv = RestServer(svc, host=args.host, port=args.port)
    print(f"miniodb_spark REST serving on http://{args.host}:{srv.port}/v1", flush=True)
    try:
        srv.httpd.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()
        if grpc_srv is not None:
            grpc_srv.shutdown()
    return 0


def cmd_query(args) -> int:
    eng = _engine(args)
    print(eng.query(args.sql, limit=args.limit))
    return 0


def cmd_explain(args) -> int:
    eng = _engine(args)
    print(eng.explain(args.sql))
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="miniodb_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--root", required=True, help="engine storage root (local path or s3a:// URI)")
        p.add_argument("--cpus", default=None, help="local[] core count (default $SPARK_GRAFT_CPUS)")

    p = sub.add_parser("serve", help="serve the /v1 REST contract")
    common(p)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--api-key", action="append", default=[],
                   metavar="KEY:SECRET", help="enable JWT auth (repeatable)")
    p.add_argument("--signing-secret", default=None)
    p.add_argument("--rate-limit", action="store_true")
    p.add_argument("--shared-limits", action="store_true",
                   help="with --rate-limit: split budgets across the live "
                        "serve processes on this store root (heartbeat "
                        "registry; each driver enforces rate/N)")
    p.add_argument("--audit-log", default=None, metavar="PATH",
                   help="enable per-RPC audit logging to this JSONL file "
                        "(served back over GET /v1/audit)")
    p.add_argument("--grpc-port", type=int, default=None, metavar="PORT",
                   help="also serve the miniodb.v1 gRPC surface "
                        "(requires grpcio)")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("query", help="run one gated SQL query, print JSON")
    common(p)
    p.add_argument("sql")
    p.add_argument("--limit", type=int, default=None)
    p.set_defaults(fn=cmd_query)

    p = sub.add_parser("explain", help="print the formatted physical plan")
    common(p)
    p.add_argument("sql")
    p.set_defaults(fn=cmd_explain)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
