"""Metrics registry, health rollup, and the smart rate limiter."""

import pytest

from miniodb_spark.api import MiniODBService
from miniodb_spark.monitoring import HealthChecker, MetricsRegistry
from miniodb_spark.ratelimit import (
    PathRateLimit,
    RateLimitExceeded,
    RateLimitTier,
    SmartRateLimiter,
    SmartRateLimiterConfig,
    TokenBucket,
)

US = 1_000_000
T0 = 1_700_000_000 * US


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def test_token_bucket_refill():
    clk = FakeClock()
    b = TokenBucket(capacity=2, refill_rate=1.0, clock=clk)
    assert b.try_consume() and b.try_consume()
    assert not b.try_consume()          # empty
    assert b.wait_time_s() == pytest.approx(1.0)
    clk.t = 1.5                         # 1.5 tokens refilled
    assert b.try_consume()
    assert not b.try_consume()          # 0.5 left
    clk.t = 100.0
    assert b.try_consume() and b.try_consume()  # capped at capacity
    assert not b.try_consume()


def test_smart_limiter_tiers_and_backoff():
    clk = FakeClock()
    cfg = SmartRateLimiterConfig(
        tiers=[RateLimitTier("tiny", requests_per_sec=1.0, burst_size=2,
                             backoff_s=5.0)],
        path_limits=[PathRateLimit("*", "tiny")],
        default_tier="tiny",
    )
    rl = SmartRateLimiter(cfg, clock=clk)
    rl.check("c1", "query_data")
    rl.check("c1", "query_data")
    with pytest.raises(RateLimitExceeded) as ei:
        rl.check("c1", "query_data")
    assert ei.value.retry_after_s >= 1.0
    # backoff: even after tokens refill, the violator waits out backoff_s
    clk.t = 2.0
    with pytest.raises(RateLimitExceeded):
        rl.check("c1", "query_data")
    clk.t = 6.0
    rl.check("c1", "query_data")
    # other clients are unaffected throughout
    rl.check("c2", "query_data")
    assert rl.stats()["denied"] == 2


def test_metrics_registry_and_exposition():
    reg = MetricsRegistry()
    reg.counter("reqs", "requests").inc(method="query")
    reg.counter("reqs").inc(method="query")
    reg.counter("reqs").inc(method="write")
    reg.gauge("buffered").set(42.0)
    h = reg.histogram("lat", "latency")
    for v in (0.003, 0.02, 0.02, 4.0):
        h.observe(v)
    text = reg.expose_text()
    assert 'reqs{method="query"} 2.0' in text
    assert "buffered 42.0" in text
    assert 'lat_bucket{le="0.005"} 1' in text and "lat_count 4" in text
    snap = reg.snapshot()
    assert snap["lat"]["count"] == 4 and snap["lat"]["p50"] == 0.025
    assert snap["reqs"]['{method="write"}'] == 1.0


def test_health_rollup_and_rpc_instrumentation(engine):
    from miniodb_spark.auth import AuthError  # noqa: F401 (import check)

    svc = MiniODBService(engine)
    h = svc.health_detail()
    assert h["status"] == "healthy"
    assert set(h["components"]) == {"spark", "storage", "catalog", "buffers"}
    assert all(c["status"] == "up" for c in h["components"].values())
    assert svc.health.is_ready() and svc.health.is_live()

    svc.write_data("m", {"payload": {"v": 1}, "timestamp": T0, "id": "a"})
    svc.query_data("SELECT id FROM m")
    metrics = svc.get_metrics()
    assert metrics["registry"]["rpc_requests_total"]['{method="query_data"}'] == 1.0
    assert metrics["registry"]["rpc_latency_seconds"]["count"] == 2
    assert metrics["query_stats"]["count"] == 1
    assert "rpc_requests_total" in svc.get_metrics_text()


def test_rate_limited_facade(engine):
    clk = FakeClock()
    cfg = SmartRateLimiterConfig(
        tiers=[RateLimitTier("one", requests_per_sec=0.1, burst_size=1,
                             backoff_s=0.0)],
        path_limits=[PathRateLimit("query*", "one")],
        default_tier="one",
    )
    svc = MiniODBService(engine, rate_limiter=SmartRateLimiter(cfg, clock=clk))
    svc.write_data("rl", {"payload": {"v": 1}, "timestamp": T0, "id": "a"})
    svc.query_data("SELECT id FROM rl")
    with pytest.raises(RateLimitExceeded):
        svc.query_data("SELECT id FROM rl")
    assert svc.rate_limiter.stats()["denied"] == 1


def test_budget_splitting_across_drivers(tmp_path):
    """Multi-driver rate limiting by static budget splitting: with two
    live heartbeats on one root, each limiter enforces half the global
    budget — N drivers jointly respect the configured rate with zero
    per-request coordination IO."""
    import pytest as _pytest

    from miniodb_spark.fs import LocalFS
    from miniodb_spark.kv import DriverRegistry, FileKV
    from miniodb_spark.ratelimit import (
        PathRateLimit, RateLimitExceeded, RateLimitTier,
        SmartRateLimiter, SmartRateLimiterConfig,
    )

    kv = FileKV(LocalFS(), str(tmp_path / "coord"))
    reg_a = DriverRegistry(kv, "a")
    reg_b = DriverRegistry(kv, "b")
    reg_a.heartbeat()
    assert reg_a.active_count() == 1
    reg_b.heartbeat()
    assert reg_a.active_count() == 2
    assert reg_a.active_ids() == ["a", "b"]

    cfg = SmartRateLimiterConfig(
        tiers=[RateLimitTier("t", 1.0, 8, backoff_s=60.0)],
        path_limits=[PathRateLimit("*", "t")],
        default_tier="t",
    )
    t = [0.0]
    lim = SmartRateLimiter(cfg, clock=lambda: t[0],
                           budget_divisor=reg_a.active_count)
    # global burst 8, two drivers -> this driver admits exactly 4
    for _ in range(4):
        lim.check("c", "query_data")
    with _pytest.raises(RateLimitExceeded):
        lim.check("c", "query_data")

    # driver b ages out -> full budget returns after the divisor refresh
    reg_b.ttl_s = 0.0
    stale = DriverRegistry(kv, "a", ttl_s=-1.0)  # everything stale
    lim2 = SmartRateLimiter(cfg, clock=lambda: t[0],
                            budget_divisor=stale.active_count)
    for _ in range(8):
        lim2.check("c", "query_data")
    with _pytest.raises(RateLimitExceeded):
        lim2.check("c", "query_data")


def test_driver_registry_jitter_and_skew_tolerance(tmp_path):
    """Heartbeat jitter is deterministic per driver id and spreads the
    fleet's beat phases (no stat-storm lockstep); liveness tolerates
    realistic cross-host clock skew (5 s ≪ the 30 s TTL)."""
    import time as _time

    from miniodb_spark.fs import LocalFS
    from miniodb_spark.kv import DriverRegistry, FileKV

    kv = FileKV(LocalFS(), str(tmp_path / "coord"))

    # deterministic: same id -> same interval across restarts
    r1 = DriverRegistry(kv, "driver-one")
    r1b = DriverRegistry(kv, "driver-one")
    assert r1.heartbeat_interval_s() == r1b.heartbeat_interval_s()
    # bounded: within ±10% of ttl/3
    base = r1.ttl_s / 3
    ivals = [DriverRegistry(kv, f"d{i}").heartbeat_interval_s()
             for i in range(40)]
    assert all(base * 0.9 <= v <= base * 1.1 for v in ivals)
    # spread: 40 drivers don't all share one phase
    assert len({round(v, 3) for v in ivals}) > 10
    # custom base period honors the same jitter
    assert abs(r1.heartbeat_interval_s(10.0) - 10.0) <= 1.0

    # clock skew: a heartbeat stamped 5 s in the past (writer's clock
    # behind the reader's) still counts as live at ttl_s=30
    skewed = DriverRegistry(kv, "skewed", ttl_s=30.0)
    kv.put("driver.skewed", repr(_time.time() - 5.0).encode())
    assert "skewed" in skewed.active_ids()
    # a heartbeat from a clock AHEAD of the reader is also live (the
    # age test is one-sided; future stamps read as age<0 <= ttl)
    kv.put("driver.ahead", repr(_time.time() + 5.0).encode())
    assert "ahead" in skewed.active_ids()
    # beyond-TTL skew ages out, as documented
    kv.put("driver.dead", repr(_time.time() - 31.0).encode())
    assert "dead" not in skewed.active_ids()
