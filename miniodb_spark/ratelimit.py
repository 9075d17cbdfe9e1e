"""QPS protection: token-bucket smart rate limiter.

Parity target: /root/reference/internal/security/smart_rate_limiter.go
(+ grpc_smart_rate_limiter.go) — a token bucket per (client, path
rule), named tiers (requests/sec + burst + backoff on violation),
path-pattern → tier routing, idle-client cleanup. The gRPC transport
enforces it per RPC; here the facade enforces it per call
(``MiniODBService`` with a limiter configured).
"""

from __future__ import annotations

import fnmatch
import threading
import time
from dataclasses import dataclass, field


class RateLimitExceeded(Exception):
    def __init__(self, retry_after_s: float):
        super().__init__(f"rate limit exceeded; retry after {retry_after_s:.2f}s")
        self.retry_after_s = retry_after_s


class TokenBucket:
    """Classic token bucket (smart_rate_limiter.go:40-106): starts full,
    refills continuously at ``refill_rate`` tokens/s up to ``capacity``."""

    def __init__(self, capacity: int, refill_rate: float,
                 clock=time.monotonic):
        self.capacity = capacity
        self.refill_rate = refill_rate
        self._tokens = float(capacity)
        self._clock = clock
        self._last = clock()
        self._lock = threading.Lock()

    def _refill(self) -> None:
        now = self._clock()
        self._tokens = min(
            float(self.capacity), self._tokens + (now - self._last) * self.refill_rate
        )
        self._last = now

    def try_consume(self, tokens: int = 1) -> bool:
        with self._lock:
            self._refill()
            if self._tokens >= tokens:
                self._tokens -= tokens
                return True
            return False

    def wait_time_s(self, tokens: int = 1) -> float:
        with self._lock:
            self._refill()
            deficit = tokens - self._tokens
            return max(0.0, deficit / self.refill_rate)


@dataclass
class RateLimitTier:
    name: str
    requests_per_sec: float
    burst_size: int
    backoff_s: float = 0.0  # extra lockout after a violation


@dataclass
class PathRateLimit:
    pattern: str  # fnmatch-style, e.g. "query*" or "*"
    tier: str
    enabled: bool = True


# the reference ships a default 3-tier config (smart_rate_limiter.go:181-205)
DEFAULT_TIERS = [
    RateLimitTier("premium", 100.0, 200, backoff_s=0.5),
    RateLimitTier("standard", 50.0, 100, backoff_s=1.0),
    RateLimitTier("basic", 20.0, 60, backoff_s=2.0),
]
DEFAULT_PATH_LIMITS = [
    PathRateLimit("stream_*", "premium"),
    PathRateLimit("query*", "standard"),
    PathRateLimit("*", "standard"),
]


@dataclass
class SmartRateLimiterConfig:
    enabled: bool = True
    default_tier: str = "standard"
    tiers: list[RateLimitTier] = field(default_factory=lambda: list(DEFAULT_TIERS))
    path_limits: list[PathRateLimit] = field(
        default_factory=lambda: list(DEFAULT_PATH_LIMITS)
    )
    idle_cleanup_s: float = 300.0


class SmartRateLimiter:
    """Per-client × path-rule token buckets (reference
    smart_rate_limiter.go). ``budget_divisor`` supports multi-driver
    serving by static budget splitting: a callable returning the live
    driver count (see ``kv.DriverRegistry``) — each driver enforces
    rate/N and burst/N locally, so N drivers jointly respect the
    configured global budget with zero per-request coordination IO
    (the reference pays a Redis round-trip per request instead). The
    divisor is re-read lazily every ``divisor_refresh_s``; buckets are
    rebuilt when it changes (a brief refill reset, acceptable at a
    membership-change boundary)."""

    def __init__(self, config: SmartRateLimiterConfig | None = None,
                 clock=time.monotonic, budget_divisor=None,
                 divisor_refresh_s: float = 10.0):
        self.config = config or SmartRateLimiterConfig()
        self._clock = clock
        self._tiers = {t.name: t for t in self.config.tiers}
        # (client, tier) -> (bucket, last_seen, backoff_until, divisor)
        self._clients: dict[tuple[str, str], list] = {}
        self._lock = threading.Lock()
        self.denied = 0
        self.allowed = 0
        self._budget_divisor = budget_divisor
        self._divisor_refresh_s = divisor_refresh_s
        self._divisor_cache: tuple[float, int] | None = None

    def _divisor(self, now: float) -> int:
        if self._budget_divisor is None:
            return 1
        if (self._divisor_cache is not None
                and now - self._divisor_cache[0] < self._divisor_refresh_s):
            return self._divisor_cache[1]
        d = max(1, int(self._budget_divisor()))
        self._divisor_cache = (now, d)
        return d

    def _tier_for(self, path: str) -> tuple[RateLimitTier, str]:
        """(tier, matched pattern) — buckets are per (client, path rule),
        like the reference's per-client path-rule state, so e.g. writes
        and queries never drain each other's budget even when both
        resolve to the same tier."""
        for rule in self.config.path_limits:
            if rule.enabled and fnmatch.fnmatch(path, rule.pattern):
                return self._tiers[rule.tier], rule.pattern
        return self._tiers[self.config.default_tier], "<default>"

    def check(self, client_id: str, path: str) -> None:
        """Raise :class:`RateLimitExceeded` when the client is over its
        tier's budget for this path family; otherwise consume one token."""
        if not self.config.enabled:
            return
        tier, pattern = self._tier_for(path)
        now = self._clock()
        # resolve the divisor OUTSIDE the lock: refreshing it may hit
        # the coordination store (list + read per driver — multiple
        # object-store round-trips), and holding the global lock through
        # that would stall every concurrent request once per refresh
        div = self._divisor(now)
        with self._lock:
            self._cleanup(now)
            key = (client_id, pattern)
            state = self._clients.get(key)
            if state is None or state[3] != div:
                # membership change rebuilds the bucket (brief refill
                # reset) but MUST carry the backoff forward — an abusive
                # client under penalty would otherwise burst again the
                # moment a driver joins or leaves
                prior_backoff = state[2] if state is not None else 0.0
                state = [
                    TokenBucket(max(1, tier.burst_size // div),
                                tier.requests_per_sec / div,
                                clock=self._clock),
                    now,
                    prior_backoff,
                    div,
                ]
                self._clients[key] = state
            bucket, _, backoff_until, _ = state
            state[1] = now
            if now < backoff_until:
                self.denied += 1
                raise RateLimitExceeded(backoff_until - now)
            if not bucket.try_consume(1):
                state[2] = now + tier.backoff_s
                self.denied += 1
                raise RateLimitExceeded(
                    max(bucket.wait_time_s(1), tier.backoff_s)
                )
            self.allowed += 1

    def _cleanup(self, now: float) -> None:
        idle = self.config.idle_cleanup_s
        dead = [k for k, st in self._clients.items() if now - st[1] > idle]
        for k in dead:
            del self._clients[k]

    def stats(self) -> dict:
        with self._lock:
            return {
                "allowed": self.allowed,
                "denied": self.denied,
                "active_clients": len(self._clients),
            }
