"""AuthService: HS256 JWT issue / refresh / revoke + request interceptor.

Parity target: the reference's AuthService RPCs (miniodb.proto:42-46 —
GetToken/RefreshToken/RevokeToken) and its JWT manager
(/root/reference/internal/security/jwt_manager.go: HS256 HMAC signing,
subject + expiry claims, validate-on-every-RPC via interceptors,
internal/security/interceptor.go). Implemented with the Python stdlib
only (hmac/hashlib/base64/json) — JWT RFC 7519 is public knowledge;
no external jwt dependency is needed for HS256.

Revocation is a jti blacklist held until the token's own expiry (the
reference's token_manager keeps a denylist the same way); refresh
rotates both tokens and revokes the used refresh token so a stolen
refresh token can be replayed at most once.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import secrets as _secrets
import threading
import time
from typing import Any


class AuthError(Exception):
    pass


def _b64url(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode("ascii")


def _b64url_decode(s: str) -> bytes:
    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))


def _sign(secret: bytes, signing_input: bytes) -> bytes:
    return hmac.new(secret, signing_input, hashlib.sha256).digest()


def encode_jwt(claims: dict[str, Any], secret: str) -> str:
    header = {"alg": "HS256", "typ": "JWT"}
    signing_input = (
        _b64url(json.dumps(header, separators=(",", ":")).encode())
        + "."
        + _b64url(json.dumps(claims, separators=(",", ":")).encode())
    ).encode("ascii")
    sig = _sign(secret.encode(), signing_input)
    return signing_input.decode("ascii") + "." + _b64url(sig)


def decode_jwt(token: str, secret: str) -> dict[str, Any]:
    """Verify signature + expiry; returns claims. Raises AuthError."""
    try:
        header_b64, claims_b64, sig_b64 = token.split(".")
        header = json.loads(_b64url_decode(header_b64))
    except (ValueError, UnicodeDecodeError) as exc:
        # covers wrong segment count, invalid base64 (binascii.Error is a
        # ValueError), and non-JSON header bytes — all "malformed", never
        # a server error
        raise AuthError(f"malformed token: {type(exc).__name__}") from None
    if header.get("alg") != "HS256":
        raise AuthError(f"unsupported alg: {header.get('alg')}")
    try:
        signing_input = f"{header_b64}.{claims_b64}".encode("ascii")
        expected = _sign(secret.encode(), signing_input)
        sig_ok = hmac.compare_digest(expected, _b64url_decode(sig_b64))
        claims = json.loads(_b64url_decode(claims_b64))
    except (ValueError, UnicodeDecodeError, UnicodeEncodeError) as exc:
        # non-ASCII segment bytes hit the encode; still "malformed",
        # never a server error
        raise AuthError(f"malformed token: {type(exc).__name__}") from None
    if not sig_ok:
        raise AuthError("bad signature")
    if claims.get("exp") is not None and time.time() >= claims["exp"]:
        raise AuthError("token expired")
    return claims


class TokenManager:
    """Issue/validate/refresh/revoke JWT pairs against configured API keys.

    ``api_keys`` maps api_key → secret (the reference configures these in
    config.yaml security section). All state (revocation list) is
    in-memory per node — like the reference's token manager."""

    def __init__(
        self,
        signing_secret: str,
        api_keys: dict[str, str] | None = None,
        access_ttl_s: int = 3600,
        refresh_ttl_s: int = 7 * 86400,
    ):
        self.signing_secret = signing_secret
        self.api_keys = dict(api_keys or {})
        self.access_ttl_s = access_ttl_s
        self.refresh_ttl_s = refresh_ttl_s
        self._revoked: dict[str, float] = {}  # jti -> exp epoch
        self._lock = threading.Lock()

    # -- issue -----------------------------------------------------------

    def _pair(self, subject: str) -> dict[str, Any]:
        now = int(time.time())
        access = encode_jwt(
            {"sub": subject, "iat": now, "exp": now + self.access_ttl_s,
             "jti": _secrets.token_hex(8), "typ": "access"},
            self.signing_secret,
        )
        refresh = encode_jwt(
            {"sub": subject, "iat": now, "exp": now + self.refresh_ttl_s,
             "jti": _secrets.token_hex(8), "typ": "refresh"},
            self.signing_secret,
        )
        return {
            "access_token": access,
            "refresh_token": refresh,
            "expires_in": self.access_ttl_s,
            "token_type": "Bearer",
        }

    def get_token(self, api_key: str, secret: str) -> dict[str, Any]:
        """GetToken RPC (miniodb.proto:379-390)."""
        expected = self.api_keys.get(api_key)
        if expected is None or not hmac.compare_digest(expected, secret):
            raise AuthError("invalid api key or secret")
        return self._pair(api_key)

    # -- validate / refresh / revoke -------------------------------------

    def _gc_revoked(self, now: float) -> None:
        dead = [j for j, exp in self._revoked.items() if exp <= now]
        for j in dead:
            del self._revoked[j]

    def validate(self, token: str, expect_typ: str = "access") -> dict[str, Any]:
        claims = decode_jwt(token, self.signing_secret)
        if claims.get("typ") != expect_typ:
            raise AuthError(f"expected {expect_typ} token")
        with self._lock:
            self._gc_revoked(time.time())
            if claims.get("jti") in self._revoked:
                raise AuthError("token revoked")
        return claims

    def refresh(self, refresh_token: str) -> dict[str, Any]:
        """RefreshToken RPC (miniodb.proto:392-403): rotates the pair and
        revokes the used refresh token (single-use)."""
        claims = self.validate(refresh_token, expect_typ="refresh")
        self.revoke(refresh_token)
        return self._pair(claims["sub"])

    def revoke(self, token: str) -> bool:
        """RevokeToken RPC (miniodb.proto:405-414): blacklists the jti
        until the token's own expiry (either token type)."""
        claims = decode_jwt(token, self.signing_secret)
        with self._lock:
            self._revoked[claims.get("jti", "")] = float(claims.get("exp") or
                                                         time.time() + 86400)
        return True


class AuthInterceptor:
    """Transport-style interceptor over the service facade, mirroring the
    reference's per-RPC enforcement (internal/security/interceptor.go):
    every call must carry a valid, unrevoked access token, except the
    allowlisted methods (health check + the auth RPCs themselves)."""

    SKIP = frozenset({"health_check", "get_token", "refresh_token", "revoke_token"})

    def __init__(self, service, tokens: TokenManager):
        self.service = service
        self.tokens = tokens

    def call(self, method: str, *args, token: str | None = None, **kwargs):
        if method not in self.SKIP:
            if not token:
                raise AuthError("missing access token")
            self.tokens.validate(token)
        return getattr(self.service, method)(*args, **kwargs)
