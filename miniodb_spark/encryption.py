"""Field-level encryption: encrypt at ingest, decrypt at result time.

Parity target: /root/reference/internal/security/field_encryption.go
(payload fields encrypted on write, decrypted per row when results are
rendered — ingest.go:43-53, query/query.go:741-751). SURVEY marks this
"out of engine scope; optional UDF pair" — this is that pair.

Spark-side: built-in ``aes_encrypt``/``aes_decrypt`` (JVM, GCM mode)
when available, exposed as column functions plus engine-level helpers
that encrypt configured fields before buffering and decrypt them in
rendered results. Randomized GCM IVs mean ciphertexts are not
equality-comparable — encrypted columns are opaque blobs to SQL, same
as the reference.
"""

from __future__ import annotations

import base64
import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def _key_32(key: str) -> bytes:
    return hashlib.sha256(key.encode("utf-8")).digest()


def encrypt_col(col: str | Column, key: str) -> Column:
    """AES-GCM encrypt a string column → base64 string."""
    c = F.col(col) if isinstance(col, str) else col
    return F.base64(
        F.aes_encrypt(c.cast("binary"), F.lit(_key_32(key)), F.lit("GCM"))
    )


def decrypt_col(col: str | Column, key: str) -> Column:
    """Inverse of :func:`encrypt_col`."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aes_decrypt(F.unbase64(c), F.lit(_key_32(key)), F.lit("GCM")).cast(
        "string"
    )


class FieldEncryptor:
    """Driver-side encrypt/decrypt for the row-level write path (the
    buffer holds Python dicts, not DataFrames). Uses the same AES-GCM
    via Spark expressions would be a JVM round-trip per row; instead a
    deterministic-IV-free python fallback is used: values are sealed
    with AES when the ``cryptography`` package exists, else with an
    HMAC-keystream construction (clearly marked, not for production)."""

    def __init__(self, key: str, fields: set[str]):
        self.fields = set(fields)
        self._key = _key_32(key)
        try:  # optional dependency
            from cryptography.hazmat.primitives.ciphers.aead import AESGCM  # noqa: F401

            self._aes = True
        except ImportError:
            self._aes = False

    # -- python-side seal/open ------------------------------------------

    def _seal(self, plaintext: str) -> str:
        import os as _os

        nonce = _os.urandom(12)
        if self._aes:
            from cryptography.hazmat.primitives.ciphers.aead import AESGCM

            ct = AESGCM(self._key).encrypt(nonce, plaintext.encode("utf-8"), None)
        else:
            data = plaintext.encode("utf-8")
            stream = self._keystream(nonce, len(data))
            body = bytes(a ^ b for a, b in zip(data, stream))
            mac = hashlib.sha256(self._key + nonce + body).digest()[:16]
            ct = body + mac
        return "enc:" + base64.b64encode(nonce + ct).decode("ascii")

    def _open(self, sealed: str) -> str:
        raw = base64.b64decode(sealed[4:])
        nonce, ct = raw[:12], raw[12:]
        if self._aes:
            from cryptography.hazmat.primitives.ciphers.aead import AESGCM

            return AESGCM(self._key).decrypt(nonce, ct, None).decode("utf-8")
        body, mac = ct[:-16], ct[-16:]
        if hashlib.sha256(self._key + nonce + body).digest()[:16] != mac:
            raise ValueError("field decryption failed: bad MAC")
        stream = self._keystream(nonce, len(body))
        return bytes(a ^ b for a, b in zip(body, stream)).decode("utf-8")

    def _keystream(self, nonce: bytes, n: int) -> bytes:
        out = b""
        counter = 0
        while len(out) < n:
            out += hashlib.sha256(self._key + nonce + counter.to_bytes(4, "big")).digest()
            counter += 1
        return out[:n]

    # -- payload hooks -----------------------------------------------------

    def encrypt_payload(self, payload: dict) -> dict:
        return {
            k: self._seal(str(v)) if k in self.fields and v is not None else v
            for k, v in payload.items()
        }

    def decrypt_row(self, row: dict) -> dict:
        return {
            k: self._open(v)
            if k in self.fields and isinstance(v, str) and v.startswith("enc:")
            else v
            for k, v in row.items()
        }
