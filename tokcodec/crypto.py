"""Column encryption — the engine's analogue of Parquet Modular
Encryption (reference C6 exposes the parquet-java knob via
FileEncryptionProperties, CarpetWriter.java:235-238; format spec:
AES-GCM per module, AAD-bound to the module's position).

Model: ONE table key (caller-provided, never stored), a declared
subset of columns to protect. Each selected block payload is
encrypted AFTER the lightweight codec + outer compression
(compress-then-encrypt; ciphertext doesn't compress) with AES-GCM:

    stored payload = 12-byte nonce || ciphertext || 16-byte tag

The AAD binds every block to its exact position
(run_id, bucket, chunk, column, component) — swapping two encrypted
blocks, even within one table, fails authentication (parquet's module
AAD rationale). Block crc32 covers the STORED bytes, so
verify_checksums works without the key.

Metadata redaction (parquet parity): parquet modular encryption
redacts encrypted columns' statistics and encrypts their bloom
filters EVEN in plaintext-footer mode. Likewise here: an encrypted
column's block meta — zone bounds (lo/hi/slo/shi), codec parameters
that embed values (frame-of-reference ``ref``, delta ``first``,
dictionary payload descriptors) — is encrypted wholesale into an
``emeta`` envelope, and its bloom blocks' payloads are encrypted like
any other module (a plaintext bloom allows membership probes). The
stored meta of an encrypted block is exactly
``{"enc":"gcm","emeta":"<b64 nonce||ct||tag>"}``. Zone/bloom pruning
on an encrypted column therefore requires the key (the stats are
decrypted executor-side during planning); without the key a filtered
scan fails fast at plan time. Table manifests and lineage stay
plaintext — they carry byte counts and codec NAMES, never values.

Mode boundary (documented deviation): this is parquet's
PLAINTEXT-FOOTER mode only — there is no encrypted-footer analogue.
A keyless observer of the table directory learns the schema (field
names/types), bucket/chunk/row counts, per-block byte sizes, codec
names, crc32s of stored bytes, epochs/timestamps, and delete-log KEY
FILES' contents when deletes target a plaintext key column (delete
keys on an ENCRYPTED column are refused at delete_encoded for
exactly this reason) — never cell values, bounds, or bloom bits of
encrypted columns. Parquet's encrypted-footer mode additionally
hides schema and layout; users who need that should encrypt the
enclosing filesystem/bucket — sealing the manifest would also seal
it against every engine surface that plans Spark-free (the
DataSource's planner, the driver-side lineage commit), which is the
layout's core latency design.

Nonces are derived deterministically (SP 800-38D §8.2.1
construction): nonce = SHA-256(per-run random salt || AAD ||
purpose)[:12]. Positions are unique within a run (and run_ids unique
within a table — enforced at commit), and the 16-byte salt is fresh
per run, so no (key, nonce) pair ever repeats — removing the 2^32
random-IV birthday cap that long-lived table keys would otherwise hit
across appends, streaming epochs and compactions. The salt is not
secret (nonces never are); it rides in each encrypted block.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import zlib

_ENC_MARK = '"enc":"gcm"'


def _aesgcm(key: bytes):
    try:
        from cryptography.hazmat.primitives.ciphers.aead import AESGCM
    except ImportError as e:  # pragma: no cover - lib is in this env
        raise RuntimeError(
            "column encryption requires the 'cryptography' package"
        ) from e
    return AESGCM(key)


def validate_key(key: bytes) -> None:
    if not isinstance(key, (bytes, bytearray)) or len(key) not in (16, 24, 32):
        raise ValueError(
            "encryption_key must be 16/24/32 bytes (AES-128/192/256)")


def new_run_salt() -> bytes:
    """Fresh per-run salt for deterministic nonce derivation."""
    return os.urandom(16)


def block_aad(row: dict) -> bytes:
    """Module AAD: the block's unique position in the table."""
    return (f"{row['run_id']}|{row['bucket']}|{row['chunk']}|"
            f"{row['column']}|{row['component']}").encode("utf-8")


def _nonce(salt: bytes | None, aad: bytes, purpose: bytes) -> bytes:
    """Deterministic nonce from (salt, position, purpose) — unique by
    construction (see module docstring); random fallback when no salt
    is supplied (unit/legacy callers)."""
    if salt is None:
        return os.urandom(12)
    return hashlib.sha256(salt + b"\x00" + aad + b"\x00" + purpose
                          ).digest()[:12]


def encrypt_block_row(key: bytes, row: dict,
                      salt: bytes | None = None) -> None:
    """In-place: payload -> nonce||ct||tag, the ENTIRE original meta
    -> encrypted ``emeta`` envelope (zone bounds and value-bearing
    codec parameters must not stay public), stored-byte accounting
    (enc_bytes, checksum) updated. Must run AFTER run_id/chunk are
    assigned (they are part of the AAD)."""
    aad = block_aad(row)
    n1 = _nonce(salt, aad, b"payload")
    ct = _aesgcm(key).encrypt(n1, row["payload"], aad)
    row["payload"] = n1 + ct
    n2 = _nonce(salt, aad, b"meta")
    mct = _aesgcm(key).encrypt(n2, row["meta"].encode("utf-8"),
                               aad + b"|meta")
    row["meta"] = json.dumps(
        {"enc": "gcm", "emeta": base64.b64encode(n2 + mct).decode("ascii")},
        separators=(",", ":"))
    row["enc_bytes"] = len(row["payload"])
    row["checksum"] = int(zlib.crc32(row["payload"]))


def is_encrypted(row: dict) -> bool:
    return _ENC_MARK in row["meta"]


def _decrypt_meta(key: bytes, row: dict, meta: dict) -> str:
    buf = base64.b64decode(meta["emeta"])
    return _aesgcm(key).decrypt(buf[:12], buf[12:],
                                block_aad(row) + b"|meta").decode("utf-8")


def decrypt_block_row(key: bytes | None, row: dict) -> None:
    """In-place inverse of encrypt_block_row (payload AND meta).
    Raises with a clear message on a missing key or an authentication
    failure (wrong key OR a block moved from its original position)."""
    if key is None:
        raise ValueError(
            f"column {row['column']!r} is encrypted — pass "
            "encryption_key to read it")
    buf = row["payload"]
    try:
        row["payload"] = _aesgcm(key).decrypt(buf[:12], buf[12:],
                                              block_aad(row))
        meta = json.loads(row["meta"])
        if "emeta" in meta:
            row["meta"] = _decrypt_meta(key, row, meta)
    except ValueError:
        raise
    except Exception as e:
        raise ValueError(
            f"decryption failed for column {row['column']!r} "
            f"(bucket {row['bucket']}, chunk {row['chunk']}): wrong "
            "key, or block bytes moved from their original position"
        ) from e


def decrypt_block_meta(key: bytes | None, row: dict) -> dict:
    """Meta-only decrypt (payload untouched) — the pruning paths use
    this to read an encrypted column's zone bounds without paying for
    a payload decrypt. Plaintext rows pass through unchanged."""
    meta = json.loads(row["meta"])
    if "emeta" not in meta:
        return meta
    if key is None:
        raise ValueError(
            f"column {row['column']!r} has encrypted statistics — pass "
            "encryption_key to filter on it")
    try:
        return json.loads(_decrypt_meta(key, row, meta))
    except ValueError:
        raise
    except Exception as e:
        raise ValueError(
            f"statistics decryption failed for column {row['column']!r} "
            f"(bucket {row['bucket']}, chunk {row['chunk']}): wrong key, "
            "or block meta moved from its original position"
        ) from e
