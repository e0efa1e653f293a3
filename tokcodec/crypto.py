"""Column encryption — the engine's analogue of Parquet Modular
Encryption in plaintext-footer mode (reference C6 exposes the
parquet-java knob via FileEncryptionProperties, CarpetWriter.java:
235-238; format spec: AES-GCM per module, AAD-bound to the module's
position).

Model: ONE table key (caller-provided, never stored), a declared
subset of columns to protect. Each selected block payload is
encrypted AFTER the lightweight codec + outer compression
(compress-then-encrypt; ciphertext doesn't compress) with AES-GCM:

    stored payload = 12-byte random nonce || ciphertext || 16-byte tag

The AAD binds every block to its exact position
(run_id, bucket, chunk, column, component) — swapping two encrypted
blocks, even within one table, fails authentication (parquet's module
AAD rationale). Block crc32 covers the STORED bytes, so
verify_checksums works without the key.

Plaintext-footer mode: manifests, lineage, zone maps, string bounds
and bloom blocks stay readable without the key (like parquet's
plaintext footer + plaintext stats); only payload bytes are
protected. The encrypted column LIST is recorded in the table
manifest so readers fail fast with a clear error instead of decoding
ciphertext.
"""

from __future__ import annotations

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


def block_aad(row: dict) -> bytes:
    """Module AAD: the block's unique position in the table."""
    return (f"{row['run_id']}|{row['bucket']}|{row['chunk']}|"
            f"{row['column']}|{row['component']}").encode("utf-8")


def encrypt_block_row(key: bytes, row: dict) -> None:
    """In-place: payload -> nonce||ct||tag, meta marked, stored-byte
    accounting (enc_bytes, checksum) updated. Must run AFTER run_id/
    chunk are assigned (they are part of the AAD)."""
    nonce = os.urandom(12)
    ct = _aesgcm(key).encrypt(nonce, row["payload"], block_aad(row))
    row["payload"] = nonce + ct
    meta = json.loads(row["meta"])
    meta["enc"] = "gcm"
    row["meta"] = json.dumps(meta, separators=(",", ":"))
    row["enc_bytes"] = len(row["payload"])
    row["checksum"] = int(zlib.crc32(row["payload"]))


def is_encrypted(row: dict) -> bool:
    return _ENC_MARK in row["meta"]


def decrypt_block_row(key: bytes | None, row: dict) -> None:
    """In-place inverse of encrypt_block_row. Raises with a clear
    message on a missing key or an authentication failure (wrong key
    OR a block moved from its original position)."""
    if key is None:
        raise ValueError(
            f"column {row['column']!r} is encrypted — pass "
            "encryption_key to read it")
    buf = row["payload"]
    try:
        row["payload"] = _aesgcm(key).decrypt(buf[:12], buf[12:],
                                              block_aad(row))
    except Exception as e:
        raise ValueError(
            f"decryption failed for column {row['column']!r} "
            f"(bucket {row['bucket']}, chunk {row['chunk']}): wrong "
            "key, or block bytes moved from their original position"
        ) from e
