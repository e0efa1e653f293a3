"""String column codecs: plain / dict (+ FSST in fsst.py).

Canonical in-memory form for a string chunk is ``(data: bytes, lengths:
np.int64 array)`` — the flattened utf8 buffer plus per-value byte
lengths, i.e. Arrow's string layout with lengths instead of offsets
(lengths compress better: they are small and bit-packable).

Conversion to/from Arrow happens once per chunk via pyarrow buffers —
no per-string Python in the hot path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from tokcodec.codecs.intcodecs import (
    bitpack_decode,
    bitpack_encode,
    dict_decode as int_dict_decode,
    dict_encode as int_dict_encode,
    rle_decode,
    rle_encode,
)
from tokcodec.kernels import pack_frames, safe_offsets32, unpack_frames


def arrow_to_strchunk(arr: pa.Array) -> tuple[bytes, np.ndarray]:
    """Arrow string/binary array -> (byte buffer, lengths). Nulls must
    be pre-masked by the caller (validity is a separate block
    component). Binary shares string's (offsets, data) layout, so the
    same codecs serve opaque payloads (multimodal blobs)."""
    if pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.string())
    elif pa.types.is_large_binary(arr.type):
        arr = arr.cast(pa.binary())
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    # fill nulls with empty value so buffers are well-defined
    if arr.null_count:
        arr = arr.fill_null(b"" if pa.types.is_binary(arr.type) else "")
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int32, count=len(arr) + 1 + arr.offset)
    offsets = offsets[arr.offset :].astype(np.int64)
    data = buffers[2].to_pybytes()[offsets[0] : offsets[-1]] if buffers[2] is not None else b""
    lengths = np.diff(offsets)
    return data, lengths


def strchunk_to_arrow(data: bytes, lengths: np.ndarray,
                      binary: bool = False) -> pa.Array:
    offsets = safe_offsets32(np.asarray(lengths, dtype=np.int64))
    return pa.Array.from_buffers(
        pa.binary() if binary else pa.string(),
        len(lengths),
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data)],
    )


# ------------------------------------------------------------ plain_str
def plain_str_encode(data: bytes, lengths: np.ndarray) -> tuple[bytes, dict]:
    lp, lm = bitpack_encode(lengths)
    return pack_frames([lp, data]), {"lengths": lm}


def plain_str_decode(payload: bytes, meta: dict, n: int) -> tuple[bytes, np.ndarray]:
    lp, data = unpack_frames(payload)
    lengths = bitpack_decode(lp, meta["lengths"], n)
    return data, lengths


# ------------------------------------------------------------- dict_str
def dict_str_encode(data: bytes, lengths: np.ndarray) -> tuple[bytes, dict]:
    """dictionary of unique strings (plain_str) + packed codes.

    Codes use RLE when the chunk is run-heavy (e.g. data arriving
    clustered by ``source``), else bit-packing — decided by exact size.
    """
    # operate in binary layout: valid for utf8 and opaque bytes alike
    arr = strchunk_to_arrow(data, lengths, binary=True)
    denc = arr.dictionary_encode()
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    ddata, dlens = arrow_to_strchunk(denc.dictionary)
    dp, dm = plain_str_encode(ddata, dlens)
    rp, rm = rle_encode(codes)
    bp, bm = bitpack_encode(codes)
    if len(rp) < len(bp):
        code_codec, cp, cm = "rle", rp, rm
    else:
        code_codec, cp, cm = "bitpack", bp, bm
    payload = pack_frames([dp, cp])
    return payload, {
        "card": int(len(denc.dictionary)),
        "dict": dm,
        "codes": cm,
        "code_codec": code_codec,
    }


def dict_str_decode(payload: bytes, meta: dict, n: int) -> tuple[bytes, np.ndarray]:
    dp, cp = unpack_frames(payload)
    ddata, dlens = plain_str_decode(dp, meta["dict"], meta["card"])
    if meta["code_codec"] == "rle":
        codes = rle_decode(cp, meta["codes"], n)
    else:
        codes = bitpack_decode(cp, meta["codes"], n)
    dict_arr = strchunk_to_arrow(ddata, dlens, binary=True)
    out = dict_arr.take(pa.array(codes, type=pa.int64()))
    return arrow_to_strchunk(out)


STR_CODECS = {
    "plain_str": (plain_str_encode, plain_str_decode),
    "dict_str": (dict_str_encode, dict_str_decode),
}
