"""Golden encoded-block fixtures (SURVEY.md §5 mirror of the
reference's checked-in foreign parquet files): byte-stable payloads for
fixed inputs guard the wire format across refactors. If a format change
is INTENTIONAL, regenerate with:  python tests/test_golden_format.py
"""

import json
import os
import sys
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tokcodec.codecs.intcodecs import encode_ints
from tokcodec.codecs.strcodecs import STR_CODECS, arrow_to_strchunk
import pyarrow as pa

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_blocks.json")


def _cases():
    rng = np.random.default_rng(42)
    ints = {
        "bitpack_zipf": ("bitpack", ((rng.zipf(1.1, 5000) - 1) % 50257).astype(np.int32)),
        "for_shifted": ("for", (rng.integers(0, 100, 5000) + 1_900_000_000).astype(np.int32)),
        "delta_sorted": ("delta", np.sort(rng.integers(0, 2**30, 5000)).astype(np.int64)),
        "rle_runs": ("rle", np.repeat(np.arange(50, dtype=np.int32), 100)),
        "dict_lowcard": ("dict", rng.integers(0, 8, 5000).astype(np.int64) * 1000),
    }
    strs = {
        "plain_str": ("plain_str", [f"doc-{i}" for i in range(500)]),
        "dict_str": ("dict_str", ["web", "books", "code"] * 500),
    }
    return ints, strs


def _compute():
    ints, strs = _cases()
    out = {}
    for name, (codec, v) in ints.items():
        payload, meta = encode_ints(v, codec)
        out[name] = {"crc": zlib.crc32(payload), "len": len(payload),
                     "meta": meta}
    for name, (codec, strings) in strs.items():
        data, lengths = arrow_to_strchunk(pa.array(strings, pa.string()))
        payload, meta = STR_CODECS[codec][0](data, lengths)
        out[name] = {"crc": zlib.crc32(payload), "len": len(payload),
                     "meta": meta}
    return out


def test_golden_blocks_stable():
    with open(GOLDEN) as f:
        golden = json.load(f)
    current = _compute()
    assert current == golden, (
        "encoded-block wire format changed; if intentional, regenerate "
        "goldens with: python tests/test_golden_format.py"
    )


if __name__ == "__main__":
    with open(GOLDEN, "w") as f:
        json.dump(_compute(), f, indent=1, sort_keys=True)
    print(f"wrote {GOLDEN}")
