import numpy as np
import pyarrow as pa

from tokcodec.codecs.strcodecs import arrow_to_strchunk
from tokcodec.selector import select_int_codec, select_str_codec


def test_all_equal_picks_rle_or_dict():
    v = np.full(100_000, 7, dtype=np.int64)
    codec, st = select_int_codec(v, 4)
    # FOR with width 0 (payload = 0 bytes) ties RLE here and is valid
    assert codec in ("rle", "dict", "for")
    assert st["n_runs"] == 1
    assert st["est_sizes"][codec] <= 32


def test_sorted_picks_delta():
    v = np.sort(np.random.default_rng(0).integers(0, 2**30, 100_000)).astype(np.int64)
    codec, _ = select_int_codec(v, 4)
    assert codec == "delta"


def test_narrow_range_picks_for_or_bitpack():
    v = (np.random.default_rng(0).integers(1_000_000, 1_000_255, 100_000)).astype(np.int64)
    codec, st = select_int_codec(v, 4)
    assert codec in ("for", "dict")
    assert st["width_for"] <= 8


def test_zipf_vocab_beats_plain():
    v = ((np.random.default_rng(0).zipf(1.1, 100_000) - 1) % 50257).astype(np.int64)
    codec, st = select_int_codec(v, 4)
    assert st["est_sizes"][codec] < st["est_sizes"]["plain"]


def test_high_card_wide_range_picks_cheap():
    v = np.random.default_rng(0).integers(-(2**60), 2**60, 50_000).astype(np.int64)
    codec, _ = select_int_codec(v, 8)
    assert codec in ("plain", "for", "bitpack", "delta")


def _sel_str(strings):
    arr = pa.array(strings, pa.string())
    data, lengths = arrow_to_strchunk(arr)
    return select_str_codec(data, lengths, arr)


def test_low_card_strings_pick_dict():
    codec, _ = _sel_str(["web", "books", "code"] * 5000)
    assert codec == "dict_str"


def test_structured_strings_selector_is_measured():
    # selector compares FSST vs plain AFTER the zstd outer layer and
    # must pick consistently with its own measurements
    codec, st = _sel_str(
        [f"web-{i:010d}-{(i * 2654435761) % 2**32:08x}" for i in range(20000)]
    )
    assert codec in ("fsst", "plain_str")
    if codec == "fsst":
        assert st["fsst_sample_bytes"] < 0.9 * st["plain_zstd_sample_bytes"]
    else:
        assert st["fsst_sample_bytes"] >= 0.9 * st["plain_zstd_sample_bytes"]


def test_random_strings_pick_plain_or_fsst():
    rng = np.random.default_rng(3)
    strings = ["".join(chr(c) for c in rng.integers(33, 127, 20)) for _ in range(3000)]
    codec, _ = _sel_str(strings)
    assert codec in ("plain_str", "fsst")
