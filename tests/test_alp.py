"""ALP float codec: bit-exact losslessness on any input, decimal-data
compression wins, selector integration on the float lane."""

import numpy as np
import pytest

from tokcodec.blocks import (
    decode_float_component,
    encode_float_component,
)
from tokcodec.codecs.alp import alp_decode, alp_encode, alp_probe


def _roundtrip(v: np.ndarray) -> np.ndarray:
    payload, meta = alp_encode(v)
    out = alp_decode(payload, meta, len(v))
    assert out.dtype == v.dtype
    return out


def _bits(v: np.ndarray) -> np.ndarray:
    return v.view(np.uint64 if v.dtype.itemsize == 8 else np.uint32)


@pytest.mark.parametrize("decimals", [0, 1, 2, 4])
def test_decimal_data_bit_exact_and_small(decimals):
    rng = np.random.default_rng(7)
    v = np.round(rng.uniform(-1e4, 1e4, 20_000), decimals)
    payload, meta = alp_encode(v)
    out = alp_decode(payload, meta, len(v))
    assert np.array_equal(_bits(out), _bits(v))
    # decimal doubles pack far below 8 bytes/value before outer zstd
    assert len(payload) < 0.45 * v.nbytes
    assert meta["n_exc"] <= len(v) * 0.01


def test_random_doubles_still_lossless():
    rng = np.random.default_rng(11)
    v = rng.standard_normal(5_000)  # nothing decimal: all exceptions
    out = _roundtrip(v)
    assert np.array_equal(_bits(out), _bits(v))


def test_specials_become_exceptions():
    v = np.array([1.25, -0.0, np.nan, np.inf, -np.inf, 1e300, 2.5,
                  5e-324, 0.0, -3.75], dtype=np.float64)
    payload, meta = alp_encode(v)
    out = alp_decode(payload, meta, len(v))
    assert np.array_equal(_bits(out), _bits(v))  # incl. NaN payload, -0.0
    assert meta["n_exc"] >= 4


def test_float32_lane():
    rng = np.random.default_rng(3)
    v = np.round(rng.uniform(0, 100, 10_000), 2).astype(np.float32)
    out = _roundtrip(v)
    assert np.array_equal(_bits(out), _bits(v))


def test_trailing_zero_factor():
    # multiples of 100: f>0 strips shared decimal zeros -> narrower ints
    v = (np.arange(10_000, dtype=np.float64) * 100.0)
    payload, meta = alp_encode(v)
    assert meta["f"] >= 0 and meta["n_exc"] == 0
    out = alp_decode(payload, meta, len(v))
    assert np.array_equal(out, v)


def test_empty_and_single():
    assert len(_roundtrip(np.array([], dtype=np.float64))) == 0
    v = np.array([np.nan], dtype=np.float64)  # exception at position 0
    out = _roundtrip(v)
    assert np.array_equal(_bits(out), _bits(v))


def test_probe_rates():
    rng = np.random.default_rng(5)
    decimal = np.round(rng.uniform(0, 1, 2_000), 3)
    noise = rng.standard_normal(2_000)
    assert alp_probe(decimal) <= 0.01
    assert alp_probe(noise) > 0.3


def test_component_selector_picks_alp_on_decimal_data():
    rng = np.random.default_rng(9)
    v = np.round(rng.uniform(-500, 500, 30_000), 2)
    row = encode_float_component(0, "price", "values", v)
    assert row["codec"] == "alp"
    out = decode_float_component(row)
    assert np.array_equal(_bits(out), _bits(v))
    assert len(row["payload"]) < 0.4 * v.nbytes
    # zone map still rides along for range pruning
    import json
    meta = json.loads(row["meta"])
    assert meta["lo"] == float(v.min()) and meta["hi"] == float(v.max())


def test_component_selector_avoids_alp_on_noise():
    rng = np.random.default_rng(13)
    v = rng.standard_normal(30_000)
    row = encode_float_component(0, "x", "values", v)
    assert row["codec"] in ("plain_f", "split")
    out = decode_float_component(row)
    assert np.array_equal(_bits(out), _bits(v))


def test_forced_override_is_lossless_even_on_noise():
    rng = np.random.default_rng(17)
    v = rng.standard_normal(4_000)
    row = encode_float_component(0, "x", "values", v, codec="alp")
    assert row["codec"] == "alp"
    out = decode_float_component(row)
    assert np.array_equal(_bits(out), _bits(v))
