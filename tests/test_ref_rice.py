"""Oracle Rice coder: roundtrip + edge cases (SURVEY.md SS4 property tests)."""
import numpy as np
import pytest

from sela_tpu.ref import rice


def roundtrip(values, k=None):
    values = np.asarray(values, dtype=np.int32)
    k_used, words = rice.encode(values, k)
    out = rice.decode(words, len(values), k_used)
    np.testing.assert_array_equal(out, values)
    return k_used, words


def test_zigzag_roundtrip_edges():
    v = np.array([0, -1, 1, 2**31 - 1, -(2**31), 12345, -12345], dtype=np.int32)
    u = rice.zigzag(v)
    np.testing.assert_array_equal(rice.unzigzag(u), v)
    assert u[3] == 0xFFFFFFFE and u[4] == 0xFFFFFFFF


def test_empty():
    k, words = rice.encode(np.zeros(0, dtype=np.int32))
    assert len(words) == 0
    assert len(rice.decode(words, 0, k)) == 0


@pytest.mark.parametrize("kind,scale", [("small", 10), ("mid", 1000), ("big", 10**6)])
def test_random_roundtrip(rng, kind, scale):
    for _ in range(5):
        v = rng.integers(-scale, scale, 997)
        roundtrip(v)


def test_forced_k_values(rng):
    v = rng.integers(-500, 500, 256)
    for k in [0, 1, 5, 14, 30, 31]:
        roundtrip(v, k)


def test_extreme_values_escape():
    v = np.array([2**31 - 1, -(2**31), 0, -1] * 64, dtype=np.int32)
    k, words = rice.encode(v)
    assert k == 31  # verbatim escape: rice cost would be astronomical
    np.testing.assert_array_equal(rice.decode(words, len(v), k), v)


def test_all_zero_picks_k0():
    v = np.zeros(512, dtype=np.int32)
    k, words = rice.encode(v)
    assert k == 0
    assert len(words) == 512 // 32  # 1 bit per value
    np.testing.assert_array_equal(rice.decode(words, 512, k), v)


def test_single_value():
    for val in [0, 1, -1, 65535, -65536]:
        roundtrip(np.array([val], dtype=np.int32))


def test_optimal_k_is_optimal(rng):
    """Brute-force check the k search against exhaustive cost evaluation."""
    v = rng.integers(-3000, 3000, 333)
    u = rice.zigzag(np.asarray(v, dtype=np.int32))
    best = rice.optimal_k(u)
    costs = {k: rice.bit_lengths(u, k).sum() for k in range(31)}
    assert costs[best] == min(costs.values())


def test_bit_layout_known_vector():
    """Pin the exact bit layout: k=1, values [0, -1, 1] -> u=[0,1,2]
    encodings: '0 0', '0 1', '10 0' => bits 0001100 + zero pad."""
    k, words = rice.encode(np.array([0, -1, 1], dtype=np.int32), 1)
    assert k == 1
    assert len(words) == 1
    assert words[0] == 0b00011000_00000000_00000000_00000000


def test_cost_matches_encoding(rng):
    v = rng.integers(-100, 100, 200)
    k, nbits = rice.encoded_cost_bits(v)
    _, words = rice.encode(np.asarray(v, dtype=np.int32), k)
    assert len(words) == -(-nbits // 32)
