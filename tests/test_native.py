"""Native C++ bit I/O vs numpy oracle: bit-identical packing/unpacking."""
import numpy as np
import pytest

from sela_tpu.native import bitio
from sela_tpu.ref import rice as ref_rice

pytestmark = pytest.mark.skipif(
    not bitio.available(), reason="native library not built (make -C sela_tpu/native)"
)


def _random_blocks(rng, n_blocks=50):
    blocks = []
    for i in range(n_blocks):
        n = int(rng.integers(0, 600))
        scale = [1, 5, 100, 4000, 10**6, 2**30][i % 6]
        v = rng.integers(-scale, scale + 1, n).astype(np.int32)
        u = ref_rice.zigzag(v)
        k = ref_rice.optimal_k(u) if n else 0
        blocks.append((v, int(k)))
    return blocks


def test_pack_matches_oracle(rng):
    blocks = _random_blocks(rng)
    native = bitio.pack_blocks(blocks)
    for (v, k), w_native in zip(blocks, native):
        _, w_ref = ref_rice.encode(v, k)
        np.testing.assert_array_equal(w_native, w_ref)


def test_unpack_matches_oracle(rng):
    blocks = _random_blocks(rng)
    packed = [(ref_rice.encode(v, k)[1], len(v), k) for v, k in blocks]
    native = bitio.unpack_blocks(packed)
    for (v, _), got in zip(blocks, native):
        np.testing.assert_array_equal(got, v)


def test_roundtrip_extremes():
    # note: small k on INT_MAX-scale values means ~2^32-bit unary codes —
    # legal but absurd (the optimal-k search never picks it); test the sane
    # high-k and escape paths on extremes, small k on small values elsewhere
    v = np.array([2**31 - 1, -(2**31), 0, -1, 1] * 100, dtype=np.int32)
    for k in [28, 30, 31]:
        words = bitio.pack_blocks([(v, k)])[0]
        _, w_ref = ref_rice.encode(v, k)
        np.testing.assert_array_equal(words, w_ref)
        back = bitio.unpack_blocks([(words, len(v), k)])[0]
        np.testing.assert_array_equal(back, v)


def test_forced_k0_long_unary(rng):
    # k=0 with moderately large values => long unary runs crossing words
    v = rng.integers(-200, 200, 64).astype(np.int32)
    words = bitio.pack_blocks([(v, 0)])[0]
    _, w_ref = ref_rice.encode(v, 0)
    np.testing.assert_array_equal(words, w_ref)
    np.testing.assert_array_equal(bitio.unpack_blocks([(words, 64, 0)])[0], v)


def test_empty_and_single():
    out = bitio.pack_blocks([(np.zeros(0, np.int32), 3)])
    assert len(out[0]) == 0
    one = bitio.pack_blocks([(np.array([-7], np.int32), 2)])[0]
    _, w_ref = ref_rice.encode(np.array([-7], np.int32), 2)
    np.testing.assert_array_equal(one, w_ref)


def test_bitpack_dispatcher_uses_native(rng):
    from sela_tpu.utils import bitpack

    blocks = _random_blocks(rng, 10)
    via_dispatch = bitpack.pack_blocks(blocks)
    for (v, k), w in zip(blocks, via_dispatch):
        _, w_ref = ref_rice.encode(v, k)
        np.testing.assert_array_equal(w, w_ref)
