"""ops/pack.py device Rice packer: byte parity with the oracle packer.

The device packer is an A/B prototype (host pack won the r5 measurement —
see ops/rice.py), but it is kept byte-exact so the recorded A/B stays a
fair comparison on future hardware.
"""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from sela_tpu.ops.pack import pack_blocks_reference_shapes  # noqa: E402
from sela_tpu.ref import rice as ref_rice  # noqa: E402


def _check(vals, ks, n_valid, max_words):
    words, nwords = pack_blocks_reference_shapes(
        jnp.asarray(vals), jnp.asarray(ks), jnp.asarray(n_valid), max_words)
    words, nwords = np.asarray(words), np.asarray(nwords)
    for b in range(vals.shape[0]):
        _, want = ref_rice.encode(vals[b, : n_valid[b]], int(ks[b]))
        assert nwords[b] == len(want), b
        np.testing.assert_array_equal(words[b, : nwords[b]], want,
                                      err_msg=f"block {b}")
        assert not words[b, nwords[b]:].any(), b


def test_device_pack_matches_oracle_optimal_k(rng):
    B, N = 24, 512
    vals = np.round(rng.laplace(0, 300, (B, N))).astype(np.int32)
    n_valid = np.full(B, N, np.int32)
    n_valid[3], n_valid[7], n_valid[11] = 50, 1, 0
    for b in range(B):
        vals[b, n_valid[b]:] = 0
    ks = np.array(
        [ref_rice.optimal_k(ref_rice.zigzag(vals[b, : n_valid[b]]))
         for b in range(B)], np.int32)
    _check(vals, ks, n_valid, N)


@pytest.mark.parametrize("kfix", [0, 1, 5, 13, 30])
def test_device_pack_forced_k(rng, kfix):
    amp = 1 << min(kfix + 3, 30)
    vals = rng.integers(-amp, amp, (6, 96)).astype(np.int32)
    n_valid = np.full(6, 96, np.int32)
    _check(vals, np.full(6, kfix, np.int32), n_valid, 2048)


def test_device_pack_word_boundary_patterns():
    # remainders straddling word boundaries: k=30 packs 31-bit patterns that
    # almost always split across two words
    vals = np.array([[(1 << 30) - 1, -(1 << 30), 1, 0, -1, 7] * 8], np.int32)
    _check(vals, np.array([30], np.int32), np.array([48], np.int32), 128)
