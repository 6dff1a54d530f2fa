"""Normative jnp ops vs numpy oracle: bit-exact parity on random inputs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sela_tpu.format import MAX_ORDER
from sela_tpu.ops import coeffs as ops_coeffs
from sela_tpu.ops import filters as ops_filters
from sela_tpu.ops import rice as ops_rice
from sela_tpu.ref import lpc as ref_lpc
from sela_tpu.ref import rice as ref_rice

# jit everything: eager dispatch on this 2-core host is ~7.5 ms/op
_dequant = jax.jit(ops_coeffs.dequantize_reflection)
_refl2lpc = jax.jit(ops_coeffs.reflection_to_lpc)
_fir = jax.jit(ops_filters.fir_residues)
_iir = jax.jit(ops_filters.iir_synthesize)
_plan = jax.jit(ops_rice.plan_blocks)
_zig = jax.jit(ops_rice.zigzag)
_unzig = jax.jit(ops_rice.unzigzag)


def random_plan(rng, B):
    orders = rng.integers(0, MAX_ORDER + 1, B).astype(np.int32)
    q = rng.integers(-64, 64, (B, MAX_ORDER)).astype(np.int32)
    q[np.arange(MAX_ORDER)[None, :] >= orders[:, None]] = 0
    return orders, q


def test_dequantize_parity(rng):
    orders, q = random_plan(rng, 64)
    out = np.asarray(_dequant(jnp.asarray(q)))
    for b in range(64):
        expect = ref_lpc.dequantize_reflection(q[b])
        np.testing.assert_array_equal(out[b], expect.astype(np.int32))


def test_reflection_to_lpc_parity(rng):
    orders, q = random_plan(rng, 128)
    g = np.asarray(_dequant(jnp.asarray(q)))
    out = np.asarray(
        _refl2lpc(jnp.asarray(g), jnp.asarray(orders))
    )
    for b in range(128):
        expect = ref_lpc.reflection_to_lpc(
            ref_lpc.dequantize_reflection(q[b][: orders[b]])
        )
        np.testing.assert_array_equal(out[b][: orders[b]], expect)
        assert (out[b][orders[b] :] == 0).all()


def test_fir_parity(rng, signal_factory):
    B, N = 24, 512
    orders, q = random_plan(rng, B)
    kinds = ["ar", "noise", "tone", "impulse"]
    x = np.stack([signal_factory(rng, N, kind=kinds[b % 4]) for b in range(B)])
    n_valid = np.full(B, N, np.int32)
    n_valid[-1] = 300  # one short row
    x[-1, 300:] = 0
    g = _dequant(jnp.asarray(q))
    c = _refl2lpc(g, jnp.asarray(orders))
    e, eff = _fir(
        jnp.asarray(x), c, jnp.asarray(orders), jnp.asarray(n_valid)
    )
    e, eff = np.asarray(e), np.asarray(eff)
    for b in range(B):
        nb = n_valid[b]
        o, qq, er = ref_lpc.render_channel(x[b][:nb], int(orders[b]), q[b])
        assert eff[b] == o
        np.testing.assert_array_equal(e[b][:nb], er)
        assert (e[b][nb:] == 0).all()


def test_iir_parity_and_inverse(rng, signal_factory):
    B, N = 16, 400
    orders, q = random_plan(rng, B)
    x = np.stack([signal_factory(rng, N, kind="ar") for _ in range(B)])
    g = _dequant(jnp.asarray(q))
    c = _refl2lpc(g, jnp.asarray(orders))
    n_valid = np.full(B, N, np.int32)
    e, eff = _fir(
        jnp.asarray(x), c, jnp.asarray(orders), jnp.asarray(n_valid)
    )
    # decode side: rebuild coeffs from (eff, q) — rows that fell back use 0
    q_eff = np.where(np.arange(MAX_ORDER)[None, :] < np.asarray(eff)[:, None], q, 0)
    g2 = _dequant(jnp.asarray(q_eff))
    c2 = _refl2lpc(g2, eff)
    out = np.asarray(_iir(e, c2))
    np.testing.assert_array_equal(out, x)
    # and against the oracle decoder
    for b in range(4):
        expect = ref_lpc.reconstruct_channel(
            np.asarray(e)[b], int(np.asarray(eff)[b]), q_eff[b]
        )
        np.testing.assert_array_equal(out[b], expect)


def test_rice_plan_parity(rng):
    B, N = 40, 777
    scales = [1, 3, 50, 1000, 10**6, 2**30]
    vals = np.stack(
        [rng.integers(-scales[b % 6], scales[b % 6] + 1, N) for b in range(B)]
    ).astype(np.int32)
    n_valid = np.full(B, N, np.int32)
    n_valid[3] = 123
    vals[3, 123:] = 0
    k, bits, nwords = _plan(jnp.asarray(vals), jnp.asarray(n_valid))
    k, bits, nwords = np.asarray(k), np.asarray(bits), np.asarray(nwords)
    for b in range(B):
        v = vals[b][: n_valid[b]]
        kk, bb = ref_rice.encoded_cost_bits(v)
        assert k[b] == kk, b
        assert bits[b] == bb, b
        _, words = ref_rice.encode(v, kk)
        assert nwords[b] == len(words), b


def test_rice_zigzag_parity(rng):
    v = rng.integers(-(2**31), 2**31, 2048, dtype=np.int64).astype(np.int32)
    u_ops = np.asarray(_zig(jnp.asarray(v))).astype(np.uint64)
    u_ref = ref_rice.zigzag(v)
    np.testing.assert_array_equal(u_ops, u_ref)
    back = np.asarray(_unzig(jnp.asarray(u_ops.astype(np.uint32))))
    np.testing.assert_array_equal(back, v)


def test_analysis_produces_working_plans(rng, signal_factory):
    """Float analysis: not byte-normative, but plans must render + roundtrip."""
    from sela_tpu.ops import analysis

    B, N = 8, 2048
    kinds = ["ar", "noise", "tone", "silence", "impulse", "dc", "ar", "ar"]
    x = np.stack([signal_factory(rng, N, kind=k) for k in kinds])
    n_valid = np.full(B, N, np.int32)
    order, q = jax.jit(analysis.analyze)(jnp.asarray(x), jnp.asarray(n_valid))
    order, q = np.asarray(order), np.asarray(q)
    assert order[3] == 0  # silence
    assert order[0] >= 2  # AR signal
    for b in range(B):
        o, qq, e = ref_lpc.render_channel(x[b], int(order[b]), q[b])
        out = ref_lpc.reconstruct_channel(e, o, qq)
        np.testing.assert_array_equal(out, x[b])


def test_fir_fast_matches_generic(rng, signal_factory):
    """Limb FIR == generic FIR for 24-bit-range inputs (any coeffs)."""
    B, N = 16, 384
    orders, q = random_plan(rng, B)
    x = np.stack(
        [signal_factory(rng, N, amp=2**25 - 2, kind=["ar", "noise"][b % 2])
         for b in range(B)]
    ).astype(np.int32)
    n_valid = np.full(B, N, np.int32)
    n_valid[2] = 100
    x[2, 100:] = 0
    g = _dequant(jnp.asarray(q))
    c = _refl2lpc(g, jnp.asarray(orders))
    e1, eff1 = _fir(jnp.asarray(x), c, jnp.asarray(orders), jnp.asarray(n_valid))
    fast = jax.jit(ops_filters.fir_residues_fast)
    e2, eff2 = fast(jnp.asarray(x), c, jnp.asarray(orders), jnp.asarray(n_valid))
    np.testing.assert_array_equal(np.asarray(eff1), np.asarray(eff2))
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_rice_k_exact_on_extreme_magnitudes(rng):
    """Regression: the 16-bit-split cost sum must carry hi*2^16 into the high
    i64 word — with it dropped, 24-bit-noise-scale residues planned k=0."""
    import numpy as np

    from sela_tpu.ops import rice as jrice
    from sela_tpu.ref import rice as rrice

    cases = [
        np.full((1, 2048), 1 << 25, np.int32),
        rng.integers(-(1 << 23), 1 << 23, (4, 2048)).astype(np.int32),
        np.full((1, 2048), -(1 << 31), np.int32),
        rng.integers(-(1 << 29), 1 << 29, (4, 2048)).astype(np.int32),
    ]
    for v in cases:
        B, N = v.shape
        u = jrice.zigzag(jnp.asarray(v))
        k, bits = jrice.optimal_k_and_bits(u, jnp.full(B, N, np.int32))
        for b in range(B):
            uu = rrice.zigzag(v[b])
            k0 = rrice.optimal_k(uu)
            bits0 = 32 * N if k0 == 31 else int(rrice.bit_lengths(uu, k0).sum())
            assert (int(k[b]), int(bits[b])) == (k0, bits0)
