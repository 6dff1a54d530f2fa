"""Pallas kernels (interpret mode on CPU) vs jnp ops: bit-exact parity."""
import jax
import jax.numpy as jnp
import numpy as np

from sela_tpu.format import MAX_ORDER
from sela_tpu.kernels.iir import iir_synthesize_pallas
from sela_tpu.ops import coeffs as ops_coeffs
from sela_tpu.ops import filters as ops_filters

_dequant = jax.jit(ops_coeffs.dequantize_reflection)
_refl2lpc = jax.jit(ops_coeffs.reflection_to_lpc)
_fir = jax.jit(ops_filters.fir_residues)
_iir_ref = jax.jit(ops_filters.iir_synthesize)


def _plan(rng, B):
    orders = rng.integers(0, MAX_ORDER + 1, B).astype(np.int32)
    q = rng.integers(-64, 64, (B, MAX_ORDER)).astype(np.int32)
    q[np.arange(MAX_ORDER)[None, :] >= orders[:, None]] = 0
    return orders, q


def test_iir_pallas_matches_scan(rng, signal_factory):
    B, N = 8, 256
    orders, q = _plan(rng, B)
    x = np.stack([signal_factory(rng, N, kind="ar") for _ in range(B)])
    c = _refl2lpc(_dequant(jnp.asarray(q)), jnp.asarray(orders))
    e, eff = _fir(jnp.asarray(x), c, jnp.asarray(orders),
                  jnp.asarray(np.full(B, N, np.int32)))
    q_eff = np.where(np.arange(MAX_ORDER)[None, :] < np.asarray(eff)[:, None], q, 0)
    c2 = _refl2lpc(_dequant(jnp.asarray(q_eff)), eff)
    want = np.asarray(_iir_ref(e, c2))
    got = np.asarray(iir_synthesize_pallas(e, c2, interpret=True))
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got, x)  # and it inverts the FIR


def test_iir_pallas_nonmultiple_batch(rng, signal_factory):
    # B=3 forces lane padding; extreme-ish values exercise the 64-bit MAC
    B, N = 3, 192
    x = np.stack(
        [signal_factory(rng, N, amp=2**24, kind="noise") for _ in range(B)]
    ).astype(np.int32)
    orders = np.array([32, 1, 17], np.int32)
    q = rng.integers(-64, 64, (B, MAX_ORDER)).astype(np.int32)
    q[np.arange(MAX_ORDER)[None, :] >= orders[:, None]] = 0
    c = _refl2lpc(_dequant(jnp.asarray(q)), jnp.asarray(orders))
    e, eff = _fir(jnp.asarray(x), c, jnp.asarray(orders),
                  jnp.asarray(np.full(B, N, np.int32)))
    q_eff = np.where(np.arange(MAX_ORDER)[None, :] < np.asarray(eff)[:, None], q, 0)
    c2 = _refl2lpc(_dequant(jnp.asarray(q_eff)), eff)
    want = np.asarray(_iir_ref(e, c2))
    got = np.asarray(iir_synthesize_pallas(e, c2, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_iir_pallas_fast_matches_generic(rng, signal_factory):
    """Limb kernel == generic kernel == scan for 24-bit-range inputs."""
    B, N = 5, 320
    x = np.stack(
        [signal_factory(rng, N, amp=2**23 - 2, kind="noise") for _ in range(B)]
    ).astype(np.int32)
    orders = np.array([32, 0, 7, 1, 19], np.int32)
    q = rng.integers(-64, 64, (B, MAX_ORDER)).astype(np.int32)
    q[np.arange(MAX_ORDER)[None, :] >= orders[:, None]] = 0
    c = _refl2lpc(_dequant(jnp.asarray(q)), jnp.asarray(orders))
    e, eff = _fir(jnp.asarray(x), c, jnp.asarray(orders),
                  jnp.asarray(np.full(B, N, np.int32)))
    q_eff = np.where(np.arange(MAX_ORDER)[None, :] < np.asarray(eff)[:, None], q, 0)
    c2 = _refl2lpc(_dequant(jnp.asarray(q_eff)), eff)
    want = np.asarray(_iir_ref(e, c2))
    fast = np.asarray(iir_synthesize_pallas(e, c2, interpret=True, fast=True))
    gen = np.asarray(iir_synthesize_pallas(e, c2, interpret=True, fast=False))
    np.testing.assert_array_equal(fast, want)
    np.testing.assert_array_equal(gen, want)
    np.testing.assert_array_equal(fast, x)


def test_decode_step_pallas_impls_match(rng, signal_factory):
    """decode_step(iir=...) variants agree through the full frame pipeline."""
    import jax

    from sela_tpu.codec.pipeline import decode_step, encode_step

    F, C, S = 4, 2, 256
    x = np.stack(
        [np.stack([signal_factory(rng, S, kind="ar") for _ in range(C)])
         for _ in range(F)]
    ).astype(np.int32)
    nv = np.full(F, S, np.int32)
    enc = encode_step(x, nv)
    args = (enc["residues"], enc["qcoeffs"], enc["order"], enc["sftype"])
    scan = np.asarray(decode_step(*args, iir="scan"))
    fast = np.asarray(decode_step(*args, iir="pallas"))
    gen = np.asarray(decode_step(*args, iir="pallas_generic"))
    np.testing.assert_array_equal(scan, x)
    np.testing.assert_array_equal(fast, scan)
    np.testing.assert_array_equal(gen, scan)
