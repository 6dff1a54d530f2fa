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


def test_iir_pallas_unroll_variants_match(rng, signal_factory):
    """Every (lanes, unroll) sweep point of the fast kernel is bit-identical
    to the scan path — the software-pipelined partial-sum + correction
    restructure (kernels/iir.py r5) must not change a single bit."""
    B, N = 6, 256
    x = np.stack(
        [signal_factory(rng, N, amp=2**23 - 2, kind="noise") for _ in range(B)]
    ).astype(np.int32)
    orders = np.array([32, 0, 7, 1, 19, 32], np.int32)
    q = rng.integers(-64, 64, (B, MAX_ORDER)).astype(np.int32)
    q[np.arange(MAX_ORDER)[None, :] >= orders[:, None]] = 0
    c = _refl2lpc(_dequant(jnp.asarray(q)), jnp.asarray(orders))
    e, eff = _fir(jnp.asarray(x), c, jnp.asarray(orders),
                  jnp.asarray(np.full(B, N, np.int32)))
    q_eff = np.where(np.arange(MAX_ORDER)[None, :] < np.asarray(eff)[:, None], q, 0)
    c2 = _refl2lpc(_dequant(jnp.asarray(q_eff)), eff)
    want = np.asarray(_iir_ref(e, c2))
    for unroll in (1, 2, 4, 8):
        got = np.asarray(iir_synthesize_pallas(
            e, c2, interpret=True, fast=True, lanes=128, unroll=unroll))
        np.testing.assert_array_equal(got, want, err_msg=f"unroll={unroll}")
    # non-dividing unroll falls back to the plain body, still exact
    got = np.asarray(iir_synthesize_pallas(
        e[:, :250], c2, interpret=True, fast=True, unroll=4))
    np.testing.assert_array_equal(
        got, np.asarray(_iir_ref(e[:, :250], c2)))


def test_iir_mixed_orders_bit_exact(rng):
    """Mixed orders in one tile (incl. 0 and zero-tail coefficients) are
    bit-identical to the scan path at every unroll depth. (Kept from the
    r5b tier-dispatch experiment, which was removed after measuring 0% —
    the kernel is latency-bound, see kernels/iir.py docstring.)"""
    B, N = 12, 256
    orders = np.array([0, 1, 8, 9, 16, 17, 32, 2, 30, 8, 16, 5], np.int32)
    q = rng.integers(-64, 64, (B, MAX_ORDER)).astype(np.int32)
    q[np.arange(MAX_ORDER)[None, :] >= orders[:, None]] = 0
    c = _refl2lpc(_dequant(jnp.asarray(q)), jnp.asarray(orders))
    # in-domain inputs: residues from the FIR of a bounded signal (the fast
    # kernel's limb identities require |x| < 2^26; arbitrary residues under
    # an unstable random order-32 filter can wrap, which is out of contract)
    x = rng.integers(-(1 << 24), 1 << 24, (B, N)).astype(np.int32)
    e, eff = _fir(jnp.asarray(x), c, jnp.asarray(orders),
                  jnp.asarray(np.full(B, N, np.int32)))
    q_eff = np.where(
        np.arange(MAX_ORDER)[None, :] < np.asarray(eff)[:, None], q, 0)
    c2 = _refl2lpc(_dequant(jnp.asarray(q_eff)), eff)
    want = np.asarray(_iir_ref(e, c2))
    for unroll in (1, 2, 4):
        got = np.asarray(iir_synthesize_pallas(
            e, c2, interpret=True, fast=True, lanes=128, unroll=unroll))
        np.testing.assert_array_equal(got, want, err_msg=f"unroll={unroll}")


def test_fir_rice_taps_tier_bit_exact(rng):
    """The FIR kernel's 8/full taps-tier dispatch (kernels/encode.py r5b)
    is bit-identical to the jnp path for tiles mixing orders across the
    tier boundary, including order 0, tails and short rows."""
    import jax

    from sela_tpu.kernels.encode import fir_rice_pallas
    from sela_tpu.ops import rice as ops_rice

    B, S = 8, 512
    orders = np.array([0, 1, 8, 9, 32, 3, 17, 8], np.int32)
    q = rng.integers(-64, 64, (B, MAX_ORDER)).astype(np.int32)
    q[np.arange(MAX_ORDER)[None, :] >= orders[:, None]] = 0
    c = _refl2lpc(_dequant(jnp.asarray(q)), jnp.asarray(orders))
    x = rng.integers(-(1 << 17), 1 << 17, (B, S)).astype(np.int32)
    nv = np.full(B, S, np.int32)
    nv[2] = 100
    x[2, 100:] = 0
    e_want, eff_want = jax.jit(ops_filters.fir_residues_fast)(
        jnp.asarray(x), c, jnp.asarray(orders), jnp.asarray(nv))
    k_want, _, _ = jax.jit(ops_rice.plan_blocks)(e_want, jnp.asarray(nv))
    e_got, eff_got, counts = fir_rice_pallas(
        jnp.asarray(x), c, jnp.asarray(orders), jnp.asarray(nv),
        interpret=True)
    np.testing.assert_array_equal(np.asarray(e_got), np.asarray(e_want))
    np.testing.assert_array_equal(np.asarray(eff_got), np.asarray(eff_want))
    k_got, _ = ops_rice.k_and_bits_from_counts(counts, jnp.asarray(nv))
    np.testing.assert_array_equal(np.asarray(k_got), np.asarray(k_want))


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


def test_fused_encode_kernel_matches_jnp(rng, signal_factory):
    """fir_rice_pallas == (fir_residues_fast + plan_blocks), bit for bit."""
    from sela_tpu.kernels.encode import fir_rice_pallas
    from sela_tpu.ops import rice as ops_rice

    B, N = 6, 2048
    kinds = ["ar", "tone", "noise", "silence", "impulse", "dc"]
    x = np.stack(
        [signal_factory(rng, N, amp=2**23 - 7, kind=k) for k in kinds]
    ).astype(np.int32)
    nv = np.array([N, N, N - 301, N, 1, N], np.int32)
    x[2, nv[2]:] = 0
    x[4, nv[4]:] = 0
    orders, q = _plan(rng, B)
    c = _refl2lpc(_dequant(jnp.asarray(q)), jnp.asarray(orders))

    e_want, eff_want = jax.jit(ops_filters.fir_residues_fast)(
        jnp.asarray(x), c, jnp.asarray(orders), jnp.asarray(nv))
    k_want, bits_want, nw_want = jax.jit(ops_rice.plan_blocks)(
        e_want, jnp.asarray(nv))

    e_got, eff_got, counts = fir_rice_pallas(
        jnp.asarray(x), c, jnp.asarray(orders), jnp.asarray(nv),
        interpret=True)
    k_got, bits_got = ops_rice.k_and_bits_from_counts(counts, jnp.asarray(nv))

    np.testing.assert_array_equal(np.asarray(e_got), np.asarray(e_want))
    np.testing.assert_array_equal(np.asarray(eff_got), np.asarray(eff_want))
    np.testing.assert_array_equal(np.asarray(k_got), np.asarray(k_want))
    np.testing.assert_array_equal(np.asarray(bits_got), np.asarray(bits_want))


def test_encode_step_fused_matches_unfused(rng, signal_factory):
    """encode_step(fused=True) (interpret on CPU) == encode_step(fused=False)."""
    from sela_tpu.codec.pipeline import encode_step

    F, C, S = 3, 2, 2048
    x = np.stack(
        [np.stack([signal_factory(rng, S, kind="ar") for _ in range(C)])
         for _ in range(F)]
    ).astype(np.int32)
    nv = np.array([S, S, S - 77], np.int32)
    x[2, :, nv[2]:] = 0
    a = encode_step(x, nv, fused=False)
    b = encode_step(x, nv, fused=True)
    for key in a:
        np.testing.assert_array_equal(
            np.asarray(a[key]), np.asarray(b[key]), err_msg=key)


def test_autocorr_pallas_matches_jnp(rng, signal_factory):
    """Interpret-mode autocorr kernel vs jnp — identical reduction per row
    on CPU; analysis is non-normative so TPU-vs-CPU float drift is fine."""
    from sela_tpu.kernels.encode import autocorr_pallas
    from sela_tpu.ops import analysis

    B, N = 5, 2048
    kinds = ["ar", "tone", "noise", "silence", "dc"]
    x = np.stack(
        [signal_factory(rng, N, kind=k) for k in kinds]).astype(np.int32)
    want = np.asarray(jax.jit(analysis.autocorr)(jnp.asarray(x)))
    got = np.asarray(autocorr_pallas(jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_lpc_from_q_pallas_matches_jnp(rng):
    """Lane-parallel dequantize+integer-Levinson kernel == jnp pair, bit for
    bit, for every valid q (the encoder's clamp range), incl. lane padding."""
    from sela_tpu.kernels.coeffs import lpc_from_q_pallas

    B = 67  # forces lane-tile padding
    orders, q = _plan(rng, B)
    want = np.asarray(_refl2lpc(_dequant(jnp.asarray(q)), jnp.asarray(orders)))
    got = np.asarray(
        lpc_from_q_pallas(jnp.asarray(q), jnp.asarray(orders), interpret=True))
    np.testing.assert_array_equal(got, want)
    # extreme valid values at full order stress the SAT clamp every step
    for val in (-64, 63):
        qe = np.full((4, MAX_ORDER), val, np.int32)
        oe = np.full(4, MAX_ORDER, np.int32)
        want = np.asarray(_refl2lpc(_dequant(jnp.asarray(qe)), jnp.asarray(oe)))
        got = np.asarray(
            lpc_from_q_pallas(jnp.asarray(qe), jnp.asarray(oe), interpret=True))
        np.testing.assert_array_equal(got, want, err_msg=str(val))
    # hostile q (possible only in crafted containers): bounded garbage, no UB
    qh = rng.integers(-2**31, 2**31 - 1, (8, MAX_ORDER)).astype(np.int32)
    oh = np.full(8, MAX_ORDER, np.int32)
    gh = np.asarray(
        lpc_from_q_pallas(jnp.asarray(qh), jnp.asarray(oh), interpret=True))
    assert np.abs(gh.astype(np.int64)).max() <= (1 << 23)


def test_ksel_pallas_matches_jnp(rng):
    """Lane-parallel k-selection == ops.rice.k_and_bits_from_counts for
    random, empty, and escape-forcing rows, at both k_max caps."""
    from sela_tpu.kernels.encode import ksel_pallas
    from sela_tpu.ops import rice as ops_rice

    B, N = 100, 512
    vals = (rng.integers(-(2**20), 2**20, (B, N))
            * (rng.random((B, N)) < 0.7)).astype(np.int32)
    vals[0] = 0                      # all-zero row
    vals[1] = np.int32(-(2**31))     # max-magnitude zigzag -> escape
    nv = rng.integers(0, N + 1, B).astype(np.int32)
    nv[2] = 0                        # empty row
    u = np.array(ops_rice.zigzag(jnp.asarray(vals)))  # writable copy
    u[np.arange(N)[None, :] >= nv[:, None]] = 0
    counts = np.asarray(ops_rice.bit_counts(jnp.asarray(u)))
    for kmax in (30, 7):
        k_w, b_w = ops_rice.k_and_bits_from_counts(
            jnp.asarray(counts), jnp.asarray(nv), kmax)
        k_g, b_g = ksel_pallas(
            jnp.asarray(counts), jnp.asarray(nv), kmax, interpret=True)
        np.testing.assert_array_equal(np.asarray(k_g), np.asarray(k_w),
                                      err_msg=f"k_max={kmax}")
        np.testing.assert_array_equal(np.asarray(b_g), np.asarray(b_w),
                                      err_msg=f"k_max={kmax}")


def test_tap_tier_branches_bit_exact(rng, signal_factory):
    """Homogeneous low-order tiles select the 8/16-tap loop variants in both
    the IIR and fused FIR kernels — outputs must equal the scan/jnp paths."""
    from sela_tpu.kernels.encode import fir_rice_pallas
    from sela_tpu.ops import rice as ops_rice

    for hi in (5, 8, 13, 16, 22):  # max order per batch drives the tier
        B, N = 4, 512
        orders = rng.integers(1, hi + 1, B).astype(np.int32)
        orders[0] = hi  # pin the tile max
        q = rng.integers(-64, 64, (B, MAX_ORDER)).astype(np.int32)
        q[np.arange(MAX_ORDER)[None, :] >= orders[:, None]] = 0
        x = np.stack([signal_factory(rng, N, kind="ar") for _ in range(B)])
        c = _refl2lpc(_dequant(jnp.asarray(q)), jnp.asarray(orders))
        nv = np.full(B, N, np.int32)
        e_want, eff_want = jax.jit(ops_filters.fir_residues_fast)(
            jnp.asarray(x), c, jnp.asarray(orders), jnp.asarray(nv))
        k_want, _, _ = jax.jit(ops_rice.plan_blocks)(e_want, jnp.asarray(nv))
        e_got, eff_got, counts = fir_rice_pallas(
            jnp.asarray(x), c, jnp.asarray(orders), jnp.asarray(nv),
            interpret=True)
        k_got, _ = ops_rice.k_and_bits_from_counts(counts, jnp.asarray(nv))
        np.testing.assert_array_equal(np.asarray(e_got), np.asarray(e_want),
                                      err_msg=f"fir hi={hi}")
        np.testing.assert_array_equal(np.asarray(k_got), np.asarray(k_want),
                                      err_msg=f"k hi={hi}")
        want = np.asarray(_iir_ref(e_want, c))
        got = np.asarray(
            iir_synthesize_pallas(e_want, c, interpret=True, fast=True))
        np.testing.assert_array_equal(got, want, err_msg=f"iir hi={hi}")
        np.testing.assert_array_equal(got, x, err_msg=f"iir inv hi={hi}")
