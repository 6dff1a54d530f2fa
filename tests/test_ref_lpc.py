"""Oracle LPC: FIR/IIR inverse property, quantization, pathological frames."""
import numpy as np
import pytest

from sela_tpu.format import REF_Q
from sela_tpu.ref import lpc


@pytest.mark.parametrize("kind", ["ar", "noise", "tone", "silence", "impulse", "dc"])
def test_fir_iir_inverse(rng, signal_factory, kind):
    x = signal_factory(rng, 2048, kind=kind)
    order, q = lpc.analyze_channel(x)
    order, q, e = lpc.render_channel(x, order, q)
    out = lpc.reconstruct_channel(e, order, q)
    np.testing.assert_array_equal(out, x)


def test_ar_signal_compresses(rng, signal_factory):
    """LPC must actually shrink residues on an AR signal."""
    x = signal_factory(rng, 2048, kind="ar")
    order, q = lpc.analyze_channel(x)
    order, q, e = lpc.render_channel(x, order, q)
    assert order >= 2
    # AR noise floor is amp/50 (~400 std, ~320 mean abs); prediction should
    # reach it, i.e. well below the raw signal amplitude
    assert np.abs(e[32:]).mean() < 0.3 * np.abs(x).mean()


def test_silence_order_zero(rng, signal_factory):
    x = signal_factory(rng, 2048, kind="silence")
    order, q = lpc.analyze_channel(x)
    assert order == 0


def test_fir_iir_inverse_arbitrary_coeffs(rng):
    """Inverse property must hold for ANY stored coefficients, stable or not."""
    for trial in range(10):
        p = int(rng.integers(1, 33))
        q = rng.integers(-64, 64, p).astype(np.int32)
        x = rng.integers(-(2**15), 2**15, 500).astype(np.int32)
        g = lpc.dequantize_reflection(q)
        c = lpc.reflection_to_lpc(g)
        e = lpc.fir_residues(x, c)
        if np.any(np.abs(e) >= 2**30):
            continue  # encoder would fall back to order 0
        out = lpc.iir_synthesize(e.astype(np.int32), c)
        np.testing.assert_array_equal(out, x)


def test_dequantize_normative_values():
    g = lpc.dequantize_reflection(np.array([-64, -64, -64], dtype=np.int32))
    assert g[0] == -(1 << REF_Q)      # gamma_1 = -1.0
    assert g[1] == (1 << REF_Q)       # gamma_2 = +1.0 (pathological but defined)
    assert g[2] == -64 * 16384
    g = lpc.dequantize_reflection(np.array([63, 63, 63], dtype=np.int32))
    assert g[0] == 128 * 127**2 - (1 << REF_Q)
    assert g[1] == (1 << REF_Q) - 128 * 127**2
    assert g[2] == 63 * 16384


def test_quantize_clamps():
    g = np.array([0.99999, -0.99999] + [2.0, -2.0] * 15)
    q = lpc.quantize_reflection(g)
    assert q.min() >= -64 and q.max() <= 63


def test_rshift_round_floor_semantics():
    # (v + 2^(Q-1)) >> Q with arithmetic shift: floor division
    # rshift_round(v, s) = floor((v + 2^(s-1)) / 2^s) — round-half-up
    assert lpc._rshift_round(-1, 1) == 0    # floor(0/2)
    assert lpc._rshift_round(-2, 1) == -1   # floor(-1/2)
    assert lpc._rshift_round(-3, 1) == -1   # floor(-2/2)
    assert lpc._rshift_round(3, 1) == 2     # floor(4/2)
    assert lpc._rshift_round(-(1 << 20), 20) == -1  # floor(-2^19 / 2^20)
    assert lpc._rshift_round((1 << 20) + (1 << 19), 20) == 2  # half rounds up


def test_levinson_integer_matches_float(rng, signal_factory):
    """Integer Levinson should approximate the float direct-form coeffs."""
    x = signal_factory(rng, 2048, kind="ar")
    r = lpc.autocorr(x)
    gamma, err = lpc.levinson_reflection(r)
    order = lpc.select_order(err, 2048)
    q = lpc.quantize_reflection(gamma[:order])
    g = lpc.dequantize_reflection(q)
    c = lpc.reflection_to_lpc(g).astype(np.float64) / (1 << REF_Q)
    # float reference conversion from the same dequantized reflection coeffs
    gf = g.astype(np.float64) / (1 << REF_Q)
    af = np.zeros(0)
    for m in range(1, order + 1):
        k = gf[m - 1]
        new = np.empty(m)
        if m > 1:
            new[: m - 1] = af - k * af[::-1]
        new[m - 1] = k
        af = new
    assert np.max(np.abs(c - af)) < 1e-3
