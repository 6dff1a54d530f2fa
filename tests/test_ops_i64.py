"""i64 emulation vs numpy int64 — randomized + edge-case exact equality."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sela_tpu.ops import i64

EDGE = np.array(
    [0, 1, -1, 2, -2, 2**31 - 1, -(2**31), 2**30, -(2**30), 0x5555AAAA,
     -0x5555AAAA, 0xFFFF, -0xFFFF, 0x10000, -0x10000],
    dtype=np.int32,
)


def rand32(rng, n):
    return rng.integers(-(2**31), 2**31, n, dtype=np.int64).astype(np.int32)


def rand64(rng, n):
    return rng.integers(-(2**62), 2**62, n, dtype=np.int64)


def test_from_to_i32():
    x = jnp.asarray(EDGE)
    p = i64.from_i32(x)
    np.testing.assert_array_equal(i64.to_py(p), EDGE.astype(np.int64))
    assert bool(i64.fits_i32(p).all())
    np.testing.assert_array_equal(np.asarray(i64.to_i32(p)), EDGE)


def test_mul_exact(rng):
    a = np.concatenate([EDGE, rand32(rng, 5000)])
    b = np.concatenate([EDGE[::-1], rand32(rng, 5000)])
    p = i64.mul_i32(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_array_equal(i64.to_py(p), a.astype(np.int64) * b.astype(np.int64))


def test_add_sub_neg(rng):
    a = rand64(rng, 4000)
    b = rand64(rng, 4000)
    pa, pb = i64.from_py(a), i64.from_py(b)
    np.testing.assert_array_equal(i64.to_py(i64.add(pa, pb)), a + b)
    np.testing.assert_array_equal(i64.to_py(i64.sub(pa, pb)), a - b)
    np.testing.assert_array_equal(i64.to_py(i64.neg(pa)), -a)


@pytest.mark.parametrize("s", [1, 5, 20, 31])
def test_shr_arithmetic(rng, s):
    a = np.concatenate([rand64(rng, 3000), EDGE.astype(np.int64) * 7])
    out = i64.to_py(i64.shr(i64.from_py(a), s))
    np.testing.assert_array_equal(out, a >> s)


@pytest.mark.parametrize("s", [1, 19, 20, 21])
def test_rshift_round_matches_oracle(rng, s):
    from sela_tpu.ref.lpc import _rshift_round

    a = rand64(rng, 3000) >> 2  # headroom for the +2^(s-1)
    out = i64.to_py(i64.rshift_round(i64.from_py(a), s))
    np.testing.assert_array_equal(out, _rshift_round(a, s))


def test_saturate(rng):
    a = np.array([2**31, -(2**31) - 1, 2**40, -(2**40), 5, -5], dtype=np.int64)
    out = np.asarray(i64.saturate_i32(i64.from_py(a)))
    np.testing.assert_array_equal(
        out, np.clip(a, -(2**31), 2**31 - 1).astype(np.int32)
    )


def test_lt(rng):
    a = rand64(rng, 2000)
    b = rand64(rng, 2000)
    np.testing.assert_array_equal(np.asarray(i64.lt(i64.from_py(a), i64.from_py(b))), a < b)


def test_abs_lt_pow2():
    a = np.array([2**30 - 1, -(2**30) + 1, 2**30, -(2**30), 2**40, -(2**40), 0], dtype=np.int64)
    out = np.asarray(i64.abs_lt_pow2(i64.from_py(a), 30))
    np.testing.assert_array_equal(out, np.abs(a) < 2**30)


def test_mac_chain_matches_int64(rng):
    """A 32-tap MAC like the prediction filter: exact vs numpy int64."""
    c = rand32(rng, 32) >> 1
    x = (rand32(rng, 32) >> 7)
    acc = i64.zeros(())
    for j in range(32):
        acc = i64.add(acc, i64.mul_i32(jnp.asarray(c[j]), jnp.asarray(x[j])))
    expect = (c.astype(np.int64) * x.astype(np.int64)).sum()
    assert int(i64.to_py(acc)) == expect


def test_works_under_jit(rng):
    a = rand32(rng, 256)
    b = rand32(rng, 256)

    @jax.jit
    def f(a, b):
        p = i64.mul_i32(a, b)
        p = i64.rshift_round(p, 20)
        return i64.saturate_i32(p)

    out = np.asarray(f(jnp.asarray(a), jnp.asarray(b)))
    expect = (a.astype(np.int64) * b.astype(np.int64) + (1 << 19)) >> 20
    np.testing.assert_array_equal(out, np.clip(expect, -(2**31), 2**31 - 1))
