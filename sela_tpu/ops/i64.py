"""64-bit integer arithmetic emulated as (hi: int32, lo: uint32) pairs.

TPU has no native int64 vector path (Mosaic/Pallas rejects it; XLA emulates it
slowly). The normative codec math (FORMAT.md) needs exact 64-bit
multiply-accumulate for the Q20 prediction filters and integer Levinson, so we
emulate it explicitly with int32/uint32 VPU ops. These helpers are pure jnp and
work identically inside Pallas kernels and in plain jit'd code, on TPU and CPU.

Value of a pair (hi, lo) = hi * 2**32 + uint32(lo), i.e. standard two's
complement 64-bit split. All shifts are arithmetic on hi, logical on lo.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class I64(NamedTuple):
    hi: jax.Array  # int32
    lo: jax.Array  # uint32


def _u32(x):
    return jax.lax.bitcast_convert_type(x, jnp.uint32)


def _i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def from_i32(x: jax.Array) -> I64:
    """Sign-extend int32 -> I64."""
    x = x.astype(jnp.int32)
    return I64(jax.lax.shift_right_arithmetic(x, 31), _u32(x))


def const(value: int, shape=(), dtype_check: bool = True) -> I64:
    """Python int -> I64 of broadcast shape."""
    v = int(value)
    assert -(1 << 63) <= v < (1 << 63)
    hi = jnp.full(shape, (v >> 32) & 0xFFFFFFFF, dtype=jnp.uint32)
    lo = jnp.full(shape, v & 0xFFFFFFFF, dtype=jnp.uint32)
    return I64(_i32(hi), lo)


def add(a: I64, b: I64) -> I64:
    lo = a.lo + b.lo  # uint32 wrap-around
    carry = (lo < a.lo).astype(jnp.int32)
    return I64(a.hi + b.hi + carry, lo)


def neg(a: I64) -> I64:
    lo = (~a.lo) + jnp.uint32(1)
    borrow = (lo == 0).astype(jnp.int32)
    return I64(~a.hi + borrow, lo)


def sub(a: I64, b: I64) -> I64:
    return add(a, neg(b))


def mul_i32(a: jax.Array, b: jax.Array) -> I64:
    """Exact signed 32x32 -> 64-bit product."""
    a = a.astype(jnp.int32)
    b = b.astype(jnp.int32)
    ua, ub = _u32(a), _u32(b)
    mask = jnp.uint32(0xFFFF)
    al, ah = ua & mask, ua >> 16
    bl, bh = ub & mask, ub >> 16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    t = (ll >> 16) + (lh & mask) + (hl & mask)          # < 2**18, no overflow
    lo = (ll & mask) | ((t & mask) << 16)
    hi_u = hh + (lh >> 16) + (hl >> 16) + (t >> 16)     # unsigned high word
    # signed correction: subtract b where a < 0 and a where b < 0
    hi_u = hi_u - jnp.where(a < 0, ub, jnp.uint32(0))
    hi_u = hi_u - jnp.where(b < 0, ua, jnp.uint32(0))
    return I64(_i32(hi_u), lo)


def shr(a: I64, s: int) -> I64:
    """Arithmetic right shift by static 1 <= s <= 31."""
    assert 1 <= s <= 31
    lo = (a.lo >> s) | (_u32(a.hi) << (32 - s))
    hi = jax.lax.shift_right_arithmetic(a.hi, s)
    return I64(hi, lo)


def shl(a: I64, s: int) -> I64:
    """Left shift by static 1 <= s <= 31."""
    assert 1 <= s <= 31
    lo = a.lo << s
    hi_u = (_u32(a.hi) << s) | (a.lo >> (32 - s))
    return I64(_i32(hi_u), lo)


def rshift_round(a: I64, s: int) -> I64:
    """(v + 2**(s-1)) >> s, arithmetic — the normative FORMAT.md rounding."""
    return shr(add(a, const(1 << (s - 1), a.hi.shape)), s)


def fits_i32(a: I64) -> jax.Array:
    """True where the pair is a sign-extended int32."""
    return a.hi == jax.lax.shift_right_arithmetic(_i32(a.lo), 31)


def to_i32(a: I64) -> jax.Array:
    """Low 32 bits as int32 (caller guarantees fits_i32)."""
    return _i32(a.lo)


def saturate_i32(a: I64) -> jax.Array:
    """Clamp to int32 range."""
    low = _i32(a.lo)
    pos = jnp.int32(0x7FFFFFFF)
    neg_ = jnp.int32(-0x80000000)
    return jnp.where(fits_i32(a), low, jnp.where(a.hi >= 0, pos, neg_))


def lt(a: I64, b: I64) -> jax.Array:
    """Signed a < b."""
    return (a.hi < b.hi) | ((a.hi == b.hi) & (a.lo < b.lo))


def abs_lt_pow2(a: I64, bits: int) -> jax.Array:
    """|a| < 2**bits for bits <= 30 (used for the residue-overflow guard)."""
    assert bits <= 30
    v = to_i32(a)
    lim = jnp.int32(1 << bits)
    return fits_i32(a) & (v < lim) & (v > -lim)


def zeros(shape) -> I64:
    return I64(jnp.zeros(shape, jnp.int32), jnp.zeros(shape, jnp.uint32))


def where(mask: jax.Array, a: I64, b: I64) -> I64:
    return I64(jnp.where(mask, a.hi, b.hi), jnp.where(mask, a.lo, b.lo))


# -------------------------------------------------------------- test helpers

def to_py(a: I64):
    """I64 -> numpy int64 (for tests; uses host numpy only)."""
    import numpy as np

    hi = np.asarray(a.hi, dtype=np.int64)
    lo = np.asarray(a.lo, dtype=np.uint32).astype(np.int64)
    return hi * (1 << 32) + lo


def from_py(v) -> I64:
    """numpy int64 array -> I64 (for tests)."""
    import numpy as np

    v = np.asarray(v, dtype=np.int64)
    hi = (v >> 32).astype(np.int32)
    lo = (v & 0xFFFFFFFF).astype(np.uint32)
    return I64(jnp.asarray(hi), jnp.asarray(lo))
