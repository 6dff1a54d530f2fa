"""Fused Pallas encode kernel: FIR residues + zigzag + Rice cost sums.

The encode hot path (SURVEY.md §3 "hot-loop ranking" ③/④: FIR residual and
optimal-k search; parity target upstream:src/lpc/residue_generator.cpp +
src/rice/rice_encoder.cpp, path-level cites — mount empty). The jnp version
(ops.filters.fir_residues_fast + ops.rice.plan_blocks) re-reads the [B, S]
signal from HBM ~32 times for the FIR taps and ~31 more for the k-search;
this kernel loads each row tile into VMEM once and does everything on-chip:

  1. limb-decomposed Q20 FIR (same 12/13-bit split as the decode kernel —
     int32-exact for |x| < 2^26, i.e. any PCM <= 24-bit incl. side channels),
  2. the |e| < 2^30 residue guard with order-0 verbatim fallback,
  3. zigzag and the exact 64-bit Rice cost sums sum(u >> k) for k = 0..30,
     written as (hi, lo) int32 pairs per row.

Outputs are bit-identical to the jnp path (tested in interpret mode and on
TPU); ops.rice.k_and_bits_from_sums turns the sums into (k, bits) with the
same tie-breaking as the oracle.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..format import MAX_ORDER, REF_Q
from ..ops import i64

import os
from ..utils.platform import backend_is_tpu as _backend_is_tpu

P = MAX_ORDER
# Rows per grid cell. The unrolled tap/k loops keep ~430 KB of VMEM
# temporaries alive PER ROW (measured via Mosaic's scoped-vmem accounting);
# 64 rows ~ 28 MB, within the raised 100 MB scoped limit below and the best
# throughput of the swept sizes (tools/sweep_kernels.py).
ROWS = int(os.environ.get("SELA_FIR_ROWS", "64"))
VMEM_LIMIT = 100 * 1024 * 1024
KSUMS = 32  # k = 0..30 used; padded to 32 columns


def _fir_rice_kernel(x_ref, c_ref, nv_ref, e_ref, ok_ref, pc_ref,
                     shh_s, shl_s, slh_s, sll_s):
    """One [R, S] tile.

    x_ref: [R, S] int32 samples (zero-padded rows); c_ref: [R, P] int32 Q20
    coeffs (zero beyond order); nv_ref: [R, 1] int32 valid counts.
    e_ref: [R, S] int32 residues (guard applied, zero beyond valid);
    ok_ref: [R, 1] int32 guard flag; pc_ref: [R, 32] int32 — column j is the
    count of valid residues whose zigzag has bit j set. The k-search cost
    sum(u >> k) is recovered exactly outside the kernel via the recurrence
    S(k) = 2*S(k+1) + pc[:, k] (ops.rice), so the kernel does 32 int32
    reductions instead of the previous 31 x 2 emulated-64-bit masked sums.

    Taps-tier dispatch (r5b, mirrors kernels/iir.py): coefficients beyond a
    row's effective order are zero, so when every row in the tile has its
    highest nonzero coefficient within the first 8 taps, the 24 remaining
    tap iterations multiply zeros — skipped via pl.when, bit-identical.
    encode_step lays winner rows out channel-major, so tiles are
    order-homogeneous on real stereo (mid rows ~1-3, side rows ~24-30
    under the r5 order model) and ~half of them take the short body. Two
    tiers only (8 / full): the tap loop is the kernel's trace-heaviest
    part and each extra tier re-traces it. Partial sums land in VMEM
    scratch so the guard/zigzag/popcount epilogue is shared.
    """
    R, S = x_ref.shape
    x = x_ref[:, :]
    xh = jax.lax.shift_right_arithmetic(x, 13)
    xl = x & 0x1FFF
    cfull = c_ref[:, :]
    ch = jax.lax.shift_right_arithmetic(cfull, 12)  # [R, P]
    cl = cfull & 0xFFF
    taps_row = jnp.max(
        jnp.where(cfull != 0,
                  jax.lax.broadcasted_iota(jnp.int32, (R, P), 1) + 1, 0),
        axis=1,
    )
    tile_taps = jnp.max(taps_row)

    zcol = jnp.zeros((R, S), jnp.int32)

    def accumulate(taps: int):
        s_hh = zcol
        s_hl = zcol
        s_lh = zcol
        s_ll = zcol
        for j in range(1, taps + 1):
            # value at position n is x[n-j]; zeros for n < j
            xh_s = jnp.concatenate([zcol[:, :j], xh[:, : S - j]], axis=1)
            xl_s = jnp.concatenate([zcol[:, :j], xl[:, : S - j]], axis=1)
            chj = ch[:, j - 1 : j]
            clj = cl[:, j - 1 : j]
            s_hh = s_hh + chj * xh_s
            s_hl = s_hl + chj * xl_s
            s_lh = s_lh + clj * xh_s
            s_ll = s_ll + clj * xl_s
        shh_s[:, :] = s_hh
        shl_s[:, :] = s_hl
        slh_s[:, :] = s_lh
        sll_s[:, :] = s_ll

    @pl.when(tile_taps <= 8)
    def _():
        accumulate(8)

    @pl.when(tile_taps > 8)
    def _():
        accumulate(P)

    s_hh, s_hl = shh_s[:, :], shl_s[:, :]
    s_lh, s_ll = slh_s[:, :], sll_s[:, :]

    acc = i64.add(
        i64.add(i64.shl(i64.from_i32(s_hh), 25), i64.shl(i64.from_i32(s_hl), 12)),
        i64.add(i64.shl(i64.from_i32(s_lh), 13), i64.from_i32(s_ll)),
    )
    pred = i64.rshift_round(acc, REF_Q)
    e = i64.sub(i64.from_i32(x), pred)

    nv = nv_ref[:, :]  # [R, 1]
    valid = jax.lax.broadcasted_iota(jnp.int32, (R, S), 1) < nv
    ok_row = jnp.min(
        jnp.where(~valid | i64.abs_lt_pow2(e, 30), jnp.int32(1), jnp.int32(0)),
        axis=1,
        keepdims=True,
    )  # [R, 1]
    e32 = jnp.where(
        (ok_row > 0) & valid, i64.to_i32(e), jnp.where(valid, x, 0)
    )
    e_ref[:, :] = e32
    ok_ref[:, :] = ok_row

    # zigzag (int32 bit pattern == uint32 zigzag) + per-bit population counts
    u = jax.lax.bitcast_convert_type(
        (e32 << 1) ^ jax.lax.shift_right_arithmetic(e32, 31), jnp.uint32
    )
    u = jnp.where(valid, u, jnp.uint32(0))  # invalid rows contribute 0
    one = jnp.uint32(1)

    def count_bits(nbits: int):
        for j in range(nbits):  # bit j
            pc_ref[:, j : j + 1] = jnp.sum(
                jax.lax.bitcast_convert_type((u >> j) & one, jnp.int32),
                axis=1, keepdims=True,
            )
        if nbits < KSUMS:
            pc_ref[:, nbits:] = jnp.zeros((R, KSUMS - nbits), jnp.int32)

    # the bit loop is ~1/4 of the kernel's vector ops; residues of real
    # audio rarely exceed 16 zigzag bits (16-bit PCM) or 24 (hi-res), so
    # branch the tile on its max magnitude tier — counts above the tier are
    # exactly zero by construction, so outputs are bit-identical to the full
    # loop. (Tier as int32 per element first: Mosaic has no uint32 reduce.)
    tier = jnp.max(
        jnp.where(u >= (one << 16), jnp.int32(1), jnp.int32(0))
        + jnp.where(u >= (one << 24), jnp.int32(1), jnp.int32(0))
    )

    @pl.when(tier == 0)
    def _():
        count_bits(16)

    @pl.when(tier == 1)
    def _():
        count_bits(24)

    @pl.when(tier >= 2)
    def _():
        count_bits(KSUMS)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fir_rice_tiles(x, c, nv2, interpret: bool):
    B, S = x.shape
    grid = (B // ROWS,)
    return pl.pallas_call(
        _fir_rice_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, S), jnp.int32),       # residues
            jax.ShapeDtypeStruct((B, 1), jnp.int32),       # ok flag
            jax.ShapeDtypeStruct((B, KSUMS), jnp.int32),   # bit counts
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROWS, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((ROWS, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, KSUMS), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((ROWS, S), jnp.int32),
            pltpu.VMEM((ROWS, S), jnp.int32),
            pltpu.VMEM((ROWS, S), jnp.int32),
            pltpu.VMEM((ROWS, S), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(x, c, nv2)


ROWS_AC = int(os.environ.get("SELA_AC_ROWS", "256"))  # autocorr tile rows
LAGS = MAX_ORDER + 1  # 33 lags, padded to 64 output columns
AC_COLS = 64


def _autocorr_kernel(x_ref, r_ref):
    """One [R, S] tile -> [R, 64] f32 with r[:, lag] for lag 0..32.

    Same math as ops.analysis.autocorr (f32, scaled by 1/32768; trailing
    zero padding contributes nothing). Non-normative: analysis only picks
    the emitted stream (FORMAT.md "Design invariant").
    """
    R, S = x_ref.shape
    xf = x_ref[:, :].astype(jnp.float32) * (1.0 / 32768.0)
    zcol = jnp.zeros((R, S), jnp.float32)
    for lag in range(LAGS):
        shifted = xf if lag == 0 else jnp.concatenate(
            [xf[:, lag:], zcol[:, :lag]], axis=1
        )
        r_ref[:, lag : lag + 1] = jnp.sum(xf * shifted, axis=1, keepdims=True)
    r_ref[:, LAGS:] = jnp.zeros((R, AC_COLS - LAGS), jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _autocorr_tiles(x, interpret: bool):
    B, S = x.shape
    return pl.pallas_call(
        _autocorr_kernel,
        out_shape=jax.ShapeDtypeStruct((B, AC_COLS), jnp.float32),
        grid=(B // ROWS_AC,),
        in_specs=[
            pl.BlockSpec((ROWS_AC, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (ROWS_AC, AC_COLS), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(x)


def autocorr_pallas(x: jax.Array, max_lag: int = MAX_ORDER,
                    interpret: bool | None = None) -> jax.Array:
    """Drop-in for ops.analysis.autocorr: [B, S] int32 -> [B, max_lag+1] f32."""
    if interpret is None:
        interpret = not _backend_is_tpu()
    B, S = x.shape
    pad = (-B) % ROWS_AC
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    r = _autocorr_tiles(x, interpret)
    return r[:B, : max_lag + 1]


LANES_LEV = 128  # rows per levinson grid cell (one row per VPU lane)


def _make_levinson_kernel(max_order: int):
    """Levinson-Durbin + order select + quantize, one row per lane.

    The jnp version (ops.analysis.levinson + select_order + quantize) is
    ~1500 small [B, <=33] HBM-resident ops — on TPU it is HBM-latency bound
    (measured ~2.5 ms of the 3.6 ms analysis stage at B=8192). Here the whole
    recursion runs on [1, 128] lane vectors held in registers/VMEM: one HBM
    read of r, one write of (order, q, cost). Same op order as the jnp path;
    float analysis is non-normative (FORMAT.md "Design invariant") so ulp
    differences from XLA's fusion choices are acceptable by design.
    """
    from ..format import (COEFF_BIT_COST, ORDER_QNOISE_PENALTY,
                          Q_CLAMP_HI, Q_CLAMP_LO)

    P_ = MAX_ORDER

    def kernel(rt_ref, nv_ref, ord_ref, q_ref, cost_ref):
        # rt_ref: [P_+1, L] f32 autocorr lags (transposed); nv_ref: [1, L] i32
        # ord_ref: [1, L] i32; q_ref: [P_, L] i32; cost_ref: [1, L] f32
        L = rt_ref.shape[1]
        r = [rt_ref[m : m + 1, :] for m in range(P_ + 1)]
        r0 = r[0]
        valid = r0 > 0.0
        e = jnp.where(valid, r0, 1.0)
        a = [jnp.zeros((1, L), jnp.float32) for _ in range(P_)]
        ks, es = [], []
        for m in range(1, P_ + 1):
            if m == 1:
                acc = r[1]
            else:
                s = a[0] * r[m - 1]
                for i in range(1, m - 1):
                    s = s + a[i] * r[m - 1 - i]
                acc = r[m] - s
            k = jnp.where(e > 0.0, acc / jnp.maximum(e, 1e-30), 0.0)
            k = jnp.clip(k, -0.999999, 0.999999)
            if m > 1:
                olds = [a[i] for i in range(m - 1)]
                for i in range(m - 1):
                    a[i] = olds[i] - k * olds[m - 2 - i]
            a[m - 1] = k
            e = e * (1.0 - k * k)
            ks.append(k)
            es.append(e)
        gamma = [jnp.where(valid, kk, 0.0) for kk in ks]
        err = [jnp.where(valid, r0, 1.0)] + [
            jnp.where(valid, ee, 1.0) for ee in es
        ]
        # order select: cost(m) = N/2*log2(max(err_m + m*LAM*r0, 1e-9)) + C*m,
        # ties low; the m*LAM*r0 term models 7-bit coefficient-quantization
        # noise (format.ORDER_QNOISE_PENALTY) — same formula as the jnp and
        # oracle paths
        nf = nv_ref[:, :].astype(jnp.float32)
        lam = jnp.float32(ORDER_QNOISE_PENALTY)
        best_c = 0.5 * nf * (jnp.log(jnp.maximum(err[0], 1e-9))
                             * jnp.float32(1.4426950408889634))
        best_m = jnp.zeros((1, L), jnp.int32)
        for m in range(1, max_order + 1):
            adj = err[m] + (lam * jnp.float32(m)) * err[0]
            c = (0.5 * nf * (jnp.log(jnp.maximum(adj, 1e-9))
                             * jnp.float32(1.4426950408889634))
                 + jnp.float32(COEFF_BIT_COST * m))
            better = c < best_c
            best_c = jnp.where(better, c, best_c)
            best_m = jnp.where(better, m, best_m)
        ord_ref[:, :] = best_m
        cost_ref[:, :] = best_c
        # companded 7-bit quantization (FORMAT.md), zero beyond order
        for m in range(P_):
            g = gamma[m]
            if m == 0:
                qf = jnp.floor(64.0 * (jnp.sqrt(2.0 * (g + 1.0)) - 1.0))
            elif m == 1:
                qf = jnp.floor(64.0 * (jnp.sqrt(2.0 * (1.0 - g)) - 1.0))
            else:
                qf = jnp.floor(64.0 * g)
            qi = jnp.clip(qf, Q_CLAMP_LO, Q_CLAMP_HI).astype(jnp.int32)
            q_ref[m : m + 1, :] = jnp.where(m < best_m, qi, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("max_order", "interpret"))
def _levinson_tiles(rt, nvt, max_order: int, interpret: bool):
    Pp1, B = rt.shape
    grid = (B // LANES_LEV,)
    return pl.pallas_call(
        _make_levinson_kernel(max_order),
        out_shape=(
            jax.ShapeDtypeStruct((1, B), jnp.int32),          # order
            jax.ShapeDtypeStruct((MAX_ORDER, B), jnp.int32),  # qcoeffs^T
            jax.ShapeDtypeStruct((1, B), jnp.float32),        # min cost
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Pp1, LANES_LEV), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES_LEV), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, LANES_LEV), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((MAX_ORDER, LANES_LEV), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES_LEV), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(rt, nvt)


def analyze_pallas(x: jax.Array, n_valid: jax.Array,
                   max_order: int = MAX_ORDER,
                   interpret: bool | None = None):
    """Fused device analysis: drop-in for ops.analysis.analyze(return_cost=True).

    x: [B, S] int32 -> (order [B] i32, qcoeffs [B, MAX_ORDER] i32,
    cost [B] f32). Autocorr via the Pallas autocorr kernel, then the
    Levinson/select/quantize kernel (one lane per row). Analysis is
    non-normative; the emitted stream stays decode-exact regardless.
    """
    if interpret is None:
        interpret = not _backend_is_tpu()
    B = x.shape[0]
    r = autocorr_pallas(x, MAX_ORDER, interpret)          # [B, P+1] f32
    pad = (-B) % LANES_LEV
    rt = jnp.pad(r, ((0, pad), (0, 0))).T                 # [P+1, Bp]
    nvt = jnp.pad(n_valid.astype(jnp.int32), (0, pad))[None, :]
    o, qt, cost = _levinson_tiles(rt, nvt, max_order, interpret)
    return o[0, :B], qt.T[:B], cost[0, :B]


ROWS_PC = 64  # rows per quarter-counts grid cell


def _quarter_counts_kernel(e_ref, nv_ref, pc_ref):
    """Per-quarter zigzag bit counts for partitioned-residue planning.

    e_ref: [R, S] int32 residues (anything beyond n_valid is ignored — the
    quarter masks are subsets of [0, n_valid)); nv_ref: [R, 1] int32;
    pc_ref: [R, 4*32] int32, column q*32+j = count of values in quarter q
    (positions [q*n/4, (q+1)*n/4)) whose zigzag has bit j set.

    Exists for structure, not speed: as plain jnp inside the encode graph
    these 4x32 masked reductions made XLA:CPU's compile explode (>30 min,
    ~14 GB of LLVM state — round 4 post-mortem; the r2/r3 optimization
    barriers no longer contain the re-fusion). A pallas_call is a fusion
    boundary by construction, on TPU and in interpret mode alike, so the
    planning compiles in seconds everywhere and is faster on TPU to boot.
    """
    R, S = e_ref.shape
    e = e_ref[:, :]
    u = jax.lax.bitcast_convert_type(
        (e << 1) ^ jax.lax.shift_right_arithmetic(e, 31), jnp.uint32
    )
    nv = nv_ref[:, :]
    iota = jax.lax.broadcasted_iota(jnp.int32, (R, S), 1)
    one = jnp.uint32(1)
    for q in range(4):
        lo = (q * nv) >> 2          # nonneg: shift == floor div by 4
        hi = ((q + 1) * nv) >> 2
        uq = jnp.where((iota >= lo) & (iota < hi), u, jnp.uint32(0))
        for j in range(32):
            pc_ref[:, q * 32 + j : q * 32 + j + 1] = jnp.sum(
                jax.lax.bitcast_convert_type((uq >> j) & one, jnp.int32),
                axis=1, keepdims=True,
            )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _quarter_counts_tiles(e, nv2, interpret: bool):
    B, S = e.shape
    return pl.pallas_call(
        _quarter_counts_kernel,
        out_shape=jax.ShapeDtypeStruct((B, 4 * KSUMS), jnp.int32),
        grid=(B // ROWS_PC,),
        in_specs=[
            pl.BlockSpec((ROWS_PC, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS_PC, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS_PC, 4 * KSUMS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(e, nv2)


def quarter_counts_pallas(e: jax.Array, n_valid: jax.Array,
                          interpret: bool | None = None) -> jax.Array:
    """[B, S] residues + [B] counts -> [B, 4, 32] per-quarter bit counts,
    identical to masking each quarter and running ops.rice.bit_counts."""
    if interpret is None:
        interpret = not _backend_is_tpu()
    B, S = e.shape
    pad = (-B) % ROWS_PC
    if pad:
        e = jnp.pad(e, ((0, pad), (0, 0)))
        n_valid = jnp.pad(n_valid, (0, pad))
    nv2 = n_valid.astype(jnp.int32)[:, None]
    pc = _quarter_counts_tiles(e, nv2, interpret)
    return pc[:B].reshape(B, 4, KSUMS)


LANES_KSEL = 512  # rows per k-select grid cell (lane-resident)


def _make_ksel_kernel(k_max: int):
    """Optimal Rice k from per-bit population counts, one row per lane.

    Same selection semantics as ops.rice.k_and_bits_from_counts (ties to the
    lowest k, verbatim escape when 32n is strictly cheaper, empty rows -> 0),
    which the jnp path spends ~400 tiny HBM-resident ops on. Here the 64-bit
    cost recurrence S(k) = 2*S(k+1) + counts[k] runs on lane vectors as an
    explicit (int32 hi, uint32 lo) pair; iterating k downward with <= makes
    the lowest k win ties, matching the ascending strict-< of the jnp loop.
    """
    from ..format import RICE_K_ESCAPE

    def kernel(ct_ref, nv_ref, k_ref, bits_ref):
        # ct_ref: [32, L] i32 counts^T; nv_ref: [1, L] i32
        L = ct_ref.shape[1]
        n = nv_ref[:, :]
        u32 = lambda a: jax.lax.bitcast_convert_type(a, jnp.uint32)
        i32 = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
        s_hi = jnp.zeros((1, L), jnp.int32)
        s_lo = u32(ct_ref[31:32, :])
        best_k = jnp.zeros((1, L), jnp.int32)
        b_hi = jnp.full((1, L), jnp.int32(0x7FFFFFFF))
        b_lo = jnp.full((1, L), jnp.uint32(0xFFFFFFFF))
        for k in range(30, -1, -1):
            # S(k) = 2*S(k+1) + counts[k]; hi stays < 2^11 (S(0) < n * 2^32)
            s_hi = (s_hi << 1) | i32(s_lo >> 31)
            s_lo = s_lo << 1
            lo2 = s_lo + u32(ct_ref[k : k + 1, :])
            s_hi = s_hi + i32((lo2 < s_lo).astype(jnp.int32))
            s_lo = lo2
            if k <= k_max:
                # cost = S(k) + n*(k+1), nonneg and < 2^44
                m = u32(n * (k + 1))
                c_lo = s_lo + m
                c_hi = s_hi + i32((c_lo < s_lo).astype(jnp.int32))
                better = (c_hi < b_hi) | ((c_hi == b_hi) & (c_lo <= b_lo))
                best_k = jnp.where(better, k, best_k)
                b_hi = jnp.where(better, c_hi, b_hi)
                b_lo = jnp.where(better, c_lo, b_lo)
        verb = n * 32  # n <= 65535 so this is exact int32
        escape = (b_hi > 0) | (u32(verb) < b_lo)
        kk = jnp.where(escape, RICE_K_ESCAPE, best_k)
        bits = jnp.where(escape, verb, i32(b_lo))
        empty = n == 0
        k_ref[:, :] = jnp.where(empty, 0, kk)
        bits_ref[:, :] = jnp.where(empty, 0, bits)

    return kernel


@functools.partial(jax.jit, static_argnames=("k_max", "interpret"))
def _ksel_tiles(ct, nvt, k_max: int, interpret: bool):
    _, B = ct.shape
    return pl.pallas_call(
        _make_ksel_kernel(k_max),
        out_shape=(
            jax.ShapeDtypeStruct((1, B), jnp.int32),  # k
            jax.ShapeDtypeStruct((1, B), jnp.int32),  # bits
        ),
        grid=(B // LANES_KSEL,),
        in_specs=[
            pl.BlockSpec((KSUMS, LANES_KSEL), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES_KSEL), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, LANES_KSEL), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES_KSEL), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(ct, nvt)


def ksel_pallas(counts: jax.Array, n_valid: jax.Array, k_max: int,
                interpret: bool | None = None):
    """Drop-in for ops.rice.k_and_bits_from_counts: counts [B, 32] + n [B]
    -> (k [B], bits [B]), bit-identical for any counts <= n <= 65535."""
    if interpret is None:
        interpret = not _backend_is_tpu()
    B = counts.shape[0]
    pad = (-B) % LANES_KSEL
    ct = jnp.pad(counts.astype(jnp.int32), ((0, pad), (0, 0))).T
    nvt = jnp.pad(n_valid.astype(jnp.int32), (0, pad))[None, :]
    k, bits = _ksel_tiles(ct, nvt, k_max, interpret)
    return k[0, :B], bits[0, :B]


def fir_rice_pallas(x: jax.Array, coeffs: jax.Array, order: jax.Array,
                    n_valid: jax.Array, interpret: bool | None = None):
    """Fused FIR + Rice per-bit counts. Drop-in for
    (ops.filters.fir_residues_fast, ops.rice residue cost planning).

    x: [B, S] int32 (|x| < 2^26 — PCM <= 24-bit incl. mid/side candidates);
    coeffs: [B, P] int32 Q20; order, n_valid: [B] int32.
    Returns (e [B, S] int32, eff_order [B] int32, counts [B, 32] int32);
    feed counts to ops.rice.k_and_bits_from_counts for the exact k search.
    """
    if interpret is None:
        interpret = not _backend_is_tpu()
    B, S = x.shape
    pad = (-B) % ROWS
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        coeffs = jnp.pad(coeffs, ((0, pad), (0, 0)))
        n_valid = jnp.pad(n_valid, (0, pad))
    nv2 = n_valid.astype(jnp.int32)[:, None]
    e, ok, counts = _fir_rice_tiles(x, coeffs, nv2, interpret)
    if pad:
        e, ok, counts = e[:B], ok[:B], counts[:B]
    eff_order = jnp.where(ok[:, 0] > 0, order, 0).astype(jnp.int32)
    return e, eff_order, counts
