"""Jit'd device pipeline: batched frame encode/decode steps.

TPU-native restructuring of upstream:src/frame/frame_encoder.cpp +
frame_decoder.cpp (sahaRatul/sela, path-level cite — mount empty, SURVEY.md
SS2): instead of one frame per CPU thread, ALL frames and channel candidates
are dense [F, C, S] int32 arrays; decorrelation candidates (L, R, mid, side)
are analyzed and costed in one fused batch, the cheaper pairing is selected
per frame with vectorized masks, and everything jits into a single XLA
program per (F, C, S) shape.

Shapes: F frames per chunk, C channels, S samples/frame (FRAME_SIZE padded),
B = F * C2 candidate rows with C2 = C + 2*(C//2).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..format import MAX_ORDER, SF_DIRECT, SF_MID, SF_SIDE
from ..kernels.iir import iir_synthesize_pallas
from ..ops import analysis, coeffs, filters, rice


def _mid_side(left: jax.Array, right: jax.Array):
    # mid = (L + R) >> 1 exactly, without int32 overflow, via the identity
    # (a + b) >> 1 == (a >> 1) + (b >> 1) + (a & b & 1) for arithmetic shifts
    mid = (left >> 1) + (right >> 1) + (left & right & 1)
    side = left - right  # |L-R| < 2^(bps+1) <= 2^26, no overflow
    return mid, side


def _inverse_mid_side(mid: jax.Array, side: jax.Array):
    left = mid + ((side + (side & 1)) >> 1)
    right = left - side
    return left, right


def make_candidates(x: jax.Array):
    """[F, C, S] -> [F, C2, S] with mid/side rows appended per pair."""
    F, C, S = x.shape
    extras = []
    for p in range(C // 2):
        m, s = _mid_side(x[:, 2 * p], x[:, 2 * p + 1])
        extras += [m[:, None], s[:, None]]
    if extras:
        return jnp.concatenate([x] + extras, axis=1)
    return x


def default_fused(allow_ms: bool = True) -> bool:
    """Use the fused Pallas FIR+Rice kernel? TPU backend and <=24-bit only
    (the limb FIR needs |x| < 2^26; allow_ms doubles as that marker).

    Measured r5c before keeping this gate: enabling the Pallas analyze
    kernel for 32-bit streams (where the render must stay jnp) is
    bit-identical but 2.2x SLOWER end to end (11.3 vs 5.2 ms per
    [2048, 2, 2048] chunk, same-process A/B) — a pallas_call is a fusion
    boundary, so XLA can no longer share the [B, S] sample loads between
    analysis and the jnp FIR the way the all-jnp graph does. Fused only
    pays when the whole hot path (analyze + FIR + Rice counts) stays in
    kernels, which requires the limb domain."""
    from ..utils.platform import backend_is_tpu

    return bool(allow_ms) and backend_is_tpu()


def _render_rows(xb: jax.Array, q: jax.Array, order: jax.Array,
                 nv: jax.Array, rice_k_max: int, fused: bool,
                 limb_ok: bool, partition: int):
    """Normative render for a [B, S] row batch with chosen coefficients.

    Integer Levinson -> FIR residues (+ guard) -> exact Rice planning for
    residues (optionally partitioned, FORMAT.md §Partitioned residues) and
    coefficients. limb_ok marks |x| < 2^26 (PCM <= 24-bit incl. mid/side),
    the domain of the limb FIR and the fused Pallas kernel.
    Returns dict of per-row arrays incl. block_bits (the exact-bits decision
    metric: padded-word bits + partitioned header bytes).
    """
    import os

    S = xb.shape[1]
    if fused and not os.environ.get("SELA_NO_LPC_KERNEL"):
        # lane-parallel Pallas dequantize+integer-Levinson (bit-identical for
        # encoder-produced q, which is always in [-64, 63] — kernels/coeffs)
        from ..kernels.coeffs import lpc_from_q_pallas

        c = lpc_from_q_pallas(q, order)
    else:
        c = coeffs.reflection_to_lpc(coeffs.dequantize_reflection(q), order)
    counts_res = None
    if fused and limb_ok:
        from ..kernels.encode import fir_rice_pallas

        e, eff_order, counts = fir_rice_pallas(xb, c, order, nv)
        if partition == 1 and not os.environ.get("SELA_NO_KSEL_KERNEL"):
            # defer k selection: combined with the coeff blocks in one
            # lane-parallel ksel_pallas call below
            counts_res = counts
            k_res = bits_res = nw_res = None
        else:
            k_res, bits_res = rice.k_and_bits_from_counts(
                counts, nv, rice_k_max)
            nw_res = rice.block_words(bits_res)
    else:
        fir = filters.fir_residues_fast if limb_ok else filters.fir_residues
        e, eff_order = fir(xb, c, order, nv)
        k_res, bits_res, nw_res = rice.plan_blocks(e, nv, rice_k_max)
    # adaptive partitioned residues: plan each quarter independently and use
    # the partitioned form where it is strictly smaller (oracle rule:
    # padded-word bits + one k byte per sub-block vs padded-word bits)
    from ..format import RICE_PARTITION_MARKER

    kr4 = jnp.zeros_like(eff_order)
    part_extra_bits = jnp.zeros_like(eff_order)
    if partition > 1:
        # Quarter planning runs in Pallas kernels (quarter_counts_pallas +
        # ksel_pallas), NOT inline jnp: a pallas_call is a fusion boundary,
        # which is what actually stops XLA:CPU from re-fusing the FIR
        # producer into the 4x32 masked popcount reductions. The r2/r3
        # optimization_barrier approach no longer contains that re-fusion on
        # current XLA — cold compile of the combined graph ran >30 min with
        # ~14 GB of LLVM state (round 4 post-mortem in kernels/encode.py);
        # this form compiles in seconds on CPU and TPU and is bit-identical
        # (ksel_pallas == ops.rice.k_and_bits_from_counts, tested).
        from ..format import RESIDUE_PARTS
        from ..kernels.encode import ksel_pallas, quarter_counts_pallas

        # quarter_counts_pallas hard-codes RESIDUE_PARTS=4 quarters (>>2 in
        # the kernel) while lo/hi below are generic in `partition`; keep the
        # coupling explicit so a future partition count fails here, loudly
        # (ADVICE r4), not on a shape mismatch deep in the kernel.
        assert partition == RESIDUE_PARTS == 4, (
            f"partitioned planning kernel supports partition=4 only, "
            f"got {partition}"
        )
        nv32 = nv.astype(jnp.int32)
        pc4 = quarter_counts_pallas(e, nv32)              # [B, 4, 32]
        qcols = jnp.arange(partition, dtype=jnp.int32)[None, :]
        lo = (qcols * nv32[:, None]) // partition
        hi = ((qcols + 1) * nv32[:, None]) // partition
        kq, bq = ksel_pallas(
            pc4.reshape(-1, 32), (hi - lo).reshape(-1), rice_k_max
        )
        kq = kq.reshape(-1, partition)
        part_bits = bq.reshape(-1, partition).sum(axis=1)
        nw_part = rice.block_words(part_bits)
        use_part = (nv32 >= partition) & (
            32 * nw_part + 8 * partition < 32 * nw_res
        )
        packed = kq[:, 0]
        for qi in range(1, partition):
            packed = packed | (kq[:, qi] << (8 * qi))
        kr4 = jnp.where(use_part, packed, 0)
        k_res = jnp.where(use_part, RICE_PARTITION_MARKER, k_res)
        nw_res = jnp.where(use_part, nw_part, nw_res)
        part_extra_bits = jnp.where(use_part, 8 * partition, 0)

    cols = jnp.arange(MAX_ORDER)[None, :]
    q_eff = jnp.where(cols < eff_order[:, None], q, 0)
    if counts_res is not None:
        # one lane-parallel k selection for residue AND coeff blocks
        # (bit-identical to ops.rice.k_and_bits_from_counts / plan_blocks;
        # q_eff is zeroed beyond eff_order so zigzag needs no extra mask)
        from ..kernels.encode import ksel_pallas

        counts_coeff = rice.bit_counts(rice.zigzag(q_eff))
        B2 = counts_res.shape[0]
        k_all, bits_all = ksel_pallas(
            jnp.concatenate([counts_res, counts_coeff], axis=0),
            jnp.concatenate([nv.astype(jnp.int32), eff_order], axis=0),
            rice_k_max,
        )
        k_res, bits_res = k_all[:B2], bits_all[:B2]
        k_coeff = k_all[B2:]
        nw_res = rice.block_words(bits_res)
        nw_coeff = rice.block_words(bits_all[B2:])
    else:
        k_coeff, _, nw_coeff = rice.plan_blocks(q_eff, eff_order, rice_k_max)
    # oracle decision metric (incl. the partitioned header's extra k bytes)
    block_bits = 32 * (nw_res + nw_coeff) + part_extra_bits
    return dict(e=e, eff_order=eff_order, q_eff=q_eff, k_res=k_res, kr4=kr4,
                k_coeff=k_coeff, nw_res=nw_res, nw_coeff=nw_coeff,
                block_bits=block_bits)


@partial(jax.jit,
         static_argnames=("allow_ms", "max_order", "rice_k_max", "fused",
                          "partition", "ms_mode"))
def encode_step(x: jax.Array, n_valid: jax.Array, allow_ms: bool = True,
                max_order: int = MAX_ORDER, rice_k_max: int | None = None,
                fused: bool = False, partition: int = 1,
                ms_mode: str = "est"):
    """Full encode analysis+render for one chunk.

    x: [F, C, S] int32 zero-padded, n_valid: [F] int32. allow_ms=False
    disables mid/side candidates (required for 32-bit PCM — FORMAT.md).
    max_order / rice_k_max are BitstreamProfile caps (static; defaults are
    the FORMAT.md v1 profile). fused=True routes the FIR + residue Rice
    planning through the fused Pallas kernel (TPU; bit-identical outputs —
    see default_fused()). partition=4 enables adaptive partitioned residues
    (FORMAT.md §Partitioned residues): per subframe, the cheaper of the
    plain and partitioned encodings is planned — same rule as the oracle.

    ms_mode selects the (non-normative) mid/side decision rule:
      * "est" (default, BitstreamProfile.mid_side="auto"): decide per pair
        from the Levinson-modeled cost that order selection already computes
        — the normative render (integer Levinson + FIR + exact Rice planning)
        then runs on the C winner rows only instead of all C2 candidates,
        ~halving the encode hot path. The modeled-vs-exact decision differs
        on near-tied frames only (measured <0.2% size delta, test_config).
      * "exact" (BitstreamProfile.mid_side="exact"): render all candidates
        and compare exact padded-word bits — the oracle's rule, byte-identical
        planning to rounds 1-2.

    Returns dict of per-(frame, channel) planning arrays + residues, where the
    mid/side decision has already been applied:
      residues [F, C, S], order [F, C], qcoeffs [F, C, MAX_ORDER],
      k_res/k_coeff [F, C], k_res4 [F, C] (byte-packed sub-ks, 0 unless
      k_res == RICE_PARTITION_MARKER), sftype [F, C], nw_res/nw_coeff [F, C].
    """
    from ..format import RICE_K_MAX

    if rice_k_max is None:
        rice_k_max = RICE_K_MAX
    if ms_mode not in ("est", "exact"):
        raise ValueError(f"ms_mode must be est|exact, got {ms_mode!r}")
    F, C, S = x.shape
    # accept narrow PCM dtypes (int16 halves the host->device transfer for
    # <=16-bit audio); all codec math is int32
    x = x.astype(jnp.int32)
    cand = make_candidates(x) if allow_ms else x  # [F, C2, S]
    C2 = cand.shape[1]
    B = F * C2
    xb = cand.reshape(B, S)
    nv = jnp.repeat(n_valid, C2).astype(jnp.int32)
    n_pairs = C // 2 if C2 > C else 0

    from ..kernels.encode import analyze_pallas, autocorr_pallas

    ac_impl = autocorr_pallas if fused else None

    if ms_mode == "est" and n_pairs:
        # ---- fast path: analyze all candidates, render winners only -------
        if fused:
            order_a, q_a, cost = analyze_pallas(xb, nv, max_order)
        else:
            order_a, q_a, cost = analysis.analyze(
                xb, nv, max_order, ac_impl, return_cost=True
            )
        cost = cost.reshape(F, C2)
        order_a = order_a.reshape(F, C2)
        q_a = q_a.reshape(F, C2, -1)
        use_ms_pair = [
            (cost[:, C + 2 * p] + cost[:, C + 2 * p + 1])
            < (cost[:, 2 * p] + cost[:, 2 * p + 1])
            for p in range(n_pairs)
        ]
        # winner selection per output channel: row c (direct) vs row C + c
        # (its mid/side counterpart) — jnp.where, NOT take_along_axis (XLA
        # lowers that gather to a slow scalar loop; wheres are vector selects)
        xs, osel, qsel, sft_cols = [], [], [], []
        for c in range(C):
            p = c // 2
            if p < n_pairs:
                u = use_ms_pair[p]
                xs.append(jnp.where(u[:, None], cand[:, C + c], cand[:, c]))
                osel.append(jnp.where(u, order_a[:, C + c], order_a[:, c]))
                qsel.append(jnp.where(u[:, None], q_a[:, C + c], q_a[:, c]))
                t = SF_MID if c % 2 == 0 else SF_SIDE
                sft_cols.append(jnp.where(u, t, SF_DIRECT).astype(jnp.int32))
            else:
                xs.append(cand[:, c])
                osel.append(order_a[:, c])
                qsel.append(q_a[:, c])
                sft_cols.append(jnp.zeros(F, jnp.int32))
        sftype = jnp.stack(sft_cols, axis=1)
        # CHANNEL-MAJOR winner rows (r5b, mirrors decode_step): mid rows run
        # order ~1-3 and side rows ~24-30 under the r5 order model, so
        # channel-grouped render tiles are order-homogeneous and the FIR
        # kernel's taps-tier dispatch can skip 3/4 of the tap work on the
        # low tiles. Pure row permutation — planning bytes are unchanged.
        xw = jnp.stack(xs, axis=0).reshape(C * F, S)
        ow = jnp.stack(osel, axis=0).reshape(C * F)
        qw = jnp.stack(qsel, axis=0).reshape(C * F, -1)
        nvw = jnp.tile(n_valid, C).astype(jnp.int32)
        r = _render_rows(xw, qw, ow, nvw, rice_k_max, fused,
                         limb_ok=allow_ms, partition=partition)

        def out2(a):
            return jnp.swapaxes(a.reshape(C, F, *a.shape[1:]), 0, 1)

        res = out2(r["e"])
        eff_order, q_eff = out2(r["eff_order"]), out2(r["q_eff"])
        k_res, kr4, k_coeff = out2(r["k_res"]), out2(r["kr4"]), out2(r["k_coeff"])
        nw_res, nw_coeff = out2(r["nw_res"]), out2(r["nw_coeff"])
        return _encode_outputs(res, eff_order, q_eff, k_res, kr4, k_coeff,
                               nw_res, nw_coeff, sftype)

    # ---- exact path: render every candidate, decide on exact bits ---------
    # (also the n_pairs == 0 path, where the two modes coincide)
    if fused:
        order, q, _ = analyze_pallas(xb, nv, max_order)
    else:
        order, q = analysis.analyze(xb, nv, max_order, ac_impl)
    r = _render_rows(xb, q, order, nv, rice_k_max, fused,
                     limb_ok=allow_ms, partition=partition)
    e, eff_order, q_eff = r["e"], r["eff_order"], r["q_eff"]
    k_res, kr4, k_coeff = r["k_res"], r["kr4"], r["k_coeff"]
    nw_res, nw_coeff, block_bits = r["nw_res"], r["nw_coeff"], r["block_bits"]

    def g2(a):
        return a.reshape(F, C2, *a.shape[1:])

    e, eff_order, q_eff = g2(e), g2(eff_order), g2(q_eff)
    k_res, k_coeff, kr4 = g2(k_res), g2(k_coeff), g2(kr4)
    nw_res, nw_coeff = g2(nw_res), g2(nw_coeff)
    bb = g2(block_bits)

    # mid/side decision per pair: candidate rows C + 2p (mid), C + 2p + 1
    # (side), i.e. paired output channel c selects between row c (direct)
    # and row C + c (its mid/side counterpart). Selection is jnp.where per
    # channel, NOT take_along_axis — XLA lowers the gather to a slow
    # scalar loop (measured ~800 ms per 256-frame chunk on CPU, ~4x the
    # whole rest of the encode graph; wheres are plain vector selects).
    use_ms_pair = []
    sft_cols = []
    for c in range(C):
        p = c // 2
        if p < n_pairs:
            if c % 2 == 0:
                li, ri = 2 * p, 2 * p + 1
                mi, si = C + 2 * p, C + 2 * p + 1
                use_ms_pair.append(
                    (bb[:, mi] + bb[:, si]) < (bb[:, li] + bb[:, ri])
                )
            u = use_ms_pair[p]
            t = SF_MID if c % 2 == 0 else SF_SIDE
            sft_cols.append(jnp.where(u, t, SF_DIRECT).astype(jnp.int32))
        else:
            sft_cols.append(jnp.zeros(F, jnp.int32))
    sftype = jnp.stack(sft_cols, axis=1)

    def pick(a):
        cols = []
        for c in range(C):
            p = c // 2
            if p < n_pairs:
                u = use_ms_pair[p].reshape(F, *([1] * (a.ndim - 2)))
                cols.append(jnp.where(u, a[:, C + c], a[:, c]))
            else:
                cols.append(a[:, c])
        return jnp.stack(cols, axis=1)

    res = pick(e)
    return _encode_outputs(res, pick(eff_order), pick(q_eff), pick(k_res),
                           pick(kr4), pick(k_coeff), pick(nw_res),
                           pick(nw_coeff), sftype)


def _encode_outputs(res, order, qcoeffs, k_res, kr4, k_coeff, nw_res,
                    nw_coeff, sftype) -> dict:
    """Assemble encode_step's output dict from decided [F, C, ...] arrays."""
    # int16 wire format for the device->host residue fetch: residues of
    # musical content almost always fit int16, halving the dominant D2H
    # transfer (the host fetches res16 when fits16 says every frame fits,
    # falling back to the exact int32 array otherwise — encoder.py).
    # wrap-safe range check (NOT jnp.abs: abs(INT32_MIN) wraps to INT32_MIN,
    # which compares < 2^15 and would silently truncate that sample to 0)
    fits16 = jnp.all(
        (res >= -(1 << 15)) & (res < (1 << 15)), axis=(1, 2)
    ).astype(jnp.int32)
    return dict(
        residues=res,
        res16=res.astype(jnp.int16),
        fits16=fits16,
        order=order,
        qcoeffs=qcoeffs,
        k_res=k_res,
        k_res4=kr4,
        k_coeff=k_coeff,
        nw_res=nw_res,
        nw_coeff=nw_coeff,
        sftype=sftype,
    )


@partial(jax.jit, static_argnames=("iir", "out_dtype"))
def decode_step(residues: jax.Array, qcoeffs: jax.Array, order: jax.Array,
                sftype: jax.Array, iir: str = "scan",
                out_dtype: str = "int32"):
    """Inverse: residues [F, C, S] + plan -> PCM [F, C, S].

    iir: "scan" (lax.scan, any input), "pallas" (fast limb kernel, exact for
    PCM <= 24-bit), "pallas_generic" (hi/lo kernel, any input). All three are
    bit-identical on valid streams within their domain. out_dtype="int16"
    halves the device->host transfer when the stream is <=16-bit PCM.
    """
    F, C, S = residues.shape
    B = F * C
    # accept int16 wire residues (host sends them when every value fits —
    # halves the host->device transfer); codec math is int32
    import os

    residues = residues.astype(jnp.int32)
    # CHANNEL-MAJOR row layout for the IIR batch (r5b): rows grouped by
    # channel rather than by frame. Per-row math is order-independent of
    # layout (bit-identical), but the fast IIR kernel's tier dispatch works
    # per 128-lane tile — and real stereo is strongly per-channel bimodal
    # (tonal mid channels sit at order ~1-3, side channels ~27 under the r5
    # order model), so channel-grouped tiles let ~half the tiles take the
    # 8/16-tap bodies instead of being dragged to 32 taps by one high row.
    q_cm = jnp.swapaxes(qcoeffs, 0, 1).reshape(B, -1)
    o_cm = jnp.swapaxes(order, 0, 1).reshape(B)
    if iir == "scan" or os.environ.get("SELA_NO_LPC_KERNEL"):
        # pure-jnp normative reference path (the env toggle is a perf
        # diagnostic — all paths are bit-identical on valid streams)
        g = coeffs.dequantize_reflection(q_cm)
        c = coeffs.reflection_to_lpc(g, o_cm)
    else:
        # Pallas fast paths: lane-parallel dequantize+integer-Levinson
        # (bit-identical for every valid stream — kernels/coeffs.py)
        from ..kernels.coeffs import lpc_from_q_pallas

        c = lpc_from_q_pallas(q_cm, o_cm)
    e2 = jnp.swapaxes(residues, 0, 1).reshape(B, S)
    if iir == "pallas":
        x = iir_synthesize_pallas(e2, c, fast=True)
    elif iir == "pallas_generic":
        x = iir_synthesize_pallas(e2, c, fast=False)
    else:
        x = filters.iir_synthesize(e2, c)
    # inverse mid/side fused with the channel-major -> [F, C, S] restore:
    # one where-select per output channel and ONE stack write. The previous
    # x.at[:, ch].set(...) form materialized two full-array copies per pair
    # (measured 2.5 ms of the 5.6 ms decode_step at [4096, 2, 2048] — 44%
    # of the whole graph); this form reads x once and writes the output once.
    xc = x.reshape(C, F, S)
    chans = []
    for p in range(C // 2):
        li, ri = 2 * p, 2 * p + 1
        is_ms = (sftype[:, li] == SF_MID)[:, None]
        left, right = _inverse_mid_side(xc[li], xc[ri])
        chans.append(jnp.where(is_ms, left, xc[li]))
        chans.append(jnp.where(is_ms, right, xc[ri]))
    if C % 2:
        chans.append(xc[C - 1])
    x = jnp.stack(chans, axis=1)
    return x.astype(jnp.int16) if out_dtype == "int16" else x
