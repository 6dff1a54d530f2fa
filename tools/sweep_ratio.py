"""Ratio-knob sweep against the pinned corpus (VERDICT r4 item 7).

The compression ratio has been frozen at ~0.578 (bench) / 0.595 (pinned 10 s)
since round 2 with no evidence the v1 knobs sit at a local optimum. This
tool measures, on CPU with the exact jnp analysis the encoder uses:

  1. COEFF_BIT_COST sweep (order-selection header-cost model, 4..10): total
     EXACT stream bits of the full encode per setting;
  2. exact-order headroom: for every (frame, channel) row, render ALL 33
     candidate orders and take the true-minimum exact bits — the gap to the
     modeled selection bounds what ANY order-cost model could still gain;
  3. wasted-bits headroom (VERDICT item 9 pre-measurement): shared trailing
     zero bits / constant frames on the corpus — the gain a FLAC-style
     wasted-bits feature could harvest;
  4. partitioned-residue (v2) win statistics on the same corpus.

Writes RATIO_SWEEP.json at the repo root; decisions land in PARITY.md.
Run:  JAX_PLATFORMS=cpu python tools/sweep_ratio.py [--seconds 10]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def exact_bits_for_orders(xb, q_full, nv, rice_k_max=30):
    """[B, S] rows + [B, 32] full-order quantized reflections ->
    [B, 33] exact padded-word stream bits for every candidate order."""
    import jax
    import jax.numpy as jnp

    from sela_tpu.ops import coeffs, filters, rice

    @jax.jit
    def bits_for_order(m):
        cols = jnp.arange(q_full.shape[1])[None, :]
        q_m = jnp.where(cols < m, q_full, 0)
        order = jnp.full(xb.shape[0], m, jnp.int32)
        c = coeffs.reflection_to_lpc(coeffs.dequantize_reflection(q_m), order)
        e, eff = filters.fir_residues_fast(xb, c, order, nv)
        _, _, nw_res = rice.plan_blocks(e, nv, rice_k_max)
        q_eff = jnp.where(cols < eff[:, None], q_m, 0)
        _, _, nw_c = rice.plan_blocks(q_eff, eff, rice_k_max)
        return 32 * (nw_res + nw_c)

    return np.stack(
        [np.asarray(bits_for_order(m)) for m in range(33)], axis=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "RATIO_SWEEP.json"))
    args = ap.parse_args()

    from sela_tpu.utils.platform import respect_platform_env

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    respect_platform_env()

    import jax
    import jax.numpy as jnp

    from sela_tpu.bench import make_corpus
    from sela_tpu.codec.encoder import encode_wav, frame_batches
    from sela_tpu.codec.pipeline import make_candidates
    from sela_tpu.ops import analysis
    from sela_tpu.ref.wav import WavData

    left, right = make_corpus(args.seconds, seed=args.seed)
    w = WavData(44100, 16, [left, right])
    pcm_bytes = w.n_samples * w.n_channels * 2
    rec: dict = {"seconds": args.seconds, "seed": args.seed,
                 "pcm_bytes": pcm_bytes}

    # baseline e2e container ratio (v1 defaults, full pipeline incl. headers)
    buf = encode_wav(w)
    rec["baseline_ratio_v1"] = round(len(buf) / pcm_bytes, 6)
    print(f"[sweep] baseline v1 container ratio "
          f"{rec['baseline_ratio_v1']:.6f}", file=sys.stderr)

    # dense candidate batch + full-order analysis once
    x, n_valid = frame_batches([left, right])
    cand = np.asarray(make_candidates(jnp.asarray(x)))
    F, C2, S = cand.shape
    xb = jnp.asarray(cand.reshape(F * C2, S))
    nv = jnp.asarray(np.repeat(n_valid, C2).astype(np.int32))

    @jax.jit
    def full_analysis(xb, nv):
        r = analysis.autocorr(xb)
        gamma, err = analysis.levinson(r)
        q_full = analysis.quantize_reflection(gamma)
        return err, q_full

    err, q_full = full_analysis(xb, nv)
    bits_all = exact_bits_for_orders(xb, q_full, nv)   # [B, 33]

    # frame-level stream bits under the v1 mid/side rule for a given
    # per-row order choice: pick ms per pair by exact bits (the oracle rule)
    def corpus_bits(order_choice):
        b_rows = np.take_along_axis(
            bits_all, order_choice[:, None], axis=1)[:, 0]
        b = b_rows.reshape(F, C2)
        direct = b[:, 0] + b[:, 1]
        ms = b[:, 2] + b[:, 3]
        return int(np.minimum(direct, ms).sum())

    # 1. COEFF_BIT_COST sweep via the modeled selection rule (the production
    # model, including the r5 ORDER_QNOISE_PENALTY term), plus the
    # pre-penalty model for the historical record
    from sela_tpu.format import ORDER_QNOISE_PENALTY

    sweep = {}
    err_np = np.asarray(err).astype(np.float64)
    nvf = np.asarray(nv).astype(np.float64)[:, None]
    m = np.arange(33, dtype=np.float64)[None, :]
    adj = err_np + ORDER_QNOISE_PENALTY * m * err_np[:, :1]
    logerr = 0.5 * nvf * np.log2(np.maximum(adj, 1e-9))
    for cbc in (4, 5, 6, 7, 8, 9, 10):
        cost = logerr + cbc * m
        order = np.argmin(cost, axis=1).astype(np.int64)
        sweep[str(cbc)] = corpus_bits(order)
    rec["coeff_bit_cost_sweep_stream_bits"] = sweep
    base7 = sweep["7"]
    rec["coeff_bit_cost_rel_to_7"] = {
        k: round((v - base7) / base7 * 100, 4) for k, v in sweep.items()}
    cost_np = (0.5 * nvf * np.log2(np.maximum(err_np, 1e-9)) + 7 * m)
    rec["no_penalty_model_stream_bits"] = corpus_bits(
        np.argmin(cost_np, axis=1).astype(np.int64))
    rec["penalty_gain_pct"] = round(
        (rec["no_penalty_model_stream_bits"] - base7)
        / rec["no_penalty_model_stream_bits"] * 100, 4)
    print(f"[sweep] COEFF_BIT_COST rel%: {rec['coeff_bit_cost_rel_to_7']}; "
          f"penalty gain {rec['penalty_gain_pct']}%", file=sys.stderr)

    # 2. exact-order headroom: the best any order-cost model could do
    best_rows = np.argmin(bits_all, axis=1).astype(np.int64)
    exact_best = corpus_bits(best_rows)
    rec["exact_order_stream_bits"] = exact_best
    rec["exact_order_gain_vs_model7_pct"] = round(
        (base7 - exact_best) / base7 * 100, 4)
    print(f"[sweep] exact-order search would gain "
          f"{rec['exact_order_gain_vs_model7_pct']:.4f}% over model(7)",
          file=sys.stderr)

    # 3. wasted-bits headroom on raw channels (before decorrelation)
    xr = x.reshape(F * x.shape[1], S)
    nvr = np.repeat(n_valid, x.shape[1])
    wasted_bits_total = 0
    const_frames = 0
    for i in range(xr.shape[0]):
        v = xr[i, : nvr[i]]
        nz = v[v != 0]
        if nz.size == 0 or (v == v[0]).all():
            const_frames += 1
            continue
        nzv = nz.astype(np.int64)
        tz = int(np.log2((nzv & -nzv).astype(np.float64)).min())
        wasted_bits_total += tz * int(nvr[i])
    rec["wasted_bits_headroom_pct_of_stream"] = round(
        wasted_bits_total / max(base7, 1) * 100, 4)
    rec["constant_or_silent_rows"] = const_frames
    print(f"[sweep] wasted-bits headroom {rec['wasted_bits_headroom_pct_of_stream']}% "
          f"of stream; constant rows {const_frames}/{xr.shape[0]}",
          file=sys.stderr)

    # 4. partitioned (v2) stats
    from sela_tpu.codec.decoder import decode_sela
    from sela_tpu.config import BitstreamProfile

    buf2 = encode_wav(w, profile=BitstreamProfile(residue_partition=4))
    decode_sela(buf2)
    rec["partitioned_v2_ratio"] = round(len(buf2) / pcm_bytes, 6)
    rec["partitioned_v2_delta_pct"] = round(
        (len(buf2) - len(buf)) / len(buf) * 100, 4)
    print(f"[sweep] v2 ratio {rec['partitioned_v2_ratio']:.6f} "
          f"({rec['partitioned_v2_delta_pct']:+.4f}% vs v1)", file=sys.stderr)

    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"[sweep] wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
