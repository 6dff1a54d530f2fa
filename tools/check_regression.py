"""Benchmark regression gate (SURVEY.md §4 item 5, VERDICT r1 item 5).

Compares two bench JSON artifacts (the one-line records written by bench.py /
recorded by the driver as BENCH_r{N}.json) and exits non-zero when:

  * compression ratio regresses by more than RATIO_TOL   (default 2%)
  * any throughput metric regresses by more than TPUT_TOL (default 10%)

Usage:
    python tools/check_regression.py --previous BENCH_r01.json \
                                     --current  BENCH_r02.json
    python tools/check_regression.py            # auto: two newest BENCH_r*.json

Both the r1 schema (device-pipeline headline) and the r2+ schema (e2e
headline with a `device_pipeline` sub-dict) are understood; only metrics
present in BOTH records are compared, so schema growth never fails the gate.
Unit-tested (with injected regressions) in tests/test_regression_gate.py.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

RATIO_TOL = 0.02   # compressed size may grow at most 2% relative
TPUT_TOL = 0.10    # throughput may drop at most 10% relative


def normalize(rec: dict) -> dict:
    """Flatten a bench record into {metric_name: (value, higher_is_better)}."""
    out: dict[str, tuple[float, bool]] = {}
    detail = rec.get("detail", {})

    def put(name, val, higher_better=True):
        if isinstance(val, (int, float)):
            out[name] = (float(val), higher_better)

    # r2+ schema
    put("e2e_encode_gbps", detail.get("e2e_encode_gbps"))
    put("e2e_decode_gbps", detail.get("e2e_decode_gbps"))
    put("e2e_aggregate_gbps", detail.get("e2e_aggregate_gbps"))
    put("compression_ratio", detail.get("compression_ratio"), False)
    for cfg in ("config3_batch64", "config4_hires_24bit_96k", "config_32bit"):
        sub = detail.get(cfg, {})
        put(f"{cfg}.aggregate_gbps", sub.get("aggregate_gbps"))
        put(f"{cfg}.compression_ratio", sub.get("compression_ratio"), False)
    dp = detail.get("device_pipeline", {})
    put("device.encode_gbps", dp.get("encode_gbps"))
    put("device.decode_gbps", dp.get("decode_gbps"))
    put("device.aggregate_gbps", dp.get("aggregate_gbps"))

    # r1 schema: device numbers lived at detail top level + headline value
    if "device pipeline" in str(rec.get("metric", "")):
        put("device.encode_gbps", detail.get("encode_gbps"))
        put("device.decode_gbps", detail.get("decode_gbps"))
        put("device.aggregate_gbps", rec.get("value"))
    return out


def compare(prev: dict, cur: dict, ratio_tol: float = RATIO_TOL,
            tput_tol: float = TPUT_TOL) -> list[str]:
    """Returns a list of human-readable regression failures (empty = pass)."""
    p, c = normalize(prev), normalize(cur)
    failures = []
    for name in sorted(set(p) & set(c)):
        pv, higher_better = p[name]
        cv, _ = c[name]
        if pv <= 0:
            continue
        if higher_better:
            drop = (pv - cv) / pv
            if drop > tput_tol:
                failures.append(
                    f"{name}: {pv:.4f} -> {cv:.4f} (-{drop*100:.1f}% > "
                    f"{tput_tol*100:.0f}% allowed)"
                )
        else:
            growth = (cv - pv) / pv
            if growth > ratio_tol:
                failures.append(
                    f"{name}: {pv:.4f} -> {cv:.4f} (+{growth*100:.1f}% > "
                    f"{ratio_tol*100:.0f}% allowed)"
                )
    return failures


def _load(path: str) -> dict:
    with open(path) as f:
        rec = json.load(f)
    # driver artifacts wrap the bench line under "parsed"
    return rec.get("parsed", rec) if isinstance(rec, dict) else rec


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--previous", help="baseline bench JSON")
    ap.add_argument("--current", help="new bench JSON to gate")
    ap.add_argument("--ratio-tol", type=float, default=RATIO_TOL)
    ap.add_argument("--tput-tol", type=float, default=TPUT_TOL)
    args = ap.parse_args(argv)

    prev_path, cur_path = args.previous, args.current
    if prev_path is None or cur_path is None:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        found = sorted(glob.glob(os.path.join(repo, "BENCH_r*.json")))
        if len(found) < 2:
            print(f"need two BENCH_r*.json artifacts, found {found}",
                  file=sys.stderr)
            return 2
        prev_path = prev_path or found[-2]
        cur_path = cur_path or found[-1]

    prev, cur = _load(prev_path), _load(cur_path)
    failures = compare(prev, cur, args.ratio_tol, args.tput_tol)
    shared = sorted(set(normalize(prev)) & set(normalize(cur)))
    print(f"compared {prev_path} -> {cur_path}: {len(shared)} shared metrics",
          file=sys.stderr)
    if failures:
        for f in failures:
            print(f"REGRESSION: {f}", file=sys.stderr)
        return 1
    print("no regressions", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
