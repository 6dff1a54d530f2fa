"""Regression gate (tools/check_regression.py) — SURVEY.md §4 item 5.

Unit-tests the comparator with injected regressions (one command exits
non-zero on a planted regression — the VERDICT r1 item-5 "done" criterion)
and holds the encoder to the pinned-corpus compression ratio so a ratio
regression fails CI even without TPU bench artifacts.
"""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from check_regression import compare, main, normalize  # noqa: E402


def _rec(value=2.0, ratio=0.6, e2e=1.5, schema="r2"):
    if schema == "r1":
        return {
            "metric": "encode+decode GB/s/chip (CD corpus, device pipeline)",
            "value": value,
            "detail": {"encode_gbps": value * 0.6, "decode_gbps": value * 1.5},
        }
    return {
        "metric": "e2e encode+decode GB/s/chip (WAV->sela->WAV, host incl.)",
        "value": e2e,
        "detail": {
            "e2e_encode_gbps": e2e * 0.7,
            "e2e_decode_gbps": e2e * 1.4,
            "e2e_aggregate_gbps": e2e,
            "compression_ratio": ratio,
            "device_pipeline": {
                "encode_gbps": value * 0.6,
                "decode_gbps": value * 1.5,
                "aggregate_gbps": value,
            },
        },
    }


def test_no_regression_passes():
    assert compare(_rec(), _rec()) == []
    # improvement passes too
    assert compare(_rec(), _rec(value=3.0, ratio=0.55, e2e=2.0)) == []


def test_device_throughput_regression_fails():
    fails = compare(_rec(value=2.0), _rec(value=1.5))  # -25% device pipeline
    assert any("device.aggregate_gbps" in f for f in fails)
    # within tolerance: -5% passes
    assert compare(_rec(value=2.0), _rec(value=1.9)) == []


def test_e2e_regression_is_informational_only():
    """e2e throughput rides the sandbox tunnel (r3->r4 d2h halved): a drop
    there must NOT fail the gate, but must surface as an INFO note."""
    notes = []
    fails = compare(_rec(e2e=2.0), _rec(e2e=0.5), notes=notes)  # -75% e2e
    assert fails == []
    assert any("e2e_aggregate_gbps" in n for n in notes)


def test_gate_green_on_actual_r03_r04_artifacts():
    """The exact scenario that made the r4 gate cry wolf: the committed
    r03->r04 artifacts regress only tunnel-dependent metrics."""
    import json as _json

    repo = os.path.join(os.path.dirname(__file__), "..")
    p3, p4 = (os.path.join(repo, f"BENCH_r0{n}.json") for n in (3, 4))
    if not (os.path.exists(p3) and os.path.exists(p4)):
        pytest.skip("r3/r4 artifacts not present")
    with open(p3) as f:
        prev = _json.load(f)["parsed"]
    with open(p4) as f:
        cur = _json.load(f)["parsed"]
    notes = []
    assert compare(prev, cur, notes=notes) == []
    assert notes, "expected tunnel-driven informational deltas"


def test_ratio_regression_fails():
    fails = compare(_rec(ratio=0.60), _rec(ratio=0.65))  # +8.3%
    assert any("compression_ratio" in f for f in fails)
    assert compare(_rec(ratio=0.60), _rec(ratio=0.61)) == []  # +1.7% ok


def test_cross_schema_r1_to_r2():
    # r1 record vs r2 record: only the device metrics are shared
    prev = _rec(value=2.0, schema="r1")
    cur = _rec(value=2.1)
    shared = set(normalize(prev)) & set(normalize(cur))
    assert shared == {"device.encode_gbps", "device.decode_gbps",
                      "device.aggregate_gbps"}
    assert compare(prev, cur) == []
    fails = compare(prev, _rec(value=1.0))
    assert any("device.aggregate_gbps" in f for f in fails)


def test_cli_exit_codes(tmp_path):
    prev = tmp_path / "BENCH_prev.json"
    cur_ok = tmp_path / "BENCH_ok.json"
    cur_bad = tmp_path / "BENCH_bad.json"
    prev.write_text(json.dumps(_rec()))
    cur_ok.write_text(json.dumps(_rec(value=2.2)))
    # driver-style wrapper with "parsed" is unwrapped transparently
    cur_bad.write_text(json.dumps({"parsed": _rec(value=1.0, e2e=0.5)}))
    assert main(["--previous", str(prev), "--current", str(cur_ok)]) == 0
    assert main(["--previous", str(prev), "--current", str(cur_bad)]) == 1


@pytest.mark.slow
def test_pinned_corpus_ratio():
    """The JAX encoder's compression ratio on a pinned corpus must not
    regress more than 2% vs the committed value (tests/data/pinned_ratio.json
    — regenerate deliberately when the encoder legitimately improves)."""
    from sela_tpu.bench import make_corpus
    from sela_tpu.codec.encoder import encode_wav
    from sela_tpu.ref.wav import WavData

    with open(os.path.join(os.path.dirname(__file__), "data",
                           "pinned_ratio.json")) as f:
        pinned = json.load(f)
    left, right = make_corpus(pinned["seconds"], seed=pinned["seed"])
    w = WavData(44100, 16, [left, right])
    buf = encode_wav(w)
    pcm = w.n_samples * w.n_channels * 2
    ratio = len(buf) / pcm
    assert ratio <= pinned["ratio"] * 1.02, (
        f"compression ratio regressed: {ratio:.6f} vs pinned "
        f"{pinned['ratio']:.6f}"
    )
    if ratio < pinned["ratio"] * 0.98:
        import warnings

        warnings.warn(
            f"ratio improved to {ratio:.6f}; update tests/data/pinned_ratio.json"
        )
