"""Property-based tests (hypothesis) — SURVEY.md §4 item 2.

The oracle is the executable spec, so properties run against sela_tpu.ref
(scalar numpy, fast for small inputs): round-trip identity over arbitrary
PCM shapes/depths, Rice coder identity over arbitrary int32 streams, zigzag
totality, and container-mutation robustness (malformed input must raise
ContainerError, never crash or mis-decode silently past a sync check).
"""
import numpy as np
from hypothesis import given, settings, strategies as st

from sela_tpu.ref import codec as ref_codec
from sela_tpu.ref import container, rice
from sela_tpu.ref.wav import WavData

I32 = st.integers(min_value=-(1 << 31), max_value=(1 << 31) - 1)


@st.composite
def int32_arrays(draw, max_len=400):
    n = draw(st.integers(0, max_len))
    # mix magnitudes so small-k, large-k and escape paths all appear
    scale_bits = draw(st.integers(0, 31))
    vals = draw(st.lists(
        st.integers(-(1 << scale_bits), (1 << scale_bits) - 1),
        min_size=n, max_size=n))
    return np.asarray(vals, dtype=np.int64).astype(np.int32)


@settings(deadline=None, max_examples=60)
@given(int32_arrays())
def test_rice_roundtrip_arbitrary_streams(values):
    k, words = rice.encode(values)
    out = rice.decode(words, len(values), k)
    np.testing.assert_array_equal(out, values)


@settings(deadline=None, max_examples=60)
@given(st.data())
def test_rice_roundtrip_any_forced_k(data):
    # bound |v| by the forced k so the unary parts stay sane (forcing k=0 on
    # INT_MIN-scale values is a refused pathological encode — tested below)
    k = data.draw(st.integers(0, 30))
    lim = min(1 << (k + 15), 1 << 31)
    vals = data.draw(st.lists(
        st.integers(-lim, lim - 1), min_size=1, max_size=64))
    values = np.asarray(vals, np.int64).astype(np.int32)
    k2, words = rice.encode(values, k=k)
    assert k2 == k
    np.testing.assert_array_equal(rice.decode(words, len(values), k), values)


def test_pathological_forced_k_refused():
    import pytest

    vals = np.full(64, -(1 << 31), np.int32)
    with pytest.raises(ValueError, match="forced k"):
        rice.encode(vals, k=0)
    # optimal-k planning on the same values stays bounded (escape)
    k, words = rice.encode(vals)
    np.testing.assert_array_equal(rice.decode(words, 64, k), vals)


@settings(deadline=None, max_examples=200)
@given(I32)
def test_zigzag_total_identity(v):
    u = rice.zigzag(np.array([v], np.int32))
    assert 0 <= int(u[0]) <= 0xFFFFFFFF
    assert int(rice.unzigzag(u)[0]) == v


@st.composite
def wavs(draw):
    bps = draw(st.sampled_from([8, 16, 24, 32]))
    nch = draw(st.integers(1, 3))
    n = draw(st.integers(1, 4500))  # crosses the 2048 frame boundary
    rng = np.random.default_rng(draw(st.integers(0, 2**32 - 1)))
    lim = 1 << (bps - 1)
    kind = draw(st.sampled_from(["noise", "tone", "silence", "ramp"]))
    chans = []
    for c in range(nch):
        if kind == "noise":
            x = rng.integers(-lim, lim, n)
        elif kind == "tone":
            x = np.round((lim - 1) * 0.7 * np.sin(np.arange(n) * 0.05 + c))
        elif kind == "silence":
            x = np.zeros(n)
        else:
            x = (np.arange(n) % (2 * lim)) - lim
        chans.append(np.asarray(x, np.int64).astype(np.int32))
    rate = draw(st.sampled_from([8000, 44100, 96000]))
    return WavData(rate, bps, chans)


@settings(deadline=None, max_examples=25)
@given(wavs())
def test_oracle_roundtrip_arbitrary_pcm(w):
    buf = ref_codec.encode_wav(w)
    out = ref_codec.decode_sela(buf)
    assert out.sample_rate == w.sample_rate
    assert out.bits_per_sample == w.bits_per_sample
    assert len(out.channels) == len(w.channels)
    for a, b in zip(out.channels, w.channels):
        np.testing.assert_array_equal(a, b)


def _mutate(data, buf: bytes, lo: int = 0, hi: int | None = None) -> bytes:
    out = bytearray(buf)
    hi = len(out) - 1 if hi is None else min(hi, len(out) - 1)
    n_flips = data.draw(st.integers(1, 8))
    for _ in range(n_flips):
        i = data.draw(st.integers(lo, hi))
        out[i] ^= data.draw(st.integers(1, 255))
    return bytes(out)


@settings(deadline=None, max_examples=60)
@given(st.data())
def test_container_mutations_never_crash(data):
    rng = np.random.default_rng(0)
    w = WavData(44100, 16, [rng.integers(-2000, 2000, 700).astype(np.int32)])
    buf = _mutate(data, ref_codec.encode_wav(w))
    try:
        out = ref_codec.decode_sela(buf)
        # decoded something — it must at least be shape-consistent
        assert len(out.channels) == out.n_channels
    except container.ContainerError:
        pass  # the only acceptable failure mode


# --- the same mutation corpus through the FAST paths (VERDICT r1 weak #3:
# the native scanner + JAX decoder have independently written bounds checks,
# so they need independent fuzzing — the oracle fuzz cannot stand in) -------

def _fast_paths_survive(buf: bytes):
    """decode_sela (native scan/unpack) + decode_stream on one buffer."""
    from sela_tpu.codec import decoder, stream

    for fn in (
        lambda: decoder.decode_sela(buf, chunk_frames=8),
        lambda: [b for b in stream.decode_stream(buf, chunk_frames=8)],
    ):
        try:
            fn()
        except container.ContainerError:
            pass  # the only acceptable failure mode


@settings(deadline=None, max_examples=60)
@given(st.data())
def test_container_mutations_fast_paths(data):
    rng = np.random.default_rng(1)
    w = WavData(44100, 16, [rng.integers(-2000, 2000, 700).astype(np.int32)])
    _fast_paths_survive(_mutate(data, ref_codec.encode_wav(w)))


@settings(deadline=None, max_examples=60)
@given(st.data())
def test_container_mutations_fast_paths_stereo(data):
    rng = np.random.default_rng(2)
    left = rng.integers(-2000, 2000, 700).astype(np.int32)
    right = (left // 2 + rng.integers(-100, 100, 700)).astype(np.int32)
    w = WavData(44100, 16, [left, right])
    _fast_paths_survive(_mutate(data, ref_codec.encode_wav(w)))


@settings(deadline=None, max_examples=40)
@given(st.data())
def test_container_mutations_partitioned_stream(data):
    """Mutation fuzz over a profile-v2 (partitioned residues) container."""
    from sela_tpu.config import BitstreamProfile

    rng = np.random.default_rng(4)
    burst = rng.integers(-20000, 20000, 100).astype(np.int32)
    quiet = rng.integers(-40, 40, 600).astype(np.int32)
    w = WavData(44100, 16, [np.concatenate([burst, quiet, burst, quiet])])
    base = ref_codec.encode_wav(w, profile=BitstreamProfile(residue_partition=4))
    buf = _mutate(data, base)
    try:
        ref_codec.decode_sela(buf)
    except container.ContainerError:
        pass
    _fast_paths_survive(buf)


@settings(deadline=None, max_examples=120)
@given(st.data())
def test_header_region_mutations(data):
    """Focused fuzz of the file header + first frame/subframe headers: the
    region where a mono 700-sample file keeps its only channel/type/k bytes
    (VERDICT r1: 60 whole-file examples can miss these few offsets)."""
    rng = np.random.default_rng(3)
    w = WavData(44100, 16, [rng.integers(-2000, 2000, 700).astype(np.int32)])
    buf = _mutate(data, ref_codec.encode_wav(w), lo=0, hi=40)
    try:
        ref_codec.decode_sela(buf)
    except container.ContainerError:
        pass
    _fast_paths_survive(buf)


@settings(deadline=None, max_examples=40)
@given(st.binary(max_size=64))
def test_tiny_garbage_rejected_cleanly(blob):
    try:
        ref_codec.decode_sela(blob)
    except container.ContainerError:
        pass
