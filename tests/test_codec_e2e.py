"""End-to-end JAX codec: encode/decode via the jit pipeline, cross-checked
against the numpy oracle (roundtrip-exact in all four engine pairings)."""
import numpy as np
import pytest

from sela_tpu.codec import decoder as jdec
from sela_tpu.codec import encoder as jenc
from sela_tpu.ref import codec as ref_codec
from sela_tpu.ref.wav import WavData

CHUNK = 8  # small fixed chunk => one jit compile for the whole suite


def make_wav(rng, signal_factory, n=2048 * 3 + 123, nch=2, bps=16, kinds=None):
    kinds = kinds or ["ar"] * nch
    chans = [signal_factory(rng, n, kind=k) for k in kinds]
    return WavData(44100, bps, chans)


def test_jax_roundtrip_stereo(rng, signal_factory):
    w = make_wav(rng, signal_factory)
    buf = jenc.encode_wav(w, chunk_frames=CHUNK)
    out = jdec.decode_sela(buf, chunk_frames=CHUNK)
    for a, b in zip(out.channels, w.channels):
        np.testing.assert_array_equal(a, b)


def test_jax_encode_oracle_decode(rng, signal_factory):
    w = make_wav(rng, signal_factory, kinds=["ar", "tone"])
    buf = jenc.encode_wav(w, chunk_frames=CHUNK)
    out = ref_codec.decode_sela(buf)
    for a, b in zip(out.channels, w.channels):
        np.testing.assert_array_equal(a, b)


def test_oracle_encode_jax_decode(rng, signal_factory):
    w = make_wav(rng, signal_factory, kinds=["noise", "ar"])
    buf = ref_codec.encode_wav(w)
    out = jdec.decode_sela(buf, chunk_frames=CHUNK)
    for a, b in zip(out.channels, w.channels):
        np.testing.assert_array_equal(a, b)


def test_jax_roundtrip_mono_and_3ch(rng, signal_factory):
    for nch, kinds in [(1, ["ar"]), (3, ["ar", "ar", "tone"])]:
        w = make_wav(rng, signal_factory, n=2048 + 77, nch=nch, kinds=kinds)
        buf = jenc.encode_wav(w, chunk_frames=CHUNK)
        out = jdec.decode_sela(buf, chunk_frames=CHUNK)
        for a, b in zip(out.channels, w.channels):
            np.testing.assert_array_equal(a, b)


def test_jax_compression_comparable_to_oracle(rng, signal_factory):
    w = make_wav(rng, signal_factory, n=2048 * 4)
    jbuf = jenc.encode_wav(w, chunk_frames=CHUNK)
    rbuf = ref_codec.encode_wav(w)
    # float analysis differs (f32 vs f64) but plans should be near-identical
    assert abs(len(jbuf) - len(rbuf)) / len(rbuf) < 0.02


def test_jax_24bit_hires(rng, signal_factory):
    w = make_wav(rng, signal_factory, n=2048 * 2, bps=24)
    w.channels[0] = (
        (w.channels[0].astype(np.int64) * 200).clip(-(2**23), 2**23 - 1).astype(np.int32)
    )
    buf = jenc.encode_wav(w, chunk_frames=CHUNK)
    out = jdec.decode_sela(buf, chunk_frames=CHUNK)
    for a, b in zip(out.channels, w.channels):
        np.testing.assert_array_equal(a, b)
